"""Digit-plane field arithmetic for BLS12-381 on TPU.

`limbs` is the generic machinery; `FR` and `FP` are the two concrete
prime-field specs (scalar field r, base field p).
"""

from .limbs import FieldSpec  # noqa: F401
from .specs import FP, FR  # noqa: F401
