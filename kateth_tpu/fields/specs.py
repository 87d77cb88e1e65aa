"""Concrete field specs for BLS12-381.

Digit counts: Fr = 16 x 16-bit digits (256-bit R, matching the reference's
blst_fr Montgomery domain, src/bls.rs:84-106), Fp = 24 digits (384-bit R,
matching blst_fp).
"""

from kateth_tpu.oracle.field import P as _P
from kateth_tpu.oracle.field import R as _R

from .limbs import FieldSpec

#: Scalar field (order of G1/G2), 255 bits in 16 digits.
FR = FieldSpec(name="fr", modulus=_R, n_digits=16)

#: Base field, 381 bits in 24 digits.
FP = FieldSpec(name="fp", modulus=_P, n_digits=24)
