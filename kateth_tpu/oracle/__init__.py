"""Pure-Python CPU oracle: bit-exact reference semantics for every device
kernel (fields, curves, pairing, KZG protocol).  Slow by design."""

from . import curve, field, kzg, pairing  # noqa: F401
