"""Library configuration.

The reference fixes sizes at compile time with const generics
(Setup<const G1: usize, const G2: usize>, reference src/kzg/setup.rs:38;
Blob<const N: usize>, src/blob.rs:18) and pins 4096/65 in its tests
(setup.rs:296-297).  Here the analog is a frozen dataclass passed as a
static argument to the jitted kernels: sizes are compile-time constants to
XLA, exactly like const generics are to rustc.
"""

from __future__ import annotations

from dataclasses import dataclass


@dataclass(frozen=True)
class KzgConfig:
    #: field elements per blob (power of two)
    n: int = 4096
    #: number of G2 monomial points in the setup (only [tau]_2 is used at
    #: runtime, reference setup.rs:91,158)
    g2_len: int = 65
    #: Pippenger window size in bits for the generic (arbitrary-point) MSM
    msm_window: int = 8
    #: comb width h for the FIXED-BASE commitment path (curves/comb.py):
    #: 2^h precomputed combinations per setup point (h=12 at mainnet =
    #: 3.2 GB of HBM table, ~5x fewer point adds than the windowed MSM).
    #: 0 disables the comb (falls back to the windowed MSM); the
    #: KATETH_NO_COMB=1 env var is the runtime kill-switch.
    comb_h: int = 12
    #: canonical batch quantum: every batched op pads its batch up to a
    #: multiple of this, so the heavy fused graphs compile for a FIXED
    #: set of shapes (64, 128, ...) instead of once per caller batch size
    #: — each distinct shape is a multi-minute XLA compile on TPU.  The
    #: CPU test configs keep the default 64 on purpose: their graphs are
    #: tiny (n=8) and the persistent compile cache is keyed on the padded
    #: shape, so one 64-lane graph serves every caller batch size.
    canon_batch: int = 64

    def __post_init__(self):
        assert self.n > 0 and self.n & (self.n - 1) == 0, "n must be a power of two"
        assert self.g2_len >= 2
        assert self.canon_batch > 0

    @property
    def bytes_per_blob(self) -> int:
        return 32 * self.n


MAINNET = KzgConfig()
