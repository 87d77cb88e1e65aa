"""Batched G1/G2 compression on device.

Replaces the per-point host loop (`oracle.g1_compress` per output point —
a Python affine conversion + modular inversion each) that round 2 left on
every batched commitment/proof output path.  One jitted program converts
a whole batch: Fermat inversion of Z (whole-chain Pallas pow kernel on
TPU), two Montgomery products, plain-form conversion, byte packing and
the three Zcash flag bits — all vectorized.

Zcash serialization rules (reference `blst_p1_compress`, src/bls.rs:549,
and the NOTE at bls.rs:512-513): 48 big-endian bytes of the affine x
coordinate; bit7 = compressed, bit6 = infinity (then all else zero),
bit5 = y is the lexicographically larger of {y, p-y}, i.e. y > (p-1)/2.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..fields import limbs as L
from ..fields.specs import FP
from ..oracle.field import P as _P

#: (p-1)/2 as little-endian digit planes — the "lexicographically larger"
#: threshold for the sign flag
_HALF = L.int_to_digits((_P - 1) // 2, FP.n_digits)


def _gt_const(a: jax.Array, const_digits: np.ndarray) -> jax.Array:
    """a > const, both little-endian digit planes; vectorized digit fold
    LSB->MSB: acc_i = (a_i > c_i) | ((a_i == c_i) & acc_{i-1})."""
    acc = jnp.zeros(a.shape[:-1], dtype=bool)
    for i in range(a.shape[-1]):
        c = jnp.uint32(int(const_digits[i]))
        acc = (a[..., i] > c) | ((a[..., i] == c) & acc)
    return acc


@jax.jit
def g1_compress_planes(p) -> jax.Array:
    """Projective Montgomery G1 points (tuple of (..., D)) -> (..., 48)
    uint8 compressed encodings."""
    X, Y, Z = p
    zinv = L.inv(FP, Z)  # 0 for identity lanes (0^(p-2) = 0)
    x = L.from_mont(FP, L.mont_mul(FP, X, zinv))
    y = L.from_mont(FP, L.mont_mul(FP, Y, zinv))
    inf = L.is_zero(Z)
    larger = _gt_const(y, _HALF) & ~inf
    xb = L.digits_to_be_bytes(FP, x)  # (..., 48)
    xb = jnp.where(inf[..., None], jnp.zeros_like(xb), xb)
    flags = (
        jnp.uint8(0x80)
        + jnp.where(inf, jnp.uint8(0x40), jnp.uint8(0))
        + jnp.where(larger, jnp.uint8(0x20), jnp.uint8(0))
    )
    return xb.at[..., 0].add(flags)


def points_to_bytes(pt) -> list[bytes]:
    """Batched projective Montgomery points -> list of 48-byte encodings."""
    raw = np.asarray(jax.device_get(g1_compress_planes(pt)))
    raw = raw.reshape(-1, 48)
    return [raw[i].tobytes() for i in range(raw.shape[0])]


@jax.jit
def g2_compress_planes(p) -> jax.Array:
    """Projective Montgomery G2 points (tuple of (..., 2, D)) -> (..., 96)
    uint8 compressed encodings — the device counterpart of the
    reference's P2 Compress surface (blst_p2_compress, reference
    src/bls.rs:554-570), closing the last P1/P2 codec asymmetry.

    Zcash rules for Fp2: 96 bytes = x.c1 (48, big-endian, flags in the
    top bits) || x.c0 (48); the sign flag marks y lexicographically
    larger than -y with c1 the most significant component (c1 > (p-1)/2,
    or c1 == 0 and c0 > (p-1)/2)."""
    from ..fields import fp2

    X, Y, Z = p
    zinv = fp2.inv(Z)  # identity lanes: Z = 0 -> inv = 0 (norm^(p-2))
    x = fp2.mul(X, zinv)
    y = fp2.mul(Y, zinv)
    x0 = L.from_mont(FP, x[..., 0, :])
    x1 = L.from_mont(FP, x[..., 1, :])
    y0 = L.from_mont(FP, y[..., 0, :])
    y1 = L.from_mont(FP, y[..., 1, :])
    inf = L.is_zero(Z[..., 0, :]) & L.is_zero(Z[..., 1, :])
    larger = (_gt_const(y1, _HALF) | (L.is_zero(y1) & _gt_const(y0, _HALF))) & ~inf
    b1 = L.digits_to_be_bytes(FP, x1)  # (..., 48)
    b0 = L.digits_to_be_bytes(FP, x0)
    out = jnp.concatenate([b1, b0], axis=-1)  # (..., 96)
    out = jnp.where(inf[..., None], jnp.zeros_like(out), out)
    flags = (
        jnp.uint8(0x80)
        + jnp.where(inf, jnp.uint8(0x40), jnp.uint8(0))
        + jnp.where(larger, jnp.uint8(0x20), jnp.uint8(0))
    )
    return out.at[..., 0].add(flags)


def g2_points_to_bytes(pt) -> list[bytes]:
    """Batched projective Montgomery G2 points -> list of 96-byte
    encodings."""
    raw = np.asarray(jax.device_get(g2_compress_planes(pt)))
    raw = raw.reshape(-1, 96)
    return [raw[i].tobytes() for i in range(raw.shape[0])]
