"""TPU-native multi-scalar multiplication (Pippenger reformulated for SIMD).

Replaces the reference's blst Pippenger path (`P1::lincomb_pippenger`,
reference src/bls.rs:415-437 calling `p1_affines::mult(&scalars, 255)`) and
the naive `P1::lincomb` (bls.rs:406-413).

Classic Pippenger accumulates points into buckets with data-dependent
scatter — the single most TPU-hostile memory pattern.  This version keeps
the bucket algebra but removes every scatter:

1. Split each 255-bit scalar into W = ceil(255/c) unsigned c-bit window
   digits (a static bit-plane gather, no data-dependent shapes).
2. Per window, SORT point indices by digit (XLA sorting network) and
   gather the points into bucket order.
3. One inclusive prefix scan of point additions along the sorted axis
   yields every bucket-boundary partial sum.
4. The weighted bucket sum  sum_j j*S_j  collapses via the telescoping
   identity  sum_{j>=1} T_j  (T_j = sum of buckets >= j = total -
   prefix[c_j - 1]) into (B-1)*total minus a 255-point gather + sum.
5. Windows combine with c doublings between them (Horner over 2^c),
   processed one window per lax.scan iteration (MSB first) so only one
   window's point lanes are ever resident.

Compilation-model note: every repeated point operation lives inside a
`lax.scan` body so it is traced and compiled ONCE.  The prefix scan is
Hillis-Steele (log2(N) scan steps over a fixed (W, N) shape, shift by a
*traced* offset via jnp.roll + identity masking) rather than
`lax.associative_scan`, whose unrolled recursion instantiates O(log N)
distinct odd/even program shapes and blows up the HLO graph; N*log(N)
uniform lanes beat 2N ragged lanes on both the XLA compiler and the TPU
vector units.  Identity inputs and repeated points are handled by the
complete formulas, so no special cases exist anywhere.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..fields import limbs as L
from . import ops
from .ops import CurveField


def _fdim(F: CurveField) -> int:
    return 1 if F.name == "fp" else 2


def _roll_axis(p, shift, axis):
    """jnp.roll each coordinate plane along `axis` by a traced shift."""
    return tuple(jnp.roll(a, shift, axis=axis) for a in p)


def prefix_scan(F: CurveField, p, axis: int = 0):
    """Inclusive prefix sum of points along `axis` (Hillis-Steele).

    log2(N) lax.scan steps; each step is ONE complete-formula add over the
    full fixed shape.  N must be a power of two.

    The shift-by-2^k is a dynamic_slice out of an identity-padded buffer
    (identity points slide in from below, so no masking is needed).  An
    earlier jnp.roll + select formulation hit an XLA:TPU miscompile when
    fused with its producer — keep this formulation.
    """
    n = jnp.shape(p[0])[axis]
    assert n & (n - 1) == 0, "prefix_scan requires power-of-two length"
    steps = n.bit_length() - 1
    if n == 1:
        return p
    ax = axis % p[0].ndim
    ident = tuple(
        jnp.broadcast_to(i, tuple(jnp.shape(c)))
        for i, c in zip(ops.identity(F), p)
    )

    def step(acc, k):
        shift = jnp.int32(1) << k
        big = tuple(
            jnp.concatenate([i, a], axis=ax) for i, a in zip(ident, acc)
        )
        shifted = tuple(
            jax.lax.dynamic_slice_in_dim(b, n - shift, n, axis=ax) for b in big
        )
        return ops.padd(F, acc, shifted), None

    out, _ = jax.lax.scan(step, p, jnp.arange(steps, dtype=jnp.int32))
    return out


def tree_sum(F: CurveField, p, axis: int = 0):
    """Sum points along `axis`: pad to power of two, prefix-scan, take last."""
    n = jnp.shape(p[0])[axis]
    pot = 1 if n <= 1 else 1 << (n - 1).bit_length()
    if pot != n:
        ident = tuple(
            jnp.broadcast_to(
                i,
                tuple(
                    (pot - n) if d == axis else s for d, s in enumerate(jnp.shape(c))
                ),
            )
            for i, c in zip(ops.identity(F), p)
        )
        p = tuple(jnp.concatenate([a, b], axis=axis) for a, b in zip(p, ident))
    scanned = prefix_scan(F, p, axis=axis)
    return tuple(
        jax.lax.index_in_dim(a, pot - 1, axis=axis, keepdims=False) for a in scanned
    )


def scalar_mul_const(F: CurveField, p, k: int, unroll: bool = False):
    """p * k for a STATIC python int k.

    Scan-based double-and-add (2 point ops in the graph) unless `unroll`
    (then branch-free straight-line, good for tiny k).
    """
    if k == 0:
        return ops.identity(F, jnp.shape(p[0])[: -_fdim(F)])
    bits = bin(k)[2:]
    if unroll:
        acc = None
        for bit in bits:
            if acc is not None:
                acc = ops.pdouble(F, acc)
            if bit == "1":
                acc = p if acc is None else ops.padd(F, acc, p)
        return acc

    bit_arr = jnp.asarray(np.array([b == "1" for b in bits[1:]], dtype=np.bool_))

    def step(acc, bit):
        acc = ops.pdouble(F, acc)
        return ops.pselect(F, bit, ops.padd(F, acc, p), acc), None

    if len(bits) == 1:
        return p
    out, _ = jax.lax.scan(step, p, bit_arr)
    return out


def window_digits(scalar_digits: jax.Array, c: int, n_bits: int = 255) -> jax.Array:
    """Plain Fr digit planes (..., 16) -> (W, ...) c-bit window values
    (least-significant window first), W = ceil(n_bits / c)."""
    shifts = jnp.arange(L.DIGIT_BITS, dtype=jnp.uint32)
    bits = (scalar_digits[..., :, None] >> shifts) & 1  # (..., 16, 16) LSB-first
    bits = bits.reshape(*scalar_digits.shape[:-1], -1)[..., :n_bits]
    W = -(-n_bits // c)
    pad = W * c - n_bits
    if pad:
        bits = jnp.concatenate(
            [bits, jnp.zeros((*bits.shape[:-1], pad), dtype=bits.dtype)], axis=-1
        )
    bits = bits.reshape(*bits.shape[:-1], W, c)  # window-major, LSB-first in window
    weights = jnp.uint32(1) << jnp.arange(c, dtype=jnp.uint32)
    digits = jnp.sum(bits * weights, axis=-1, dtype=jnp.uint32)  # (..., W)
    return jnp.moveaxis(digits, -1, 0)  # (W, ...)


def _window_sum(F: CurveField, points, dig: jax.Array, c: int):
    """Bucket sum of ONE window: sum_i dig[i] * points[i] for c-bit digits.

    dig: (*batch, N) uint32 window digits; points (N, *field_dims) shared.
    Returns a projective point (*batch, *field_dims) per coordinate.
    """
    B = 1 << c
    fdim = _fdim(F)
    batch = dig.shape[:-1]
    n_ax = len(batch)  # position of the N axis in (*batch, N, ...)
    N = jnp.shape(points[0])[0]

    # sort by digit, gather points into bucket order
    order = jnp.argsort(dig, axis=-1)  # (*batch, N)
    sorted_digits = jnp.take_along_axis(dig, order, axis=-1)
    gathered = tuple(jnp.take(comp, order, axis=0) for comp in points)
    # gathered: (*batch, N, *field_dims)

    # inclusive prefix scan of point adds along the sorted axis — the
    # two-level Pallas chunked scan on TPU (O(N) in-register adds), the
    # XLA Hillis-Steele scan elsewhere
    from . import pallas_msm

    if pallas_msm.available(F, N):
        prefix = pallas_msm.prefix_scan_kernel(F, gathered, axis=n_ax)
    else:
        prefix = prefix_scan(F, gathered, axis=n_ax)
    total = tuple(
        jax.lax.index_in_dim(a, N - 1, axis=n_ax, keepdims=False) for a in prefix
    )

    # bucket-boundary gather: c_j = #digits < j for j = 1..B-1 (the
    # compare+reduce fuses in XLA; no (N, B) one-hot is materialized)
    counts = jnp.sum(
        sorted_digits[..., None] == jnp.arange(B, dtype=jnp.uint32),
        axis=-2,
        dtype=jnp.int32,
    )  # (*batch, B)
    cum = jnp.cumsum(counts, axis=-1)  # cum[..., d] = #digits <= d
    c_j = cum[..., : B - 1]  # #digits < j   (j = 1..B-1)
    idx = jnp.maximum(c_j - 1, 0)  # (*batch, B-1)
    boundary = tuple(
        jnp.take_along_axis(a, idx.reshape(*idx.shape, *([1] * fdim)), axis=n_ax)
        for a in prefix
    )  # (*batch, B-1, ...)
    empty = c_j == 0  # no digit < j: boundary_j := identity
    boundary = ops.pselect(F, empty, ops.identity(F, (*batch, B - 1)), boundary)

    # window_sum = (B-1) * total - sum_j boundary_j  (telescoping identity)
    gsum = tree_sum(F, boundary, axis=n_ax)  # (*batch, ...)
    return ops.padd(F, scalar_mul_const(F, total, B - 1), ops.pneg(F, gsum))


def msm(F: CurveField, points, scalar_digits: jax.Array, c: int = 8):
    """sum_i scalars[i] * points[i], batched over leading scalar dims.

    points: projective tuple, each component (N, *field_dims) — SHARED
    across the batch (the trusted-setup table).
    scalar_digits: PLAIN (non-Montgomery) Fr digits (*batch, N, 16).
    Returns a projective point with shape (*batch, *field_dims) per
    coordinate.

    The batch rides through the sort/gather/prefix machinery as extra
    leading axes (NOT vmap: vmap over the MSM miscompiles on XLA:TPU, and
    explicit axes let one program amortize dispatch overhead across the
    whole blob batch).

    Windows are processed ONE AT A TIME inside a lax.scan (MSB window
    first, Horner combine with c doublings between iterations), so the
    working set is O(batch * N) point lanes instead of the round-3
    O(batch * W * N) materialization that pinned the commit batch at 8
    (~3 GB peak at chunk 8; this form runs chunk 64 in ~300 MB).
    """
    N = jnp.shape(points[0])[0]
    batch = scalar_digits.shape[:-2]
    digits = window_digits(scalar_digits, c)  # (W, *batch, N)

    # pad N to a power of two with zero digits + identity points
    pot = 1 if N <= 1 else 1 << (N - 1).bit_length()
    if pot != N:
        digits = jnp.concatenate(
            [
                digits,
                jnp.zeros((*digits.shape[:-1], pot - N), dtype=digits.dtype),
            ],
            axis=-1,
        )
        ident = ops.identity(F, (pot - N,))
        points = tuple(
            jnp.concatenate([a, jnp.broadcast_to(b, (pot - N, *a.shape[1:]))], axis=0)
            for a, b in zip(points, ident)
        )
        N = pot

    def step(acc, dig):
        for _ in range(c):
            acc = ops.pdouble(F, acc)
        win = _window_sum(F, points, dig, c)
        return ops.padd(F, acc, win), None

    # data-derived zero: under shard_map's varying-axes checker a constant
    # identity carry would not match the (varying) body output type, so
    # fold a no-op term of the input into the init to inherit its vma
    zv = (digits.reshape(-1)[0] * 0).astype(jnp.uint32)
    acc0 = tuple(a + zv for a in ops.identity(F, batch))
    # MSB window first; the leading doublings on the identity are free
    acc, _ = jax.lax.scan(step, acc0, digits[::-1])
    return acc


def lincomb_small(F: CurveField, points, scalar_digits: jax.Array):
    """Linear combination for SMALL n via batched double-and-add + tree sum
    (the reference's naive `lincomb`, bls.rs:406-413, used by batch verify
    setup.rs:152-155).  All n scalar muls run in parallel lanes."""
    prods = ops.scalar_mul(F, points, scalar_digits)
    return tree_sum(F, prods, axis=0)
