"""Fixed-base comb (Lim-Lee) commitment MSM — the round-5 commit path.

The commitment sum_i b_i * L_i multiplies a FIXED point table (the
trusted setup), which the generic Pippenger path (curves/msm.py — kept
for arbitrary-point MSMs) cannot exploit.  Round-4 profiling
(PROFILE_R5_MSM.json) showed the windowed-Pippenger commit spends >90% of
its 3.35 s (64 blobs) on XLA-side machinery — per-window argsorts,
Hillis-Steele chain scans, boundary gathers, layout copies — while the
Pallas point-add kernel itself runs at ~30M lane-adds/s (281 ms total).

The comb removes ALL of that machinery.  Precompute, once per setup:

    T[i][j] = sum_k j_k * 2^(k*d) * P_i      (j in [0, 2^h), bit j_k)

so with scalar bits arranged in h rows of stride d
(m = t + k*d, t in [0, d)):

    sum_i s_i P_i = sum_{t=d-1..0} 2^t * sum_i T[i][col_t(i)],
    col_t(i) = sum_k bit_{t+k*d}(s_i) << k.

Per column the work is ONE table gather plus a pure chain-sum of N
points — no sort, no buckets, no scans; d-1 doublings total (batch-wide,
negligible) instead of 255 per blob.  At h=12 (table 2^12 entries/point,
3.2 GB HBM at N=4096) the per-blob add count drops from ~480k
(window-scanned Pippenger) to d*N ~ 90k, all of it in the Pallas
chain-sum kernel (pallas_msm.comb_chain_sum) via the flag-specialized
complete mixed add (pallas_mont.G1Vec.padd_mixed_flag, 11 muls).

Identity handling: affine rows cannot encode the identity, so T[i][0] is
stored as (0, 1_mont) and the kernel receives a non-identity flag
(col != 0) that collapses Z2 to zero — complete formulas, no branches.
Build-time validation asserts no OTHER entry is the identity (guaranteed
for valid setups: the combination scalar is in [1, 2^(h*d)-2^d] < r and
setup points are non-identity).

Replaces the reference's blst Pippenger on the commit path
(reference src/bls.rs:415-437 driven by blob.rs:48-53 / poly.rs:68).
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from ..fields import limbs as L
from ..fields.specs import FP
from . import ops
from .ops import CurveField

N_BITS = 255


def comb_dims(h: int) -> int:
    """Columns d for comb width h (h*d covers all 255 scalar bits)."""
    return -(-N_BITS // h)


def column_digits(scalar_digits: jax.Array, h: int, d: int) -> jax.Array:
    """Plain Fr digit planes (..., 16) -> (d, ...) comb column values.

    Column t packs bits {t, t+d, ..., t+(h-1)d} (LSB-first) into an h-bit
    index; mirrors msm.window_digits' bit-plane extraction."""
    shifts = jnp.arange(L.DIGIT_BITS, dtype=jnp.uint32)
    bits = (scalar_digits[..., :, None] >> shifts) & 1
    bits = bits.reshape(*scalar_digits.shape[:-1], -1)  # (..., 256) LSB-first
    pad = h * d - bits.shape[-1]
    if pad > 0:
        bits = jnp.concatenate(
            [bits, jnp.zeros((*bits.shape[:-1], pad), dtype=bits.dtype)], axis=-1
        )
    bits = bits[..., : h * d].reshape(*bits.shape[:-1], h, d)
    weights = (jnp.uint32(1) << jnp.arange(h, dtype=jnp.uint32))[:, None]
    cols = jnp.sum(bits * weights, axis=-2, dtype=jnp.uint32)  # (..., d)
    return jnp.moveaxis(cols, -1, 0)


def _tree_inv(spec, x: jax.Array) -> jax.Array:
    """Batched modular inversion along axis -2 (length must be a power of
    two) via a product tree: ~3 multiplies per element plus ONE Fermat
    pow chain at the root — the device-friendly Montgomery trick.
    Inputs must be nonzero (callers mask zeros to 1 first)."""
    m = x.shape[-2]
    levels = [x]
    cur = x
    while cur.shape[-2] > 1:
        half = cur.shape[-2] // 2
        pair = cur.reshape(*cur.shape[:-2], half, 2, cur.shape[-1])
        cur = L.mont_mul(spec, pair[..., 0, :], pair[..., 1, :])
        levels.append(cur)
    inv = L.inv(spec, cur)  # (..., 1, D)
    for lev in levels[-2::-1]:
        half = lev.shape[-2] // 2
        pair = lev.reshape(*lev.shape[:-2], half, 2, lev.shape[-1])
        inv_a = L.mont_mul(spec, inv, pair[..., 1, :])
        inv_b = L.mont_mul(spec, inv, pair[..., 0, :])
        inv = jnp.stack([inv_a, inv_b], axis=-2).reshape(*lev.shape)
    return inv


@partial(jax.jit, static_argnums=(0, 2, 3))
def _build_chunk(F: CurveField, pts, h: int, d: int):
    """Comb table rows for a chunk of points.

    pts: projective tuple, coords (C, D).  Returns ((C * 2^h, 2D) packed
    affine rows [x | y], (C, 2^h) Z-is-zero mask for validation)."""
    C = pts[0].shape[0]

    # basis[k] = 2^(k*d) * P  — d doublings between records
    def step(p, _):
        rec = p
        for _ in range(d):
            p = ops.pdouble(F, p)
        return p, rec

    _, basis = jax.lax.scan(step, pts, None, length=h)  # (h, C, D) x3

    # combination table by doubling subsets: T[:, j | 2^b] = T[:, j] + D_b
    tab = tuple(
        jnp.broadcast_to(i[None], (C, 1, FP.n_digits)) for i in ops.identity(F)
    )
    for b in range(h):
        db = tuple(c[b][:, None] for c in basis)  # (C, 1, D)
        new = ops.padd(
            F, tab, tuple(jnp.broadcast_to(c, tab[0].shape) for c in db)
        )
        tab = tuple(jnp.concatenate([t, n], axis=1) for t, n in zip(tab, new))
    X, Y, Z = tab  # (C, 2^h, D)

    z_zero = L.is_zero(Z)  # (C, 2^h) — row 0 is the stored identity
    one = jnp.broadcast_to(jnp.asarray(FP.one_mont, dtype=jnp.uint32), Z.shape)
    zinv = _tree_inv(FP, jnp.where(z_zero[..., None], one, Z))
    x = L.mont_mul(FP, X, zinv)
    y = L.mont_mul(FP, Y, zinv)
    # identity rows (j = 0): (0, 1_mont) with the flag supplied at commit
    x = jnp.where(z_zero[..., None], jnp.zeros_like(x), x)
    y = jnp.where(z_zero[..., None], one, y)
    D = FP.n_digits
    return x.reshape(C * (1 << h), D), y.reshape(C * (1 << h), D), z_zero


def build_table(F: CurveField, points, h: int, chunk: int = 512):
    """Affine comb rows for the whole setup table: a ((N * 2^h, D) x,
    (N * 2^h, D) y) PAIR of arrays.

    The x/y planes are SEPARATE arrays on purpose: the packed (rows, 2D)
    form at mainnet h=12 is a single 3.2 GB buffer, past the ~2^31-byte
    range where XLA:TPU row gathers silently mis-address (observed on
    v5e: 15/16 random rows of the packed table read back wrong while the
    same graph is bit-exact on CPU); two 1.6 GB planes gather correctly.

    Chunked over points to bound peak memory (the projective intermediate
    is 3x the output).  Raises if any j != 0 entry is the identity (see
    module docstring)."""
    from ..oracle.kzg import KzgError

    d = comb_dims(h)
    N = int(points[0].shape[0])
    chunk = min(chunk, N)
    xs, ys = [], []
    for s in range(0, N, chunk):
        pts = tuple(c[s : s + chunk] for c in points)
        x, y, z_zero = _build_chunk(F, pts, h, d)
        bad = np.asarray(z_zero)[:, 1:]
        if bad.any():
            raise KzgError("comb table entry is the identity (invalid setup)")
        xs.append(x)
        ys.append(y)
    if len(xs) == 1:
        return xs[0], ys[0]
    return jnp.concatenate(xs, axis=0), jnp.concatenate(ys, axis=0)


def _sum_halving(F: CurveField, p, axis: int):
    """Work-efficient point sum along `axis` (length must be a power of
    two): pairwise halving — n-1 adds total vs the n*log(n) of the
    Hillis-Steele tree_sum (fine there: its operands are tiny)."""
    n = p[0].shape[axis]
    assert n & (n - 1) == 0
    while n > 1:
        half = n // 2
        lo = tuple(jax.lax.slice_in_dim(c, 0, half, axis=axis) for c in p)
        hi = tuple(jax.lax.slice_in_dim(c, half, n, axis=axis) for c in p)
        p = ops.padd(F, lo, hi)
        n = half
    return tuple(jnp.squeeze(c, axis=axis) for c in p)


def _chain_sum_xla(F: CurveField, x: jax.Array, y: jax.Array, flags: jax.Array):
    """Portable chain-sum fallback: reconstruct (x, y, flag?1:0) as
    projective lanes and halving-tree the whole N axis (returns the FULL
    sum per batch lane, chains axis already folded)."""
    fl = flags[..., None].astype(bool)
    one = jnp.broadcast_to(jnp.asarray(FP.one_mont, dtype=jnp.uint32), x.shape)
    z = jnp.where(fl, one, jnp.zeros_like(x))
    # pad N to a power of two with identity lanes
    n = x.shape[-2]
    pot = 1 if n <= 1 else 1 << (n - 1).bit_length()
    if pot != n:
        pad = [(0, 0)] * (x.ndim - 2) + [(0, pot - n), (0, 0)]
        x = jnp.pad(x, pad)
        z = jnp.pad(z, pad)
        y = jnp.pad(y, pad)
        y = y.at[..., n:, :].set(
            jnp.asarray(FP.one_mont, dtype=jnp.uint32)
        )
    return _sum_halving(F, (x, y, z), axis=x.ndim - 2)


def commit(
    F: CurveField,
    table,
    scalar_digits: jax.Array,
    h: int,
    n: int,
):
    """Batched fixed-base commitment: sum_i scalars[..., i] * P_i.

    table: the ((n * 2^h, D) x, y) plane pair from build_table;
    scalar_digits: PLAIN Fr digit planes (*batch, n, 16).  Returns a
    projective tuple (*batch, D) per coordinate.
    """
    from . import pallas_msm

    table_x, table_y = table
    d = comb_dims(h)
    batch = scalar_digits.shape[:-2]
    B = 1
    for s in batch:
        B *= int(s)
    cols = column_digits(scalar_digits, h, d)  # (d, *batch, n)
    cols_flat = cols.reshape(d, B, n)
    base = (jnp.arange(n, dtype=jnp.uint32) << h)[None, :]  # row offsets

    use_kernel = pallas_msm.comb_available(n, B)
    g = pallas_msm.COMB_CHAIN

    def body(acc, col):
        idx = (col + base).astype(jnp.int32)
        x = jnp.take(table_x, idx, axis=0)
        y = jnp.take(table_y, idx, axis=0)
        flags = (col != 0).astype(jnp.uint32)
        if use_kernel:
            chains = pallas_msm.comb_chain_sum(x, y, flags, g)
            s = _sum_halving(F, chains, axis=1)  # (B, D) x3
        else:
            s = _chain_sum_xla(F, x, y, flags)
        acc = ops.pdouble(F, acc)
        return ops.padd(F, acc, s), None

    # data-derived zero init (inherits varying axes under shard_map, like
    # msm.msm)
    zv = (cols_flat.reshape(-1)[0] * 0).astype(jnp.uint32)
    acc0 = tuple(jnp.broadcast_to(a, (B, FP.n_digits)) + zv for a in ops.identity(F))
    acc, _ = jax.lax.scan(body, acc0, cols_flat[::-1])  # MSB column first
    return tuple(c.reshape(*batch, FP.n_digits) for c in acc)
