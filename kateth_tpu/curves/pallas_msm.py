"""Pallas TPU kernel for the MSM bucket prefix scan.

The round-1 MSM ran its bucket accumulation as a Hillis-Steele prefix
scan in XLA: log2(N) full-width point-add passes over the (W, B, N)
sorted point lanes — ~12x the point-add work a classic Pippenger bucket
accumulation needs, all of it HBM round trips (376 ms/blob commitment).

This kernel restores the O(N) accumulation with a TPU-shaped two-level
scan:

  1. The N sorted lanes split into chains of g consecutive points laid
     across the vector lanes; ONE kernel pass runs the g sequential
     complete-formula adds per chain entirely in registers and records
     the running prefix (N point-adds total, vs N log N).
  2. The per-chain totals (N/g lanes) get a short XLA Hillis-Steele
     exclusive scan (log2(N/g) passes over N/g lanes — 1/g of the old
     per-pass width), and one final full-width add folds the chain
     offsets back in.

Total point-add volume: N + (N/g) log2(N/g) + N ≈ 2.3N for g = 8 at
N = 4096 — ~5x less than the pure-XLA scan, with step 1's adds running
at VPU register bandwidth instead of HBM.

Replaces the hot half of blst's Pippenger (reference src/bls.rs:415-437).
"""

from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..fields.pallas_mont import FieldVec, G1Vec, spec_key
from ..fields.specs import FP

#: sequential adds per chain (static-unrolled in the kernel body)
CHAIN = 8
#: lanes per kernel program
LANE_TILE = 512

#: minimum N for the kernel path (below this the XLA scan wins on
#: launch overhead, and tests cover the XLA path anyway)
MIN_N = 2048


def _interpret() -> bool:
    return os.environ.get("KATETH_PALLAS_INTERPRET") == "1"


def _row(D, g, c, i, k):
    """Row index of (coord c, digit i, chain pos k) in the flattened
    (3*D*g) sublane axis — the C-order counterpart of
    reshape(3, D, g) -> 3*D*g, so host-side jnp.reshape and these
    in-kernel static indices can never disagree."""
    return (c * D + i) * g + k


def _make_kernel(D, mod_digits, nprime_digits, one_mont, g):
    F = FieldVec(D, mod_digits, nprime_digits)
    G1 = G1Vec(F, one_mont)

    def kernel(p_ref, o_ref):
        # p_ref: (1, 3*D*g, LANE_TILE) — g consecutive sorted points per
        # lane chain, coords/digits row-flattened (rank>3 refs trip the
        # Mosaic layout pass: round-2's rank-5 block SIGABRT'd in
        # layout.h:320; every kernel proven on hardware uses rank<=3).
        like = [p_ref[0, 0, :]]
        acc = G1.identity(like)
        for k in range(g):
            pt = tuple(
                [p_ref[0, _row(D, g, c, i, k), :] for i in range(D)]
                for c in range(3)
            )
            acc = G1.padd(acc, pt)
            for c in range(3):
                for i in range(D):
                    o_ref[0, _row(D, g, c, i, k), :] = acc[c][i]

    return kernel


@partial(jax.jit, static_argnums=(0, 1, 2, 4))
def _chunked_prefix_flat(spec_key_, one_mont, g, pts, interpret=False):
    # pts: (P, 3*D*g, G_total)
    D = spec_key_[0]
    P = pts.shape[0]
    R = pts.shape[1]
    Gt = pts.shape[-1]
    kernel = _make_kernel(D, spec_key_[1], spec_key_[2], one_mont, g)
    grid = (P, Gt // LANE_TILE)
    block = (1, R, LANE_TILE)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(block, lambda i, j: (i, 0, j), memory_space=pltpu.VMEM)
        ],
        out_specs=pl.BlockSpec(block, lambda i, j: (i, 0, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(pts.shape, jnp.uint32),
        interpret=interpret,
    )(pts)


# ---------------------------------------------------------------------------
# comb fixed-base chain-sum kernel (curves/comb.py's hot loop)
# ---------------------------------------------------------------------------

#: sequential mixed adds per comb chain (static-unrolled)
COMB_CHAIN = 32


def _make_comb_kernel(D, mod_digits, nprime_digits, one_mont, g):
    F = FieldVec(D, mod_digits, nprime_digits)
    G1 = G1Vec(F, one_mont)

    def kernel(x_ref, y_ref, f_ref, o_ref):
        # x_ref/y_ref: (1, g*D, L) gathered affine coords; f_ref: (1, g, L)
        # non-identity flags; o_ref: (1, 3*D, L) projective chain totals.
        like = [x_ref[0, 0, :]]
        acc = G1.identity(like)
        for k in range(g):
            x2 = [x_ref[0, k * D + i, :] for i in range(D)]
            y2 = [y_ref[0, k * D + i, :] for i in range(D)]
            fl = f_ref[0, k, :] > 0
            acc = G1.padd_mixed_flag(acc, x2, y2, fl)
        for c in range(3):
            for i in range(D):
                o_ref[0, c * D + i, :] = acc[c][i]

    return kernel


@partial(jax.jit, static_argnums=(0, 1, 2, 6))
def _comb_chain_sum_flat(spec_key_, one_mont, g, xs, ys, flags, interpret=False):
    """xs/ys: (1, g*D, L) digit rows; flags: (1, g, L) u32.
    Returns (1, 3*D, L) projective chain totals."""
    D = spec_key_[0]
    L = xs.shape[-1]
    kernel = _make_comb_kernel(D, spec_key_[1], spec_key_[2], one_mont, g)
    grid = (L // LANE_TILE,)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, g * D, LANE_TILE), lambda i: (0, 0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, g * D, LANE_TILE), lambda i: (0, 0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, g, LANE_TILE), lambda i: (0, 0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, 3 * D, LANE_TILE), lambda i: (0, 0, i), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((1, 3 * D, L), jnp.uint32),
        interpret=interpret,
    )(xs, ys, flags)


def comb_available(n: int, batch: int, g: int = COMB_CHAIN) -> bool:
    """Kernel eligibility for the comb chain sum: chains fill whole lane
    tiles, TPU backend (or interpret mode for CPU tests)."""
    from ..fields import limbs as L

    if n % g != 0 or (batch * (n // g)) % LANE_TILE != 0:
        return False
    if _interpret():
        return True
    return jax.default_backend() != "cpu" and not L._NO_PALLAS


def comb_chain_sum(x: jax.Array, y: jax.Array, flags: jax.Array, g: int = COMB_CHAIN):
    """Sum each chain of g consecutive gathered table rows.

    x/y: (B, N, D) u32 affine coordinate rows; flags: (B, N) u32
    non-identity flags.  Returns a projective tuple of (B, N//g, D)
    chain totals (the short XLA halving tree in comb.py finishes the sum).
    """
    from ..fields.specs import FP

    D = FP.n_digits
    B, N = flags.shape
    chains = N // g
    lanes = B * chains
    # (B, N, D) -> (B, chains, g, D) -> (g, D, B*chains) per coord
    xs = jnp.transpose(x.reshape(B, chains, g, D), (2, 3, 0, 1)).reshape(
        1, g * D, lanes
    )
    ys = jnp.transpose(y.reshape(B, chains, g, D), (2, 3, 0, 1)).reshape(
        1, g * D, lanes
    )
    fl = jnp.transpose(
        flags.reshape(B, chains, g).astype(jnp.uint32), (2, 0, 1)
    ).reshape(1, g, lanes)
    out = _comb_chain_sum_flat(
        spec_key(FP),
        tuple(int(v) for v in FP.one_mont),
        g,
        xs,
        ys,
        fl,
        _interpret(),
    ).reshape(3, D, B, chains)
    return tuple(jnp.transpose(out[c], (1, 2, 0)) for c in range(3))


def available(F, n: int) -> bool:
    """Kernel path eligibility: G1 over Fp, big enough N, TPU (or
    interpret mode for CPU tests)."""
    from ..fields import limbs as L

    if F.name != "fp" or n < MIN_N or n % (CHAIN * LANE_TILE) != 0:
        return False
    if _interpret():
        return True
    return jax.default_backend() != "cpu" and not L._NO_PALLAS


def prefix_scan_kernel(F, p, axis: int):
    """Inclusive prefix sum of G1 points along `axis` via the two-level
    chunked scan.  p: projective tuple, each (..., N, ..., D) with the
    point axis at `axis`.  Drop-in replacement for msm.prefix_scan."""
    from . import msm as msm_mod
    from . import ops

    x = p[0]
    ax = axis % x.ndim
    assert ax == x.ndim - 2, "point axis must be just before the digit axis"
    lead = x.shape[:-2]
    N = x.shape[-2]
    D = x.shape[-1]
    g = CHAIN
    G = N // g
    P = 1
    for s in lead:
        P *= int(s)

    # (..., N, D) -> (P, G, g, D) -> (P, 3, D, g, G)
    def to_kernel(c):
        return jnp.transpose(c.reshape(P, G, g, D), (0, 3, 2, 1))

    pts = jnp.stack([to_kernel(c) for c in p], axis=1)  # (P, 3, D, g, G)
    out = _chunked_prefix_flat(
        spec_key(FP),
        tuple(int(v) for v in FP.one_mont),
        g,
        pts.reshape(P, 3 * D * g, G),
        _interpret(),
    ).reshape(P, 3, D, g, G)
    # within-chain inclusive prefixes, back to (..., G, g, D) per coord
    within = tuple(
        jnp.transpose(out[:, c], (0, 3, 2, 1)).reshape(*lead, G, g, D)
        for c in range(3)
    )
    # chain totals -> exclusive scan over the G chain axis (XLA, short)
    totals = tuple(w[..., g - 1, :] for w in within)  # (..., G, D)
    incl = msm_mod.prefix_scan(F, totals, axis=-2 % totals[0].ndim)
    ident = ops.identity(F, (*lead, 1))
    excl = tuple(
        jnp.concatenate([jnp.broadcast_to(i, (*lead, 1, D)), t[..., : G - 1, :]], axis=-2)
        for i, t in zip(ident, incl)
    )
    # fold the chain offsets back in: one full-width add (explicit
    # broadcast: mul_many stacks operands and needs equal shapes)
    combined = ops.padd(
        F,
        within,
        tuple(jnp.broadcast_to(e[..., None, :], w.shape) for e, w in zip(excl, within)),
    )  # (..., G, g, D)
    return tuple(c.reshape(*lead, N, D) for c in combined)
