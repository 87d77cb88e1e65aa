"""Distributed NTT: four-step Cooley-Tukey with all_to_all stage exchange.

N = A * B decomposition (A = rows, B = columns), columns sharded over the
mesh.  With x in natural order viewed row-major as x[n1*B + n2]:

  step 1: A-point NTTs down each column (root w^B)      — local
  step 2: twiddle G[k1, n2] *= w^(k1 * n2)              — local
  step 3: transpose to row-sharded layout               — all_to_all (ICI)
  step 4: B-point NTTs along each row (root w^A)        — local

giving X[k1 + A*k2] at matrix position [k1, k2].  This is the SURVEY §2b
"NTT stage exchange" component (sequence-parallel analog); the reference
has no counterpart (it never leaves Lagrange form).
"""

from __future__ import annotations

from functools import lru_cache, partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P
from jax.experimental.shard_map import shard_map

from ..fields import limbs as L
from ..fields.specs import FR
from ..oracle.field import R as FR_MOD
from ..ntt import ntt_mont, _n_inv_mont
from .mesh import AXIS


@lru_cache(maxsize=None)
def _twiddle_matrix(a: int, b: int, inverse: bool) -> np.ndarray:
    """w^(k1*n2) for k1 < a, n2 < b (Montgomery), w the (a*b)-th root."""
    n = a * b
    w = pow(7, (FR_MOD - 1) // n, FR_MOD)
    if inverse:
        w = pow(w, FR_MOD - 2, FR_MOD)
    out = np.zeros((a, b, 16), dtype=np.uint32)
    for k1 in range(a):
        base = pow(w, k1, FR_MOD)
        cur = 1
        for n2 in range(b):
            out[k1, n2] = FR.from_int(cur)
            cur = cur * base % FR_MOD
    return out


def sharded_ntt(mesh, x_mont: jax.Array, inverse: bool = False) -> jax.Array:
    """NTT of (..., N, 16) Montgomery planes, N split as (A rows, B cols)
    with columns sharded over the mesh.

    Input natural order along axis -2; output is the NTT in the
    "transposed" four-step order X[k1 + A*k2] at flat position k2*A + k1
    — callers undo with `four_step_unshuffle` (or consume directly; the
    order is a fixed permutation).
    """
    n = x_mont.shape[-2]
    p = mesh.devices.size
    a = p  # rows = device count: transpose is one all_to_all
    b = n // p
    assert a * b == n and b % p == 0, (n, p)
    tw = jnp.asarray(_twiddle_matrix(a, b, inverse))

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(None, AXIS, None), P(None, AXIS, None)),
        out_specs=P(AXIS, None, None),
    )
    def run(xm, twm):
        # xm: (A, B/P, 16) — this device's column slice, natural row order
        g = ntt_mont(xm, inverse=inverse, axis=-3)  # A-point NTTs per column
        g = L.mont_mul(FR, g, twm)  # twiddle w^(k1*n2)
        # transpose to row-sharded: (A, B/P) -> (A/P, B) over ICI
        g2 = g.reshape(p, a // p, b // p, 16)
        g2 = jax.lax.all_to_all(g2, AXIS, split_axis=0, concat_axis=2)
        g2 = g2.reshape(a // p, b, 16)
        return ntt_mont(g2, inverse=inverse, axis=-2)  # B-point NTTs per row

    x2 = x_mont.reshape(*x_mont.shape[:-2], a, b, 16)
    assert x2.ndim == 3, "batch dims: vmap the caller for now"
    # no extra 1/N factor: the two local inverse sub-NTTs contribute
    # (1/A)(1/B) = 1/N already
    return run(x2, tw)  # (A, B, 16) with X[k1 + A k2] at [k1, k2]


@lru_cache(maxsize=None)
def four_step_order(a: int, b: int) -> np.ndarray:
    """Permutation mapping four-step output [k1, k2] (flattened k1*b + k2)
    back to natural order k = k1 + a*k2: natural[k] = flat[k1*b + k2]."""
    k = np.arange(a * b)
    k1 = k % a
    k2 = k // a
    return (k1 * b + k2).astype(np.int32)


def sharded_ntt_natural(mesh, x_mont: jax.Array, inverse: bool = False) -> jax.Array:
    """sharded_ntt + unshuffle to natural order (gather on the host side
    of the shard boundary; fine for tests, avoid on the hot path)."""
    n = x_mont.shape[-2]
    p = mesh.devices.size
    out = sharded_ntt(mesh, x_mont, inverse)
    flat = out.reshape(n, 16)
    idx = jnp.asarray(four_step_order(p, n // p))
    return jnp.take(flat, idx, axis=0)
