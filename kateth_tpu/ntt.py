"""Number-theoretic transform over Fr digit planes.

The reference stays in Lagrange (evaluation) form and never needs an NTT —
its bit-reversal machinery (reference src/math.rs:34-74) is exactly the
NTT input reordering, which is why the trusted setup stores BRP'd points.
This module adds the monomial <-> Lagrange conversion path as a
first-class TPU kernel (BASELINE config 5 / SURVEY §7 L5): radix-2
decimation-in-time butterflies, one `lax`-free static stage loop (log2 N
stages, each ONE batched Montgomery multiply over N/2 lanes), twiddles
device-resident in Montgomery form.

A two-step (Cooley-Tukey N = A*B) distributed variant exchanges data with
all_to_all between the column and row passes; see parallel/ntt usage in
tests.
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np
import jax
import jax.numpy as jnp

from .fields import limbs as L
from .fields.specs import FR
from .oracle.field import R as FR_MOD


@lru_cache(maxsize=None)
def _stage_twiddles(n: int, inverse: bool):
    """Per-stage twiddle tables for DIT butterflies on bit-reversed input.

    Stage s (s = 1..log2 n, block size m = 2^s) uses w_m^j, j < m/2, where
    w_m = w^(n/m) and w is the primitive n-th root (7^((r-1)/n), reference
    math.rs:5-14).  Each table is broadcast to n/2 lanes in block order.
    """
    w = pow(7, (FR_MOD - 1) // n, FR_MOD)
    if inverse:
        w = pow(w, FR_MOD - 2, FR_MOD)
    stages = []
    m = 2
    while m <= n:
        wm = pow(w, n // m, FR_MOD)
        tw = [pow(wm, j, FR_MOD) for j in range(m // 2)]
        # butterfly lanes are (n/m blocks) x (m/2 positions)
        table = np.stack([FR.from_int(t) for t in tw])  # (m/2, 16) Montgomery
        stages.append(np.broadcast_to(table, (n // m, m // 2, 16)).reshape(n // 2, 16))
        m *= 2
    return stages


@lru_cache(maxsize=None)
def _brp_indices(n: int) -> np.ndarray:
    bits = n.bit_length() - 1
    return np.array([int(format(i, f"0{bits}b")[::-1], 2) for i in range(n)])


def _n_inv_mont(n: int) -> np.ndarray:
    return FR.from_int(pow(n, FR_MOD - 2, FR_MOD))


def _ntt_stages(x: jax.Array, n: int, inverse: bool) -> jax.Array:
    for s, table in enumerate(_stage_twiddles(n, inverse), start=1):
        m = 1 << s
        tw = jnp.asarray(table).reshape(n // m, m // 2, 16)
        xr = x.reshape(*x.shape[:-2], n // m, 2, m // 2, 16)
        u = xr[..., 0, :, :]
        v = L.mont_mul(FR, xr[..., 1, :, :], jnp.broadcast_to(tw, xr[..., 1, :, :].shape))
        lo = L.add(FR, u, v)
        hi = L.sub(FR, u, v)
        x = jnp.stack([lo, hi], axis=-3).reshape(*x.shape[:-2], n, 16)
        # interleave: after stage s, elements of a block are (lo..., hi...)
        # contiguous — the stack above puts lo block then hi block, correct
        # for DIT with bit-reversed input.
    return x


def ntt_mont(x_mont: jax.Array, inverse: bool = False, bitrev_input: bool = False,
             bitrev_output: bool = False, axis: int = -2) -> jax.Array:
    """Radix-2 DIT NTT along `axis` (default -2; Montgomery in/out).

    DIT consumes bit-reversed input and produces natural-order output; the
    flags let callers skip permutations when their data already lives in
    BRP order (the library's native layout for blobs and setup tables).
    """
    if axis % x_mont.ndim != x_mont.ndim - 2:
        x = jnp.moveaxis(x_mont, axis, -2)
        out = ntt_mont(x, inverse, bitrev_input, bitrev_output, axis=-2)
        return jnp.moveaxis(out, -2, axis)
    n = x_mont.shape[-2]
    assert n & (n - 1) == 0 and n > 1
    x = x_mont
    if not bitrev_input:
        x = jnp.take(x, jnp.asarray(_brp_indices(n)), axis=-2)
    x = _ntt_stages(x, n, inverse)
    if bitrev_output:
        x = jnp.take(x, jnp.asarray(_brp_indices(n)), axis=-2)
    if inverse:
        ninv = jnp.asarray(_n_inv_mont(n), dtype=jnp.uint32)
        x = L.mont_mul(FR, x, jnp.broadcast_to(ninv, x.shape))
    return x


def lagrange_brp_to_monomial(evals_brp_mont: jax.Array) -> jax.Array:
    """Blob layout (evaluations over BRP'd roots) -> monomial coefficients.

    evals in BRP order are exactly the bit-reversed input the inverse DIT
    wants, so no permutation is materialized.
    """
    return ntt_mont(evals_brp_mont, inverse=True, bitrev_input=True)


def monomial_to_lagrange_brp(coeffs_mont: jax.Array) -> jax.Array:
    """Monomial coefficients -> evaluations in BRP (blob) order."""
    return ntt_mont(coeffs_mont, inverse=False, bitrev_input=False, bitrev_output=True)
