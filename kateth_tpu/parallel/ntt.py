"""Distributed NTT: four-step Cooley-Tukey with all_to_all stage exchange.

N = A * B decomposition (A = rows, B = columns), columns sharded over the
mesh.  With x in natural order viewed row-major as x[n1*B + n2]:

  step 1: A-point NTTs down each column (root w^B)      — local
  step 2: twiddle G[k1, n2] *= w^(k1 * n2)              — local
  step 3: transpose to row-sharded layout               — all_to_all (ICI)
  step 4: B-point NTTs along each row (root w^A)        — local
  step 5: (natural order) global matrix transpose       — all_to_all (ICI)

The intermediate result has X[k1 + A*k2] at matrix position [k1, k2]; the
optional step 5 undoes that ON DEVICE (a second ICI transpose), so no
host gather ever touches the data.  Batched over leading dims.  This is
the SURVEY §2b "NTT stage exchange" component (sequence-parallel analog);
the reference has no counterpart (it never leaves Lagrange form, see
math.rs:34-74) — the consumer here is the monomial<->Lagrange conversion
API (kzg/api.py blobs_to_coefficients / coefficients_to_blobs).
"""

from __future__ import annotations

from functools import lru_cache, partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P
from jax import shard_map

from ..fields import limbs as L
from ..fields.specs import FR
from ..oracle.field import R as FR_MOD
from ..ntt import ntt_mont
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


def sharded_ntt(
    mesh, x_mont: jax.Array, inverse: bool = False, natural_output: bool = True
) -> jax.Array:
    """NTT of (*batch, N, 16) Montgomery planes across the mesh.

    N = A*B with A = device count and B = N/A; requires B % P == 0
    (i.e. N a multiple of P^2 — every power-of-two domain >= P^2 works).
    Input natural order along axis -2.  With natural_output (default) the
    result is in natural order, device-resident and sharded along the
    element axis; otherwise it is the raw four-step order
    X[k1 + A*k2] at flat position k1*B + k2.
    """
    n = x_mont.shape[-2]
    p = mesh.devices.size
    a = p  # rows = device count: each transpose is one all_to_all
    b = n // p
    assert a * b == n and b % p == 0, (
        f"sharded_ntt needs N divisible by device_count^2 (N={n}, P={p})"
    )
    batch = x_mont.shape[:-2]
    x2 = x_mont.reshape(-1, a, b, 16)  # (F, A, B, 16) flat batch
    tw = jnp.asarray(_twiddle_matrix(a, b, inverse))[None]

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(None, None, AXIS, None), P(None, None, AXIS, None)),
        out_specs=P(None, AXIS, None, None),
    )
    def run(xm, twm):
        # xm: (F, A, B/P, 16) — this device's column slice, natural rows
        g = ntt_mont(xm, inverse=inverse, axis=-3)  # A-point NTTs per column
        g = L.mont_mul(FR, g, jnp.broadcast_to(twm, g.shape))
        # transpose to row-sharded: (F, A, B/P) -> (F, A/P, B) over ICI.
        # all_to_all puts the SOURCE-device axis at concat_axis; global
        # n2 = source*B/P + n2local, so reorder to (source, n2local)
        # before merging (the b == p case hides a wrong order — test with
        # b > p).
        f = g.shape[0]
        g2 = g.reshape(f, p, a // p, b // p, 16)
        g2 = jax.lax.all_to_all(g2, AXIS, split_axis=1, concat_axis=3)
        # g2: (F, A/P, B/P, P, 16), axis 3 = source device
        g2 = jnp.transpose(g2, (0, 1, 3, 2, 4)).reshape(f, a // p, b, 16)
        out = ntt_mont(g2, inverse=inverse, axis=-2)  # B-point NTTs per row
        if not natural_output:
            return out
        # step 5: global transpose (A, B) -> (B, A) over ICI, so the flat
        # output is natural order k = k1 + A*k2 (no host gather)
        o2 = out.reshape(f, a // p, p, b // p, 16)
        o3 = jax.lax.all_to_all(o2, AXIS, split_axis=2, concat_axis=0)
        # o3: (P, F, A/P, B/P, 16) with axis 0 = source device (k1 block)
        o4 = jnp.transpose(o3, (1, 3, 0, 2, 4)).reshape(f, b // p, a, 16)
        return o4  # rows k2 (sharded), cols k1: natural flat order

    out = run(x2, tw)
    if natural_output:
        # (F, B, A, 16) row-major == natural element order
        return out.reshape(*batch, n, 16) if batch else out.reshape(n, 16)
    return out.reshape(*batch, n, 16) if batch else out.reshape(n, 16)


@lru_cache(maxsize=None)
def _twiddle_matrix_rowbrp(a: int, b: int, inverse: bool) -> np.ndarray:
    """w^(rev_A(i1) * k2) for i1 < a, k2 < b: the step-2 twiddles when the
    row index carries bit-reversed n1 (BRP-input four-step)."""
    n = a * b
    w = pow(7, (FR_MOD - 1) // n, FR_MOD)
    if inverse:
        w = pow(w, FR_MOD - 2, FR_MOD)
    bits = a.bit_length() - 1
    out = np.zeros((a, b, 16), dtype=np.uint32)
    for i1 in range(a):
        n1 = int(format(i1, f"0{bits}b")[::-1], 2) if bits else 0
        base = pow(w, n1, FR_MOD)
        cur = 1
        for k2 in range(b):
            out[i1, k2] = FR.from_int(cur)
            cur = cur * base % FR_MOD
    return out


def sharded_ntt_from_brp(mesh, x_mont: jax.Array, inverse: bool = False) -> jax.Array:
    """NTT of (*batch, N, 16) planes given in BIT-REVERSED element order —
    the library's native layout for blobs and setup tables — returning
    NATURAL-order output, fully device-resident.

    Uses the column-major four-step split n = n1 + A*n2, which lets BOTH
    local sub-NTTs consume their bit-reversed inputs natively (DIT with
    bitrev_input=True), so no element permutation is ever materialized:

      M[i1, i2] = x_brp[i1*B + i2] holds x[rev_A(i1) + A*rev_B(i2)]
      step 1: B-point DIT along each row (input rev_B order)   — local
      step 2: twiddle w^(rev_A(i1) * k2)                       — local
      step 3: transpose to column-sharded                      — all_to_all
      step 4: A-point DIT along the row index (rev_A order)    — local
      step 5: transpose back -> natural flat k = k1*B + k2     — all_to_all

    This is the distributed engine behind Kzg.blobs_to_coefficients.
    """
    n = x_mont.shape[-2]
    p = mesh.devices.size
    a = p
    b = n // p
    assert a * b == n and b % p == 0, (
        f"sharded_ntt_from_brp needs N divisible by device_count^2 (N={n}, P={p})"
    )
    batch = x_mont.shape[:-2]
    x2 = x_mont.reshape(-1, a, b, 16)  # (F, A, B, 16); rows = rev_A(n1)
    tw = jnp.asarray(_twiddle_matrix_rowbrp(a, b, inverse))[None]

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(None, AXIS, None, None), P(None, AXIS, None, None)),
        out_specs=P(None, AXIS, None, None),
    )
    def run(xm, twm):
        # xm: (F, A/P, B, 16) — this device's row block
        f = xm.shape[0]
        g = ntt_mont(xm, inverse=inverse, bitrev_input=True, axis=-2)
        g = L.mont_mul(FR, g, jnp.broadcast_to(twm, g.shape))
        # transpose rows<->cols: (F, A/P, B) -> (F, A, B/P) over ICI
        g2 = g.reshape(f, a // p, p, b // p, 16)
        g3 = jax.lax.all_to_all(g2, AXIS, split_axis=2, concat_axis=0)
        # g3: (P, F, A/P, B/P) with axis 0 = source device (row block)
        g4 = jnp.transpose(g3, (1, 0, 2, 3, 4)).reshape(f, a, b // p, 16)
        # step 4: A-point DIT along the (rev_A-ordered) row index
        out = ntt_mont(g4, inverse=inverse, bitrev_input=True, axis=-3)
        # out[k1, k2local]: transpose back so device j holds k1-block j
        o2 = out.reshape(f, p, a // p, b // p, 16)
        o3 = jax.lax.all_to_all(o2, AXIS, split_axis=1, concat_axis=0)
        # o3: (P, F, A/P, B/P) with axis 0 = source device (k2 block);
        # global k2 = source*B/P + k2local, so cols order (source, k2local)
        o4 = jnp.transpose(o3, (1, 2, 0, 3, 4)).reshape(f, a // p, b, 16)
        return o4  # rows k1 (sharded), cols k2: natural flat order

    out = run(x2, tw)
    return out.reshape(*batch, n, 16) if batch else out.reshape(n, 16)


@lru_cache(maxsize=None)
def four_step_order(a: int, b: int) -> np.ndarray:
    """Permutation mapping four-step output [k1, k2] (flattened k1*b + k2)
    back to natural order k = k1 + a*k2: natural[k] = flat[k1*b + k2]."""
    k = np.arange(a * b)
    k1 = k % a
    k2 = k // a
    return (k1 * b + k2).astype(np.int32)


def sharded_ntt_natural(mesh, x_mont: jax.Array, inverse: bool = False) -> jax.Array:
    """Back-compat alias: sharded_ntt with device-side natural ordering."""
    return sharded_ntt(mesh, x_mont, inverse, natural_output=True)
