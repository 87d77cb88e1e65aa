"""Pallas TPU kernel for batched Montgomery multiplication.

The XLA digit-plane path (limbs._conv_digits + mont_reduce) materializes
per-group product slabs in HBM: a (64, 4096)-lane Fr multiply moves ~7 GB
through HBM for ~0.2 GMAC of integer work — two orders of magnitude off
the roofline, and the dominant cost of barycentric evaluation and the MSM
prefix scans (measured: ~8.5 ms per such multiply on v5e).

This kernel keeps the whole schoolbook-conv + Montgomery-reduction
pipeline for one lane block in VMEM/vector registers: HBM traffic drops
to the inputs and outputs (3 * L * D * 4 bytes), and the unrolled
D x D digit loops run at VPU rate.  Same math as limbs.mont_mul
(16-bit digits in u32 lanes, lo/hi split products, delayed-carry columns,
non-interleaved REDC with N' = -N^-1 mod R), so results are bit-identical.

Layout: digit-major (D, L) blocks — the digit axis must be register-
indexable (static python indices), so it maps to sublanes and the lane
axis to the 128-wide vector lanes.

Replaces the hot-loop portion of the blst Montgomery assembly
(reference src/bls.rs:8-19 symbol surface: blst_fr_mul / blst_fp_mul).
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DIGIT_BITS = 16
MASK = np.uint32(0xFFFF)

#: lanes per kernel block (vector-register friendly, multiple of 128)
BLOCK = 512

#: dispatch threshold: below this many lanes the XLA skew path wins
#: (kernel launch + relayout overhead dominates tiny tensors)
MIN_LANES = 2048


def _softc(cols):
    """Two non-propagating carry rounds; digits drop to <= 2^16."""
    for _ in range(2):
        nxt = []
        carry_prev = None
        for c, v in enumerate(cols):
            lo = v & MASK
            if carry_prev is not None:
                lo = lo + carry_prev
            carry_prev = v >> DIGIT_BITS
            nxt.append(lo)
        cols = nxt  # top carry dropped (provably zero by caller contract)
    return cols


def _make_kernel(D: int, mod_digits, nprime_digits):
    N = [np.uint32(int(x)) for x in mod_digits]
    NP = [np.uint32(int(x)) for x in nprime_digits]

    def kernel(a_ref, b_ref, o_ref):
        a = [a_ref[i, :] for i in range(D)]
        b = [b_ref[i, :] for i in range(D)]
        zero = jnp.zeros_like(a[0])

        # 1. t = a*b as 2D delayed-carry columns (lo/hi split products)
        t = [zero] * (2 * D)
        for i in range(D):
            for j in range(D):
                p = a[i] * b[j]
                t[i + j] = t[i + j] + (p & MASK)
                t[i + j + 1] = t[i + j + 1] + (p >> DIGIT_BITS)
        t = _softc(t)  # digits <= 2^16

        # 2. m = (t mod R) * N' mod R  (low D columns only)
        m = [zero] * D
        for i in range(D):
            for j in range(D - i):
                p = t[i] * NP[j]
                m[i + j] = m[i + j] + (p & MASK)
                if i + j + 1 < D:
                    m[i + j + 1] = m[i + j + 1] + (p >> DIGIT_BITS)
        m = _softc(m)

        # 3. u = m * N (full width), total = u + t
        u = [zero] * (2 * D)
        for i in range(D):
            for j in range(D):
                p = m[i] * N[j]
                u[i + j] = u[i + j] + (p & MASK)
                u[i + j + 1] = u[i + j + 1] + (p >> DIGIT_BITS)
        total = [u[c] + t[c] for c in range(2 * D)]

        # 4. full sequential carry; (t + mN)/R = columns D..2D-1
        carry = zero
        res = []
        for c in range(2 * D):
            v = total[c] + carry
            if c >= D:
                res.append(v & MASK)
            carry = v >> DIGIT_BITS
        # top carry provably zero: t + mN < R*N + R*N = 2RN < R*R

        # 5. conditional subtract N (res < 2N)
        borrow_in = jnp.ones_like(res[0])  # +1 of two's complement
        diff = []
        c2 = borrow_in
        for c in range(D):
            v = res[c] + np.uint32((~int(N[c])) & 0xFFFF) + c2
            diff.append(v & MASK)
            c2 = v >> DIGIT_BITS
        take = c2 > 0  # carry out => res >= N
        for c in range(D):
            o_ref[c, :] = jnp.where(take, diff[c], res[c])

    return kernel


@partial(jax.jit, static_argnums=(0,))
def _mont_mul_flat(spec_key, at, bt):
    """(D, L) digit-major operands -> (D, L) Montgomery product."""
    D, modulus_digits, nprime_digits = spec_key
    L = at.shape[1]
    kernel = _make_kernel(D, modulus_digits, nprime_digits)
    grid = (L // BLOCK,)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((D, BLOCK), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((D, BLOCK), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((D, BLOCK), lambda i: (0, i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((D, L), jnp.uint32),
    )(at, bt)


def spec_key(spec):
    """Hashable static description for the kernel cache."""
    return (
        spec.n_digits,
        tuple(int(x) for x in spec.mod_digits),
        tuple(int(x) for x in spec.nprime_digits),
    )


def mont_mul(spec, a: jax.Array, b: jax.Array) -> jax.Array:
    """Drop-in batched Montgomery product via the Pallas kernel.

    Caller guarantees lane count is 'large' (see MIN_LANES); any batch
    shape is accepted, lanes are padded to the block size internally.
    """
    shape = jnp.broadcast_shapes(a.shape, b.shape)
    a = jnp.broadcast_to(a, shape)
    b = jnp.broadcast_to(b, shape)
    D = spec.n_digits
    lanes = 1
    for s in shape[:-1]:
        lanes *= int(s)
    at = a.reshape(lanes, D).T
    bt = b.reshape(lanes, D).T
    Lp = -(-lanes // BLOCK) * BLOCK
    if Lp != lanes:
        pad = ((0, 0), (0, Lp - lanes))
        at = jnp.pad(at, pad)
        bt = jnp.pad(bt, pad)
    out = _mont_mul_flat(spec_key(spec), at, bt)
    return out[:, :lanes].T.reshape(shape)
