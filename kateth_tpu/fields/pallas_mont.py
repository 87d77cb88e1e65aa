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

import os
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


class FieldVec:
    """In-kernel field arithmetic on digit LISTS (one (lanes,) vector per
    digit).  The building block every Pallas crypto kernel here shares:
    values stay in vector registers, all loops are static."""

    def __init__(self, D: int, mod_digits, nprime_digits):
        self.D = D
        self.N = [np.uint32(int(x)) for x in mod_digits]
        self.NP = [np.uint32(int(x)) for x in nprime_digits]
        self.NOT_N = [np.uint32((~int(x)) & 0xFFFF) for x in self.N]

    def csub(self, res):
        """Conditional subtract N (res < 2N, canonical digits)."""
        D = self.D
        c2 = jnp.ones_like(res[0])
        diff = []
        for c in range(D):
            v = res[c] + self.NOT_N[c] + c2
            diff.append(v & MASK)
            c2 = v >> DIGIT_BITS
        take = c2 > 0  # carry out => res >= N
        return [jnp.where(take, d, r) for d, r in zip(diff, res)]

    def add(self, a, b):
        """(a + b) mod N."""
        D = self.D
        carry = None
        out = []
        for c in range(D):
            v = a[c] + b[c]
            if carry is not None:
                v = v + carry
            out.append(v & MASK)
            carry = v >> DIGIT_BITS
        # top carry is zero: a + b < 2N < R for both Fr and Fp digit widths
        return self.csub(out)

    def sub(self, a, b):
        """(a - b) mod N via a + (N - b)."""
        D = self.D
        # n_minus_b = N - b (b canonical => no underflow)
        c2 = jnp.ones_like(a[0])
        nmb = []
        for c in range(D):
            v = self.N[c] + ((~b[c]) & MASK) + c2
            nmb.append(v & MASK)
            c2 = v >> DIGIT_BITS
        return self.add(a, nmb)

    def mul(self, a, b):
        """Montgomery product (full conv + REDC), both operands digit lists."""
        D, N, NP = self.D, self.N, self.NP
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
        return self.csub(res)

    def sqr(self, a):
        return self.mul(a, a)

    def select(self, mask, a, b):
        return [jnp.where(mask, x, y) for x, y in zip(a, b)]


def _make_kernel(D: int, mod_digits, nprime_digits):
    F = FieldVec(D, mod_digits, nprime_digits)

    def kernel(a_ref, b_ref, o_ref):
        a = [a_ref[i, :] for i in range(D)]
        b = [b_ref[i, :] for i in range(D)]
        out = F.mul(a, b)
        for c in range(D):
            o_ref[c, :] = out[c]

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


# ---------------------------------------------------------------------------
# whole-chain kernels: one launch per CHAIN, not per step
# ---------------------------------------------------------------------------
#
# The deep square-and-multiply / double-and-add chains are the other half
# of the latency story: as lax.scan they execute body-HLO-count x steps
# tiny ops (a 255-step G1 ladder measured ~120 ms of pure op-launch on
# v5e).  Here the whole chain is ONE kernel; the static exponent unrolls
# into the kernel body as compile-time branches (mul-by-bit only where
# the bit is set), so e.g. a sqrt chain is 379 sqr + ~190 mul register
# ops with zero launch overhead.

_SMALL_BLOCK = 128  # pow chains run few lanes; keep VMEM pressure low
#: ladder block: wide enough that typical verify batches are ONE grid
#: step (grid steps run sequentially, so a small block multiplies the
#: whole 256-iteration chain; per-iteration cost is op-issue bound and
#: nearly flat in lane count)
_LADDER_BLOCK = 512


def _interpret() -> bool:
    return os.environ.get("KATETH_PALLAS_INTERPRET") == "1"


@partial(jax.jit, static_argnums=(0, 3, 4))
def _pow_chain_flat(spec_key_, at, bits_arr, n_bits, interpret=False):
    """(D, L) Montgomery base -> base^e.

    bits_arr: (n_bits, 1) int32 exponent bits MSB-first (bit 0 consumed as
    the init).  The chain runs as an in-kernel fori_loop — the Mosaic body
    is ONE sqr+mul+select, so compile time is flat in exponent length
    (a fully unrolled 570-bit chain took 37 min to compile; this takes
    seconds and runs identically: the select squashes the untaken mul).
    """
    D, mod_digits, nprime_digits = spec_key_
    F = FieldVec(D, mod_digits, nprime_digits)
    L = at.shape[1]

    def kernel(b_ref, a_ref, o_ref):
        a = [a_ref[i, :] for i in range(D)]
        acc = list(a)  # bit 0 of e (MSB) is always 1

        def body(k, acc):
            acc = F.sqr(acc)
            mul = F.mul(acc, a)
            bit = b_ref[k, 0] > 0
            return F.select(bit, mul, acc)

        acc = jax.lax.fori_loop(1, n_bits, body, acc)
        for c in range(D):
            o_ref[c, :] = acc[c]

    return pl.pallas_call(
        kernel,
        grid=(L // _SMALL_BLOCK,),
        in_specs=[
            pl.BlockSpec((n_bits, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((D, _SMALL_BLOCK), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (D, _SMALL_BLOCK), lambda i: (0, i), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((D, L), jnp.uint32),
        interpret=interpret,
    )(bits_arr, at)


def pow_const(spec, a: jax.Array, e: int) -> jax.Array:
    """a^e (Montgomery in/out) for a static exponent, as ONE kernel launch."""
    assert e >= 1
    shape = a.shape
    D = spec.n_digits
    lanes = 1
    for s in shape[:-1]:
        lanes *= int(s)
    at = a.reshape(lanes, D).T
    Lp = -(-lanes // _SMALL_BLOCK) * _SMALL_BLOCK
    if Lp != lanes:
        at = jnp.pad(at, ((0, 0), (0, Lp - lanes)))
    bits = np.array([[int(c)] for c in bin(e)[2:]], dtype=np.int32)
    out = _pow_chain_flat(spec_key(spec), at, jnp.asarray(bits), len(bits), _interpret())
    return out[:, :lanes].T.reshape(shape)


def _dstack(items):
    """k digit lists -> one digit list of (k, ...) arrays (shared codeblock)."""
    D = len(items[0])
    return [jnp.stack([it[i] for it in items], axis=0) for i in range(D)]


def _dunstack(x):
    k = x[0].shape[0]
    return [[d[j] for d in x] for j in range(k)]


class G1Vec:
    """In-kernel complete-formula G1 arithmetic on digit-list coordinates
    (RCB16 Algorithms 7/9, a=0, b3=12 — mirrors curves/ops.py).

    Each formula phase stacks its independent products into ONE FieldVec
    multiply codeblock over a (rows, lanes) array — the kernel body stays
    at ~2 multiply blocks per point op (vs 12 unstacked), which cuts the
    Mosaic instruction count ~6x at identical arithmetic volume."""

    def __init__(self, F: FieldVec, one_mont):
        self.F = F
        self.ONE = [np.uint32(int(x)) for x in one_mont]

    def dbl_field(self, x):
        return self.F.add(x, x)

    def mul12(self, x):
        """12*x mod N as three modular doublings + one add (each step
        stays < 2N, so no widened-digit headroom is needed)."""
        x2 = self.dbl_field(x)
        x4 = self.dbl_field(x2)
        x8 = self.dbl_field(x4)
        return self.F.add(x8, x4)

    def identity(self, like):
        F = self.F
        zero = [jnp.zeros_like(like[0]) for _ in range(F.D)]
        one = [jnp.full_like(like[0], o) for o in self.ONE]
        return (zero, one, [jnp.zeros_like(like[0]) for _ in range(F.D)])

    def _mul_many(self, pairs):
        F = self.F
        P = F.mul(_dstack([a for a, _ in pairs]), _dstack([b for _, b in pairs]))
        return _dunstack(P)

    def padd(self, p, q):
        F = self.F
        X1, Y1, Z1 = p
        X2, Y2, Z2 = q
        m0, m1, m2, m3, m4, m5 = self._mul_many(
            [
                (X1, X2),
                (Y1, Y2),
                (Z1, Z2),
                (F.add(X1, Y1), F.add(X2, Y2)),
                (F.add(Y1, Z1), F.add(Y2, Z2)),
                (F.add(X1, Z1), F.add(X2, Z2)),
            ]
        )
        t3 = F.sub(m3, F.add(m0, m1))
        t4 = F.sub(m4, F.add(m1, m2))
        ty = F.sub(m5, F.add(m0, m2))
        t2 = self.mul12(m2)
        t0 = F.add(F.add(m0, m0), m0)  # 3*m0
        z3 = F.add(m1, t2)
        t1 = F.sub(m1, t2)
        y3 = self.mul12(ty)
        n0, n1, n2, n3, n4, n5 = self._mul_many(
            [(t3, t1), (t4, y3), (t1, z3), (y3, t0), (z3, t4), (t0, t3)]
        )
        X3 = F.sub(n0, n1)
        Y3 = F.add(n2, n3)
        Z3 = F.add(n4, n5)
        return (X3, Y3, Z3)

    def padd_mixed_flag(self, p, x2, y2, flag):
        """Complete addition of an AFFINE-with-flag point: q = (x2, y2, Z2)
        with Z2 = flag ? 1 : 0 (in Montgomery form), i.e. flag=0 means q is
        the identity (the caller stores identity rows as (0, 1_mont)).

        This is RCB16 Algorithm 7 specialized to Z2 in {0, 1}: the Z1*Z2
        product collapses to a lane select, saving one of the 12 field
        multiplies while staying COMPLETE for every input (identity,
        doubling, inverse pairs).  The comb fixed-base commitment kernel
        (curves/comb.py) does all its point work through this."""
        F = self.F
        X1, Y1, Z1 = p
        one = [jnp.where(flag, jnp.full_like(x2[0], o), jnp.zeros_like(x2[0]))
               for o in self.ONE]  # Z2 as a digit list
        m0, m1, m3, m4, m5 = self._mul_many(
            [
                (X1, x2),
                (Y1, y2),
                (F.add(X1, Y1), F.add(x2, y2)),
                (F.add(Y1, Z1), F.add(y2, one)),
                (F.add(X1, Z1), F.add(x2, one)),
            ]
        )
        m2 = [jnp.where(flag, z, jnp.zeros_like(z)) for z in Z1]  # Z1*Z2
        t3 = F.sub(m3, F.add(m0, m1))
        t4 = F.sub(m4, F.add(m1, m2))
        ty = F.sub(m5, F.add(m0, m2))
        t2 = self.mul12(m2)
        t0 = F.add(F.add(m0, m0), m0)  # 3*m0
        z3 = F.add(m1, t2)
        t1 = F.sub(m1, t2)
        y3 = self.mul12(ty)
        n0, n1, n2, n3, n4, n5 = self._mul_many(
            [(t3, t1), (t4, y3), (t1, z3), (y3, t0), (z3, t4), (t0, t3)]
        )
        X3 = F.sub(n0, n1)
        Y3 = F.add(n2, n3)
        Z3 = F.add(n4, n5)
        return (X3, Y3, Z3)

    def pdouble(self, p):
        F = self.F
        X, Y, Z = p
        a, bb, c, d = self._mul_many([(Y, Y), (Y, Z), (Z, Z), (X, Y)])
        e = self.mul12(c)  # b3 Z^2
        t2 = F.add(F.add(e, e), e)  # 3 b3 Z^2
        a8 = F.add(F.add(a, a), F.add(a, a))
        a8 = F.add(a8, a8)  # 8 Y^2
        t0 = F.sub(a, t2)
        y3a = F.add(a, e)
        n0, n1, n2, n3 = self._mul_many([(t0, d), (e, a8), (t0, y3a), (bb, a8)])
        X3 = F.add(n0, n0)
        Y3 = F.add(n1, n2)
        Z3 = n3
        return (X3, Y3, Z3)

    def select(self, mask, p, q):
        F = self.F
        return tuple(
            [jnp.where(mask, x, y) for x, y in zip(cp, cq)] for cp, cq in zip(p, q)
        )


@partial(jax.jit, static_argnums=(0, 1, 4))
def _g1_ladder_flat(spec_key_, one_mont, pts, bits, n_bits):
    """Double-and-add ladder, whole chain in one kernel.

    pts: (3, D, L) Montgomery projective coords; bits: (n_bits, L) u32
    (MSB first).  Returns (3, D, L) accumulator.
    """
    D, mod_digits, nprime_digits = spec_key_
    F = FieldVec(D, mod_digits, nprime_digits)
    G = G1Vec(F, one_mont)
    L = pts.shape[2]

    def kernel(p_ref, b_ref, o_ref):
        base = tuple([p_ref[c, i, :] for i in range(D)] for c in range(3))
        acc = G.identity(base[0])

        def body(k, acc):
            acc = G.pdouble(acc)
            added = G.padd(acc, base)
            bit = b_ref[k, :] > 0
            return G.select(bit, added, acc)

        acc = jax.lax.fori_loop(0, n_bits, body, acc)
        for c in range(3):
            for i in range(D):
                o_ref[c, i, :] = acc[c][i]

    return pl.pallas_call(
        kernel,
        grid=(L // _LADDER_BLOCK,),
        in_specs=[
            pl.BlockSpec(
                (3, D, _LADDER_BLOCK), lambda i: (0, 0, i), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (n_bits, _LADDER_BLOCK), lambda i: (0, i), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (3, D, _LADDER_BLOCK), lambda i: (0, 0, i), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((3, D, L), jnp.uint32),
    )(pts, bits)


def g1_scalar_mul(spec, one_mont_digits, point, scalar_digits):
    """Batched G1 scalar multiply as ONE kernel launch.

    point: projective tuple of (..., D) Montgomery coords; scalar_digits:
    (..., 16) PLAIN Fr digit planes (a full 256 bits are walked — the top
    bit is zero for canonical scalars AND for the group order itself, and
    a leading zero bit just doubles the identity).  Returns the
    projective product.
    """
    D = spec.n_digits
    batch = scalar_digits.shape[:-1]
    lanes = 1
    for s in batch:
        lanes *= int(s)
    pts = jnp.stack(
        [jnp.broadcast_to(c, (*batch, D)).reshape(lanes, D).T for c in point], axis=0
    )
    # bits, MSB first: (256, L) — 256 rows keep the sublane tiling aligned
    shifts = jnp.arange(16, dtype=jnp.uint32)
    bits = (scalar_digits.reshape(lanes, 16)[..., :, None] >> shifts) & 1
    bits = bits.reshape(lanes, 256)[:, ::-1].T
    Lp = -(-lanes // _LADDER_BLOCK) * _LADDER_BLOCK
    if Lp != lanes:
        pts = jnp.pad(pts, ((0, 0), (0, 0), (0, Lp - lanes)))
        bits = jnp.pad(bits, ((0, 0), (0, Lp - lanes)))
    out = _g1_ladder_flat(
        spec_key(spec),
        tuple(int(x) for x in one_mont_digits),
        pts,
        bits.astype(jnp.uint32),
        256,
    )
    return tuple(out[c][:, :lanes].T.reshape(*batch, D) for c in range(3))
