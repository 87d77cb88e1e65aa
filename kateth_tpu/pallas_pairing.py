"""Whole-chain Pallas TPU kernels for the BLS12-381 pairing.

Round-1 measurement: the Miller loop (63 lax.scan steps) and the final
exponentiation dominated batch-verify latency — every scan step issues
~26 tiny XLA ops (kernel launch + HBM round trip each) for 1-2 lanes of
real work.  Here each chain is ONE kernel launch: the 63-step Miller
loop and the full hard-part addition chain run as in-register fori_loops
over digit-list field values (fields/pallas_tower.py), with the loop
bits streamed from SMEM.

Bit-exactness contract: the Miller kernel mirrors pairing.miller_loop's
formulas op-for-op (same RCB16 complete formulas, same line/merge
algebra), so the XLA path and this kernel produce identical projective
representatives and identical Miller values; the hard-part kernel
computes the same unique field element as fields/fp12.pow_abs_cyc chain.
Both are cross-checked against the pure-Python oracle (which uses direct
integer pow) by tests/bench self-checks.

Replaces blst_miller_loop / blst_final_exp (reference src/bls.rs:591-596).
"""

from __future__ import annotations

import os
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .fields import fp12 as fp12_mod
from .fields.pallas_mont import FieldVec, spec_key
from .fields.pallas_tower import (
    Fp2Vec,
    dconst,
    fp6_add,
    fp6_sub,
    fp6_mul_by_v,
    fp12_mul,
    fp12_sqr,
    fp12_conj,
    fp12_cyc_sqr,
    fp12_frob,
    fp12_select,
)
from .fields.specs import FP
from .oracle.field import BLS_X

X_ABS = -BLS_X
_BLOCK = 128  # pairing lane counts are tiny; one grid step

#: interpret mode lets the CPU test suite execute the kernel bodies as
#: plain JAX (slow, tiny shapes only) — the only way to cover them
#: without TPU hardware.  Read per-call and passed as a static jit arg so
#: cached executables can never mix modes.
def _interpret() -> bool:
    return os.environ.get("KATETH_PALLAS_INTERPRET") == "1"

#: MSB-first bits of |x| (bit 0 consumed as the ladder init)
_X_BITS_I32 = np.array([[int(c)] for c in bin(X_ABS)[2:]], dtype=np.int32)

_GAMMAS = fp12_mod._GAMMA  # (5, 2, D) Montgomery digit planes


# ---------------------------------------------------------------------------
# in-kernel G2 (Fp2) point ops — op-for-op mirror of curves/ops.py
# ---------------------------------------------------------------------------

def _padd(F2, p, q):
    """RCB16 Algorithm 7 (a=0), b3 = 12*xi (mirrors ops.padd)."""
    X1, Y1, Z1 = p
    X2, Y2, Z2 = q
    m0, m1, m2, m3, m4, m5 = F2.mul_many(
        [
            (X1, X2),
            (Y1, Y2),
            (Z1, Z2),
            (F2.add(X1, Y1), F2.add(X2, Y2)),
            (F2.add(Y1, Z1), F2.add(Y2, Z2)),
            (F2.add(X1, Z1), F2.add(X2, Z2)),
        ]
    )
    t3 = F2.sub(m3, F2.add(m0, m1))
    t4 = F2.sub(m4, F2.add(m1, m2))
    ty = F2.sub(m5, F2.add(m0, m2))
    t2 = F2.mul_small(F2.mul_by_xi(m2), 12)
    t0 = F2.add(F2.add(m0, m0), m0)
    z3 = F2.add(m1, t2)
    t1 = F2.sub(m1, t2)
    y3 = F2.mul_small(F2.mul_by_xi(ty), 12)
    n0, n1, n2, n3, n4, n5 = F2.mul_many(
        [(t4, y3), (t3, t1), (y3, t0), (t1, z3), (t0, t3), (z3, t4)]
    )
    X3 = F2.sub(n1, n0)
    Y3 = F2.add(n3, n2)
    Z3 = F2.add(n5, n4)
    return (X3, Y3, Z3)


def _pdouble(F2, p):
    """RCB16 Algorithm 9 (a=0), b3 = 12*xi (mirrors ops.pdouble)."""
    X, Y, Z = p
    a, bb, c, d = F2.mul_many([(Y, Y), (Y, Z), (Z, Z), (X, Y)])
    e = F2.mul_small(F2.mul_by_xi(c), 12)
    t2 = F2.mul_small(F2.mul_by_xi(c), 36)
    a8 = F2.mul_small(a, 8)
    t0 = F2.sub(a, t2)
    y3a = F2.add(a, e)
    n0, n1, n2, n3 = F2.mul_many([(e, a8), (bb, a8), (t0, y3a), (t0, d)])
    X3 = F2.add(n3, n3)
    Y3 = F2.add(n0, n2)
    Z3 = n1
    return (X3, Y3, Z3)


def _pselect(F2, mask, p, q):
    return tuple(F2.select(mask, a, b) for a, b in zip(p, q))


# ---------------------------------------------------------------------------
# line functions (mirror pairing._line_dbl / _line_add / _merge_lines)
# ---------------------------------------------------------------------------

def _line_dbl(F2, T):
    X, Y, Z = T
    x2, y2, yz = F2.mul_many([(X, X), (Y, Y), (Y, Z)])
    x3, y2z, yz2, x2z = F2.mul_many([(x2, X), (y2, Z), (yz, Z), (x2, Z)])
    a = F2.sub(F2.mul_small(x3, 3), F2.mul_small(y2z, 2))
    b = F2.neg(F2.mul_small(x2z, 3))
    c = F2.mul_small(yz2, 2)
    return a, b, c


def _line_add(F2, T, q_aff):
    X, Y, Z = T
    xq, yq = q_aff
    nzy, dzx = F2.mul_many([(yq, Z), (xq, Z)])
    n = F2.sub(nzy, Y)
    d = F2.sub(dzx, X)
    nxq, dyq = F2.mul_many([(n, xq), (d, yq)])
    a = F2.sub(nxq, dyq)
    return a, F2.neg(n), d


def _merge_lines(F2, l1, l2):
    """(a + b w^2 + c w^3)(a' + b' w^2 + c' w^3) -> dense fp12 tuple."""
    a, b, c = l1
    a2, b2, c2 = l2
    aa, bb, cc, ab_s, ac_s, bc_s = F2.mul_many(
        [
            (a, a2),
            (b, b2),
            (c, c2),
            (F2.add(a, b), F2.add(a2, b2)),
            (F2.add(a, c), F2.add(a2, c2)),
            (F2.add(b, c), F2.add(b2, c2)),
        ]
    )
    ab = F2.sub(ab_s, F2.add(aa, bb))
    ac = F2.sub(ac_s, F2.add(aa, cc))
    bc = F2.sub(bc_s, F2.add(bb, cc))
    zero = F2.zero_like(aa)
    c0 = (F2.add(aa, F2.mul_by_xi(cc)), ab, bb)
    c1 = (zero, ac, bc)
    return (c0, c1)


# ---------------------------------------------------------------------------
# kernel bodies
# ---------------------------------------------------------------------------

# All refs are rank-2 (rows*D, L): element-row r holds digits at sublanes
# r*D .. r*D+D-1 (the C-order flattening of the old (rows, D, L) layout).
# Round-2's rank-4 refs SIGABRT'd the Mosaic layout pass (layout.h:320);
# every kernel proven on hardware uses rank<=3 refs.


def _fp_rows(ref, r, D):
    """Digit list of element-row r in a (rows*D, L) ref."""
    return [ref[r * D + i, :] for i in range(D)]


def _read_fp2(ref, j, D):
    """Fp2 element at element-rows (2j, 2j+1)."""
    return (_fp_rows(ref, 2 * j, D), _fp_rows(ref, 2 * j + 1, D))


def _read_fp12(ref, D):
    """(12*D, L) ref -> fp12 tuple; element-row m = (w*3 + v)*2 + u."""

    def fp2_at(m):
        return (_fp_rows(ref, 2 * m, D), _fp_rows(ref, 2 * m + 1, D))

    c0 = tuple(fp2_at(v) for v in range(3))
    c1 = tuple(fp2_at(3 + v) for v in range(3))
    return (c0, c1)


def _write_fp12(ref, f, D):
    for w in range(2):
        for v in range(3):
            for u in range(2):
                row = f[w][v][u]
                r = (w * 3 + v) * 2 + u
                for i in range(D):
                    ref[r * D + i, :] = row[i]


def _make_miller_kernel(D, mod_digits, nprime_digits, one_mont):
    F = FieldVec(D, mod_digits, nprime_digits)
    F2 = Fp2Vec(F)

    def kernel(bits_ref, p_ref, q_ref, o_ref):
        # p_ref: (2*D, L) affine G1 (x, y); q_ref: (4*D, L) affine G2
        # (x.c0, x.c1, y.c0, y.c1); o_ref: (12*D, L) fp12.
        like = p_ref[0, :]
        one = dconst(one_mont, like)
        zero = [jnp.zeros_like(like) for _ in range(D)]
        xp = _fp_rows(p_ref, 0, D)
        yp = _fp_rows(p_ref, 1, D)
        xq = _read_fp2(q_ref, 0, D)
        yq = _read_fp2(q_ref, 1, D)
        q_aff = (xq, yq)
        q_proj = (xq, yq, (list(one), list(zero)))
        one2 = (list(one), list(zero))
        zero2 = (list(zero), list(zero))

        # f = 1 in Fp12
        zero6 = (zero2, zero2, zero2)
        f0 = ((one2, zero2, zero2), zero6)

        # Mosaic layout bug dodge (bisected on hardware, tools/
        # mosaic_bisect*.py): a fori_loop carry initialized from REF-READ
        # values SIGABRTs VectorLayoutInferer (layout.h:320); constant
        # inits compile.  So T starts as constants and adopts Q via a
        # first-iteration select INSIDE the body — bit-exact: at k==1 the
        # select yields q_proj verbatim, later iterations keep the carry.
        T0 = (zero2, one2, zero2)

        def step(k, carry):
            f, T = carry
            T = _pselect(F2, k == 1, q_proj, T)
            a, b, c = _line_dbl(F2, T)
            bxp, cyp = F2.scale_fp_many([(b, xp), (c, yp)])
            T = _pdouble(F2, T)
            a2, b2, c2 = _line_add(F2, T, q_aff)
            bxp2, cyp2 = F2.scale_fp_many([(b2, xp), (c2, yp)])
            bit = bits_ref[k, 0] > 0
            la2 = F2.select(bit, a2, one2)
            lb2 = F2.select(bit, bxp2, zero2)
            lc2 = F2.select(bit, cyp2, zero2)
            line = _merge_lines(F2, (a, bxp, cyp), (la2, lb2, lc2))
            T_add = _padd(F2, T, q_proj)
            T = _pselect(F2, bit, T_add, T)
            f = fp12_mul(F2, fp12_sqr(F2, f), line)
            return (f, T)

        n_bits = bits_ref.shape[0]
        f, _ = jax.lax.fori_loop(1, n_bits, step, (f0, T0))
        # negative BLS parameter: conjugate
        _write_fp12(o_ref, fp12_conj(F2, f), D)

    return kernel


def _make_hard_part_kernel(D, mod_digits, nprime_digits, one_mont):
    F = FieldVec(D, mod_digits, nprime_digits)
    F2 = Fp2Vec(F)

    def powx(bits_ref, g):
        """g^|x| (bits from SMEM), then conjugate for the negative sign.

        The chain inits acc = 1 (CONSTANTS) and walks ALL bits instead of
        consuming bit 0 as the init — the Mosaic layout bug dodge (see
        _make_miller_kernel / tools/mosaic_bisect4.py: ref-derived loop
        inits SIGABRT the compiler).  Bit-exact: bit 0 of |x| is 1, so
        after iteration 0 acc == cyc_sqr(1)*g == g verbatim (canonical
        Montgomery digits are unique)."""
        like = g[0][0][0][0]
        one = dconst(one_mont, like)
        zero = [jnp.zeros_like(like) for _ in range(D)]
        one2 = (list(one), list(zero))
        zero2 = (list(zero), list(zero))
        acc0 = ((one2, zero2, zero2), (zero2, zero2, zero2))

        def body(k, acc):
            acc = fp12_cyc_sqr(F2, acc)
            m = fp12_mul(F2, acc, g)
            bit = bits_ref[k, 0] > 0
            return fp12_select(F2, bit, m, acc)

        acc = jax.lax.fori_loop(0, bits_ref.shape[0], body, acc0)
        return fp12_conj(F2, acc)

    def kernel(bits_ref, f_ref, o_ref):
        f = _read_fp12(f_ref, D)
        frob = lambda x: fp12_frob(F2, x, _GAMMAS)
        t0 = fp12_mul(F2, powx(bits_ref, f), fp12_conj(F2, f))
        t1 = fp12_mul(F2, powx(bits_ref, t0), fp12_conj(F2, t0))
        t2 = fp12_mul(F2, powx(bits_ref, t1), frob(t1))
        t3 = fp12_mul(
            F2,
            fp12_mul(F2, powx(bits_ref, powx(bits_ref, t2)), frob(frob(t2))),
            fp12_conj(F2, t2),
        )
        out = fp12_mul(F2, t3, fp12_mul(F2, fp12_cyc_sqr(F2, f), f))
        _write_fp12(o_ref, out, D)

    return kernel


def _make_g2_ladder_kernel(D, mod_digits, nprime_digits, one_mont):
    F = FieldVec(D, mod_digits, nprime_digits)
    F2 = Fp2Vec(F)

    def kernel(p_ref, b_ref, o_ref):
        # p_ref: (6*D, L) projective Fp2 coords, element-row c*2 + u;
        # b_ref: (256, L) bits
        like = p_ref[0, :]
        one = dconst(one_mont, like)
        zero = [jnp.zeros_like(like) for _ in range(D)]
        base = tuple(_read_fp2(p_ref, c, D) for c in range(3))
        zero2 = (list(zero), list(zero))
        acc = (zero2, (list(one), list(zero)), (list(zero), list(zero)))

        def body(k, acc):
            acc = _pdouble(F2, acc)
            added = _padd(F2, acc, base)
            bit = b_ref[k, :] > 0
            return _pselect(F2, bit, added, acc)

        acc = jax.lax.fori_loop(0, b_ref.shape[0], body, acc)
        for c in range(3):
            for u in range(2):
                for i in range(D):
                    o_ref[(c * 2 + u) * D + i, :] = acc[c][u][i]

    return kernel


@partial(jax.jit, static_argnums=(0, 3, 4))
def _g2_ladder_flat(spec_key_, pts, bits, one_mont, interpret=False):
    # pts: (6*D, L)
    D = spec_key_[0]
    L = pts.shape[-1]
    kernel = _make_g2_ladder_kernel(D, spec_key_[1], spec_key_[2], one_mont)
    return pl.pallas_call(
        kernel,
        grid=(L // _BLOCK,),
        in_specs=[
            pl.BlockSpec((6 * D, _BLOCK), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((bits.shape[0], _BLOCK), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((6 * D, _BLOCK), lambda i: (0, i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((6 * D, L), jnp.uint32),
        interpret=interpret,
    )(pts, bits)


def g2_scalar_mul(point, scalar_digits):
    """Batched G2 scalar multiply as ONE 256-step kernel launch.

    point: projective tuple of (..., 2, D) Fp2 Montgomery coords;
    scalar_digits: (..., 16) PLAIN Fr digit planes.  The whole-chain
    analog of pallas_mont.g1_scalar_mul for the twist group (replaces
    blst_p2_mult, reference bls.rs:554-570)."""
    D = FP.n_digits
    batch = scalar_digits.shape[:-1]
    lanes = 1
    for s in batch:
        lanes *= int(s)
    pts = jnp.stack(
        [
            jnp.transpose(
                jnp.broadcast_to(c, (*batch, 2, D)).reshape(lanes, 2, D), (1, 2, 0)
            )
            for c in point
        ],
        axis=0,
    ).reshape(6 * D, lanes)
    shifts = jnp.arange(16, dtype=jnp.uint32)
    bits = (scalar_digits.reshape(lanes, 16)[..., :, None] >> shifts) & 1
    bits = bits.reshape(lanes, 256)[:, ::-1].T  # MSB first, (256, L)
    Lp = -(-lanes // _BLOCK) * _BLOCK
    if Lp != lanes:
        pts = jnp.pad(pts, ((0, 0), (0, Lp - lanes)))
        bits = jnp.pad(bits, ((0, 0), (0, Lp - lanes)))
    out = _g2_ladder_flat(
        spec_key(FP),
        pts,
        bits.astype(jnp.uint32),
        tuple(int(v) for v in FP.one_mont),
        _interpret(),
    ).reshape(3, 2, D, -1)
    return tuple(
        jnp.transpose(out[c][:, :, :lanes], (2, 0, 1)).reshape(*batch, 2, D)
        for c in range(3)
    )


# ---------------------------------------------------------------------------
# host wrappers (layout: XLA fp12 (..., 2, 3, 2, D) <-> kernel (12, D, L))
# ---------------------------------------------------------------------------

def _pad_lanes(x, lanes):
    Lp = -(-lanes // _BLOCK) * _BLOCK
    if Lp != lanes:
        x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, Lp - lanes)])
    return x


@partial(jax.jit, static_argnums=(0, 4, 5))
def _miller_flat(spec_key_, bits, p, q, one_mont, interpret=False):
    # p: (2*D, L) affine G1; q: (4*D, L) affine G2
    D = spec_key_[0]
    L = p.shape[-1]
    kernel = _make_miller_kernel(D, spec_key_[1], spec_key_[2], one_mont)
    return pl.pallas_call(
        kernel,
        grid=(L // _BLOCK,),
        in_specs=[
            pl.BlockSpec((bits.shape[0], 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((2 * D, _BLOCK), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((4 * D, _BLOCK), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((12 * D, _BLOCK), lambda i: (0, i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((12 * D, L), jnp.uint32),
        interpret=interpret,
    )(bits, p, q)


@partial(jax.jit, static_argnums=(0, 3, 4))
def _hard_part_flat(spec_key_, bits, f, one_mont, interpret=False):
    # f: (12*D, L) fp12 rows
    D = spec_key_[0]
    L = f.shape[-1]
    kernel = _make_hard_part_kernel(D, spec_key_[1], spec_key_[2], one_mont)
    return pl.pallas_call(
        kernel,
        grid=(L // _BLOCK,),
        in_specs=[
            pl.BlockSpec((bits.shape[0], 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((12 * D, _BLOCK), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((12 * D, _BLOCK), lambda i: (0, i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((12 * D, L), jnp.uint32),
        # the 7 sequential powx fori_loops keep ~145 (288, 128) temporaries
        # live across loop boundaries; the default 16 MiB scoped-VMEM limit
        # OOMs at 21.3 MiB (hardware log, round 3) — raise it (v5e VMEM is
        # 128 MiB; this kernel runs alone)
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(bits, f)


def fp12_to_rows(x):
    """(*batch, 2, 3, 2, D) -> ((12*D, L), lanes)."""
    D = x.shape[-1]
    batch = x.shape[:-4]
    lanes = 1
    for s in batch:
        lanes *= int(s)
    rows = x.reshape(lanes, 12, D)
    return jnp.transpose(rows, (1, 2, 0)).reshape(12 * D, lanes), lanes


def fp12_from_rows(a, batch):
    D = a.shape[0] // 12
    lanes = 1
    for s in batch:
        lanes *= int(s)
    a = a.reshape(12, D, -1)
    return jnp.transpose(a[:, :, :lanes], (2, 0, 1)).reshape(*batch, 2, 3, 2, D)


def miller_loop_affine(xp, yp, xq, yq):
    """Batched Miller loop on AFFINE inputs (xp/yp: (*batch, D) Fp;
    xq/yq: (*batch, 2, D) Fp2) via one kernel launch.  Infinity masking
    is the caller's job (mirrors pairing.miller_loop)."""
    D = FP.n_digits
    batch = xp.shape[:-1]
    lanes = 1
    for s in batch:
        lanes *= int(s)
    p = jnp.stack([xp.reshape(lanes, D).T, yp.reshape(lanes, D).T], axis=0).reshape(
        2 * D, lanes
    )
    q = jnp.stack(
        [
            jnp.transpose(xq.reshape(lanes, 2, D), (1, 2, 0)),
            jnp.transpose(yq.reshape(lanes, 2, D), (1, 2, 0)),
        ],
        axis=0,
    ).reshape(4 * D, lanes)
    p = _pad_lanes(p, lanes)
    q = _pad_lanes(q, lanes)
    out = _miller_flat(
        spec_key(FP),
        jnp.asarray(_X_BITS_I32),
        p,
        q,
        tuple(int(v) for v in FP.one_mont),
        _interpret(),
    )
    return fp12_from_rows(out, batch)


def hard_part(f):
    """Cyclotomic hard-part chain (one kernel launch); f: (*batch, 2,3,2,D)
    AFTER the easy part."""
    batch = f.shape[:-4]
    rows, lanes = fp12_to_rows(f)
    rows = _pad_lanes(rows, lanes)
    out = _hard_part_flat(
        spec_key(FP),
        jnp.asarray(_X_BITS_I32),
        rows,
        tuple(int(v) for v in FP.one_mont),
        _interpret(),
    )
    return fp12_from_rows(out, batch)
