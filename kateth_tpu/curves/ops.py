"""Branchless complete-formula curve arithmetic, generic over Fp / Fp2.

Uses the complete projective addition/doubling formulas for short
Weierstrass curves with a=0 (Renes-Costello-Batina 2016, Algorithms 7/9).
Complete formulas are the TPU-native choice: they are single straight-line
programs valid for EVERY input combination (identity, doubling, inverse
pairs), so batched point additions need no data-dependent branching at all
— the exact property the reference gets from blst's branchy C
(reference: blst_p1_add/blst_p1_mult surface, src/bls.rs:536-552).

Points are homogeneous projective triples (X, Y, Z); x = X/Z, y = Y/Z;
the identity is (0 : 1 : 0).  Field elements are digit planes: (..., D)
for Fp (G1) and (..., 2, D) for Fp2 (G2).

The 6 independent field products of each formula phase are stacked into a
single batched multiply (for G2, Karatsuba expands each to 3 base
products, so one call carries 18 Fp multiplies): graph size and kernel
launches stay small, vector lanes stay full.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Callable

import numpy as np
import jax
import jax.numpy as jnp

from ..fields import limbs as L
from ..fields import fp2
from ..fields.specs import FP, FR


@dataclass(frozen=True, eq=False)
class CurveField:
    """Field adapter giving the curve formulas a uniform interface.

    The *_many batching methods exist for the XLA compilation model: each
    field op instantiates a ~200-op carry chain, so the curve formulas
    stack every independent group of adds/subs/products into ONE call.
    """

    name: str
    add: Callable
    sub: Callable
    neg: Callable
    mul_many: Callable  # list[(a, b)] -> list of products, one batched call
    mul_b3: Callable  # multiply by 3*b (12 for G1, 12(1+u) for G2)
    zero: Callable  # shape -> zero element
    one: Callable  # shape -> one element (Montgomery)
    is_zero: Callable
    eq: Callable
    expand: Callable  # broadcast a (...,)-mask over field trailing dims
    inv: Callable
    sqr_many: Callable  # list[a] -> list of squares
    add_many: Callable = None  # list[(a, b)] -> list of sums, one chain
    sub_many: Callable = None  # list[(a, b)] -> list of diffs, one chain
    smallmul_many: Callable = None  # list[(a, k, xi?)] -> list, one chain


def _fp_mul_many(pairs):
    lhs = jnp.stack([a for a, _ in pairs], axis=0)
    rhs = jnp.stack([b for _, b in pairs], axis=0)
    p = L.mont_mul(FP, lhs, rhs)
    return [p[i] for i in range(len(pairs))]


def _stacked_binop(op):
    def run(pairs):
        lhs = jnp.stack([jnp.broadcast_to(a, jnp.broadcast_shapes(a.shape, b.shape))
                         for a, b in pairs], axis=0)
        rhs = jnp.stack([jnp.broadcast_to(b, jnp.broadcast_shapes(a.shape, b.shape))
                         for a, b in pairs], axis=0)
        out = op(lhs, rhs)
        return [out[i] for i in range(len(pairs))]

    return run


def _fp_smallmul_many(items):
    """items: [(elem, k, apply_xi)] — xi ignored for Fp."""
    xs = jnp.stack([x for x, _, _ in items], axis=0)
    ks = np.array([k for _, k, _ in items], dtype=np.uint32)
    ks = ks.reshape(-1, *([1] * (xs.ndim - 2)))
    out = L.mul_small(FP, xs, ks)
    return [out[i] for i in range(len(items))]


FP_FIELD = CurveField(
    name="fp",
    add=lambda a, b: L.add(FP, a, b),
    sub=lambda a, b: L.sub(FP, a, b),
    neg=lambda a: L.neg(FP, a),
    mul_many=_fp_mul_many,
    mul_b3=lambda a: L.mul_small(FP, a, 12),
    zero=lambda shape=(): jnp.zeros((*shape, FP.n_digits), dtype=jnp.uint32),
    one=lambda shape=(): jnp.broadcast_to(
        jnp.asarray(FP.one_mont, dtype=jnp.uint32), (*shape, FP.n_digits)
    ),
    is_zero=L.is_zero,
    eq=L.eq,
    expand=lambda m: m[..., None],
    inv=lambda a: L.inv(FP, a),
    sqr_many=lambda xs: _fp_mul_many([(x, x) for x in xs]),
    add_many=_stacked_binop(lambda a, b: L.add(FP, a, b)),
    sub_many=_stacked_binop(lambda a, b: L.sub(FP, a, b)),
    smallmul_many=_fp_smallmul_many,
)


def _fp2_mul_many(pairs):
    """Batch n Fp2 Karatsuba products: stacked tensors, ~7 carry chains
    total regardless of n."""
    shapes = [jnp.broadcast_shapes(a.shape, b.shape) for a, b in pairs]
    A = jnp.stack([jnp.broadcast_to(a, s) for (a, _), s in zip(pairs, shapes)], 0)
    B = jnp.stack([jnp.broadcast_to(b, s) for (_, b), s in zip(pairs, shapes)], 0)
    out = fp2.mul(A, B)
    return [out[i] for i in range(len(pairs))]


def _fp2_smallmul_many(items):
    """items: [(elem, k, apply_xi)] — one xi pass + one widened multiply."""
    xs = [x for x, _, _ in items]
    flags = [f for _, _, f in items]
    if any(flags):
        xi_idx = [i for i, f in enumerate(flags) if f]
        stacked = jnp.stack([xs[i] for i in xi_idx], axis=0)
        xied = fp2.mul_by_xi(stacked)
        for j, i in enumerate(xi_idx):
            xs[i] = xied[j]
    st = jnp.stack(xs, axis=0)
    ks = np.array([k for _, k, _ in items], dtype=np.uint32)
    ks = ks.reshape(-1, *([1] * (st.ndim - 2)))
    out = L.mul_small(FP, st, ks)
    return [out[i] for i in range(len(items))]


FP2_FIELD = CurveField(
    name="fp2",
    add=fp2.add,
    sub=fp2.sub,
    neg=fp2.neg,
    mul_many=_fp2_mul_many,
    mul_b3=lambda a: fp2.mul_small(fp2.mul_by_xi(a), 12),  # b3 = 12(1+u)
    zero=fp2.zero,
    one=fp2.one,
    is_zero=fp2.is_zero,
    eq=fp2.eq,
    expand=lambda m: m[..., None, None],
    inv=fp2.inv,
    sqr_many=lambda xs: _fp2_mul_many([(x, x) for x in xs]),
    add_many=_stacked_binop(fp2.add),
    sub_many=_stacked_binop(fp2.sub),
    smallmul_many=_fp2_smallmul_many,
)


# ---------------------------------------------------------------------------
# point ops
# ---------------------------------------------------------------------------

def identity(F: CurveField, shape=()):
    """(0 : 1 : 0)."""
    return (F.zero(shape), F.one(shape), F.zero(shape))


def is_identity(F: CurveField, p):
    return F.is_zero(p[2])


def padd(F: CurveField, p, q):
    """Complete projective addition (RCB16 Algorithm 7, a=0).

    Every independent group of adds/subs/small-multiplies is one stacked
    carry chain: ~10 field-op instantiations total.
    """
    X1, Y1, Z1 = p
    X2, Y2, Z2 = q
    s1, s2, s3, s4, s5, s6 = F.add_many(
        [(X1, Y1), (X2, Y2), (Y1, Z1), (Y2, Z2), (X1, Z1), (X2, Z2)]
    )
    m0, m1, m2, m3, m4, m5 = F.mul_many(
        [(X1, X2), (Y1, Y2), (Z1, Z2), (s1, s2), (s3, s4), (s5, s6)]
    )
    s01, s12, s02, d0 = F.add_many([(m0, m1), (m1, m2), (m0, m2), (m0, m0)])
    t3, t4, ty = F.sub_many([(m3, s01), (m4, s12), (m5, s02)])
    t2, = F.smallmul_many([(m2, 12, True)])
    t0, z3 = F.add_many([(d0, m0), (m1, t2)])  # 3 X1X2 ; m1 + b3 Z1Z2
    t1 = F.sub(m1, t2)
    y3, = F.smallmul_many([(ty, 12, True)])
    n0, n1, n2, n3, n4, n5 = F.mul_many(
        [(t4, y3), (t3, t1), (y3, t0), (t1, z3), (t0, t3), (z3, t4)]
    )
    X3 = F.sub(n1, n0)
    Y3, Z3 = F.add_many([(n3, n2), (n5, n4)])
    return (X3, Y3, Z3)


def pdouble(F: CurveField, p):
    """Complete projective doubling (RCB16 Algorithm 9, a=0); grouped ops."""
    X, Y, Z = p
    a, bb, c, d = F.mul_many([(Y, Y), (Y, Z), (Z, Z), (X, Y)])
    # e = b3 Z^2 ; t2 = 3 b3 Z^2 ; a8 = 8 Y^2 — one widened multiply
    e, t2, a8 = F.smallmul_many([(c, 12, True), (c, 36, True), (a, 8, False)])
    t0 = F.sub(a, t2)
    y3a = F.add(a, e)
    n0, n1, n2, n3 = F.mul_many([(e, a8), (bb, a8), (t0, y3a), (t0, d)])
    X3, Y3 = F.add_many([(n3, n3), (n0, n2)])
    Z3 = n1
    return (X3, Y3, Z3)


def pneg(F: CurveField, p):
    return (p[0], F.neg(p[1]), p[2])


def pselect(F: CurveField, mask, p, q):
    """Elementwise point select: mask ? p : q (mask shape = batch shape)."""
    m = F.expand(mask)
    return tuple(jnp.where(m, a, b) for a, b in zip(p, q))


def scalar_bits_msb(scalar_digits: jax.Array, n_bits: int = 255) -> jax.Array:
    """Plain (non-Montgomery) Fr digit planes (..., 16) -> (n_bits, ...)
    bit array, most significant bit first, ready for lax.scan."""
    shifts = jnp.arange(L.DIGIT_BITS, dtype=jnp.uint32)
    bits = (scalar_digits[..., :, None] >> shifts) & 1  # (..., 16, 16) LSB first
    bits = bits.reshape(*scalar_digits.shape[:-1], -1)  # (..., 256)
    bits = bits[..., :n_bits][..., ::-1]  # MSB first
    return jnp.moveaxis(bits, -1, 0).astype(jnp.bool_)


def scalar_mul(F: CurveField, p, scalar_digits: jax.Array, n_bits: int = 255):
    """Double-and-add with masked adds (255 fixed steps, lax.scan).

    Replaces blst_p1_mult/blst_p2_mult (reference bls.rs:477-489, which
    also uses 255-bit scalars).  scalar_digits are PLAIN (non-Montgomery)
    Fr digits.
    """
    bits = scalar_bits_msb(scalar_digits, n_bits)
    fdim = _field_ndim(F)
    batch = np.broadcast_shapes(jnp.shape(p[0])[:-fdim], scalar_digits.shape[:-1])
    init = identity(F, batch)
    # broadcast the base point up to the batch shape so every field op in
    # the scan body sees rank-matched operands (a lone point against a
    # batched scalar would otherwise broadcast quadratically in mul_many)
    p_b = tuple(
        jnp.broadcast_to(c, (*batch, *jnp.shape(c)[jnp.ndim(c) - fdim :])) for c in p
    )

    def step(acc, bit):
        acc = pdouble(F, acc)
        acc_plus = padd(F, acc, p_b)
        return pselect(F, bit, acc_plus, acc), None

    out, _ = jax.lax.scan(step, init, bits)
    return out


def _field_ndim(F: CurveField) -> int:
    return 1 if F.name == "fp" else 2


def to_affine(F: CurveField, p):
    """Projective -> affine (x, y); identity maps to (0, 0)."""
    X, Y, Z = p
    zinv = F.inv(Z)  # zero -> zero
    x, y = F.mul_many([(X, zinv), (Y, zinv)])
    return (x, y)


def on_curve(F: CurveField, p):
    """Y^2 Z == X^3 + b Z^3 (b = b3/3: use 3Y^2 Z == 3X^3 + b3 Z^3)."""
    X, Y, Z = p
    y2, x2, z2 = F.mul_many([(Y, Y), (X, X), (Z, Z)])
    y2z, x3, z3 = F.mul_many([(y2, Z), (x2, X), (z2, Z)])
    lhs = F.add(F.add(y2z, y2z), y2z)
    rhs = F.add(F.add(F.add(x3, x3), x3), F.mul_b3(z3))
    return F.eq(lhs, rhs)


def peq(F: CurveField, p, q):
    """Projective equality: cross-multiplied coordinates."""
    X1, Y1, Z1 = p
    X2, Y2, Z2 = q
    a, b, c, d = F.mul_many([(X1, Z2), (X2, Z1), (Y1, Z2), (Y2, Z1)])
    both_inf = is_identity(F, p) & is_identity(F, q)
    one_inf = is_identity(F, p) ^ is_identity(F, q)
    return both_inf | (~one_inf & F.eq(a, b) & F.eq(c, d))
