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
    """Field adapter giving the curve formulas a uniform interface."""

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


def _fp_mul_many(pairs):
    lhs = jnp.stack([a for a, _ in pairs], axis=0)
    rhs = jnp.stack([b for _, b in pairs], axis=0)
    p = L.mont_mul(FP, lhs, rhs)
    return [p[i] for i in range(len(pairs))]


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
)


def _fp2_mul_many(pairs):
    """Batch n Fp2 Karatsuba products into one (3n)-wide Fp multiply."""
    n = len(pairs)
    lhs_rows = []
    rhs_rows = []
    for a, b in pairs:
        a0, a1 = a[..., 0, :], a[..., 1, :]
        b0, b1 = b[..., 0, :], b[..., 1, :]
        lhs_rows += [a0, a1, L.add(FP, a0, a1)]
        rhs_rows += [b0, b1, L.add(FP, b0, b1)]
    p = L.mont_mul(FP, jnp.stack(lhs_rows, 0), jnp.stack(rhs_rows, 0))
    out = []
    for i in range(n):
        t0, t1, t2 = p[3 * i], p[3 * i + 1], p[3 * i + 2]
        c0 = L.sub(FP, t0, t1)
        c1 = L.sub(FP, t2, L.add(FP, t0, t1))
        out.append(jnp.stack([c0, c1], axis=-2))
    return out


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
    """Complete projective addition (RCB16 Algorithm 7, a=0)."""
    X1, Y1, Z1 = p
    X2, Y2, Z2 = q
    m0, m1, m2, m3, m4, m5 = F.mul_many(
        [
            (X1, X2),
            (Y1, Y2),
            (Z1, Z2),
            (F.add(X1, Y1), F.add(X2, Y2)),
            (F.add(Y1, Z1), F.add(Y2, Z2)),
            (F.add(X1, Z1), F.add(X2, Z2)),
        ]
    )
    t3 = F.sub(m3, F.add(m0, m1))  # X1Y2 + X2Y1
    t4 = F.sub(m4, F.add(m1, m2))  # Y1Z2 + Y2Z1
    ty = F.sub(m5, F.add(m0, m2))  # X1Z2 + X2Z1
    t0 = F.add(F.add(m0, m0), m0)  # 3 X1X2
    t2 = F.mul_b3(m2)  # b3 Z1Z2
    z3 = F.add(m1, t2)
    t1 = F.sub(m1, t2)
    y3 = F.mul_b3(ty)
    n0, n1, n2, n3, n4, n5 = F.mul_many(
        [(t4, y3), (t3, t1), (y3, t0), (t1, z3), (t0, t3), (z3, t4)]
    )
    X3 = F.sub(n1, n0)
    Y3 = F.add(n3, n2)
    Z3 = F.add(n5, n4)
    return (X3, Y3, Z3)


def pdouble(F: CurveField, p):
    """Complete projective doubling (RCB16 Algorithm 9, a=0)."""
    X, Y, Z = p
    a, bb, c, d = F.mul_many([(Y, Y), (Y, Z), (Z, Z), (X, Y)])
    e = F.mul_b3(c)  # b3 Z^2
    a8 = F.add(F.add(a, a), F.add(a, a))
    a8 = F.add(a8, a8)  # 8 Y^2
    t2 = F.add(F.add(e, e), e)  # 3 b3 Z^2
    t0 = F.sub(a, t2)
    y3a = F.add(a, e)
    n0, n1, n2, n3 = F.mul_many([(e, a8), (bb, a8), (t0, y3a), (t0, d)])
    X3 = F.add(n3, n3)
    Y3 = F.add(n0, n2)
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
