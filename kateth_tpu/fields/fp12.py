"""Fp12 = Fp6[w]/(w^2 - v) on digit planes.

An Fp12 element is a ``(..., 2, 3, 2, D)`` uint32 array.

Compilation-model design: the XLA graph cost of a tower operation is
dominated by the NUMBER of distinct field-op instantiations (each carry
chain is ~200 HLO ops), not by arithmetic volume.  So every operation
here is written in "coordinate-tensor" form: the element is viewed as a
(..., 12, D) plane and all structural adds/subs/negs of the schoolbook
formulas execute as a handful of SLICED TENSOR ops (one carry chain each,
vectorized over coordinates), with all 54 base-field products of a full
multiply in ONE stacked Montgomery multiply.  A dense fp12 multiply costs
~13 field-op instantiations instead of ~130.

Replaces the blst fp12 surface behind blst_miller_loop / blst_final_exp /
blst_fp12_mul / blst_fp12_is_one (reference src/bls.rs:591-596).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from . import limbs as L
from . import fp2
from . import fp6
from .specs import FP


def zero(shape=()) -> jax.Array:
    return jnp.zeros((*shape, 2, 3, 2, FP.n_digits), dtype=jnp.uint32)


def one(shape=()) -> jax.Array:
    out = np.zeros((*shape, 2, 3, 2, FP.n_digits), dtype=np.uint32)
    out[..., 0, 0, 0, :] = FP.one_mont
    return jnp.asarray(out)


def from_ints(a) -> np.ndarray:
    """Oracle Fp12 nested tuples -> digit planes (2, 3, 2, D)."""
    return np.stack([fp6.from_ints(a[0]), fp6.from_ints(a[1])])


def to_ints(x):
    x = np.asarray(x)
    return (fp6.to_ints(x[..., 0, :, :, :]), fp6.to_ints(x[..., 1, :, :, :]))


def add(a, b):
    return L.add(FP, a, b)


def sub(a, b):
    return L.sub(FP, a, b)


def conj(a):
    """a0 - a1 w (== Frobenius^6; inverse on the cyclotomic subgroup).
    One negation instantiation over the whole a1 half."""
    return jnp.concatenate(
        [a[..., 0:1, :, :, :], L.neg(FP, a[..., 1:2, :, :, :])], axis=-4
    )


# ---------------------------------------------------------------------------
# coordinate-tensor machinery
# ---------------------------------------------------------------------------
#
# An Fp6 operand is a (..., 3, 2, D) tensor (3 Fp2 coords).  Its Karatsuba
# row block is (..., 18, D): 6 Fp2 products (t0,t1,t2 of the coordinate
# pairs and s0,s1,s2 of the coordinate sums), each expanded to 3 Fp rows.

_IDX_A = np.array([1, 0, 0])  # fp2-coord sums: (x1+x2, x0+x1, x0+x2)
_IDX_B = np.array([2, 1, 2])


def _fp6_rows(X: jax.Array) -> jax.Array:
    """(..., 3, 2, D) -> (..., 18, D) Karatsuba row block (2 add chains)."""
    s = L.add(FP, X[..., _IDX_A, :, :], X[..., _IDX_B, :, :])  # (..., 3, 2, D)
    x6 = jnp.concatenate([X, s], axis=-3)  # (..., 6, 2, D)
    c0 = x6[..., 0, :]
    c1 = x6[..., 1, :]
    c01 = L.add(FP, c0, c1)
    rows = jnp.stack([c0, c1, c01], axis=-2)  # (..., 6, 3, D)
    return rows.reshape(*rows.shape[:-3], 18, rows.shape[-1])


def _fp6_from_products(p: jax.Array) -> jax.Array:
    """(..., 18, D) row products -> (..., 3, 2, D) Fp6 result (5 chains)."""
    q = p.reshape(*p.shape[:-2], 6, 3, p.shape[-1])  # (..., 6 prods, 3 rows, D)
    t01 = L.add(FP, q[..., 0, :], q[..., 1, :])  # (..., 6, D)
    c0 = L.sub(FP, q[..., 0, :], q[..., 1, :])
    c1 = L.sub(FP, q[..., 2, :], t01)
    f2 = jnp.stack([c0, c1], axis=-2)  # (..., 6, 2, D) Fp2 products
    t = f2[..., 0:3, :, :]  # t0, t1, t2
    s = f2[..., 3:6, :, :]  # s0, s1, s2
    u = L.add(FP, t[..., _IDX_A, :, :], t[..., _IDX_B, :, :])
    v = L.sub(FP, s, u)  # (s0-(t1+t2), s1-(t0+t1), s2-(t0+t2))
    # c0 = t0 + xi v0 ; c1 = v1 + xi t2 ; c2 = v2 + t1   (xi = 1+u)
    xi_in = jnp.stack([v[..., 0, :, :], t[..., 2, :, :]], axis=-3)  # (..., 2, 2, D)
    xi_out = _mul_by_xi_nd(xi_in)
    lhs = jnp.stack([t[..., 0, :, :], v[..., 1, :, :], v[..., 2, :, :]], axis=-3)
    rhs = jnp.stack([xi_out[..., 0, :, :], xi_out[..., 1, :, :], t[..., 1, :, :]], axis=-3)
    return L.add(FP, lhs, rhs)  # (..., 3, 2, D)


def _mul_by_xi_nd(a: jax.Array) -> jax.Array:
    """xi = (1 + u) multiplication on stacked fp2 coords (..., 2, D):
    (c0 - c1, c0 + c1) — one sub + one add over the whole stack."""
    c0, c1 = a[..., 0, :], a[..., 1, :]
    return jnp.stack([L.sub(FP, c0, c1), L.add(FP, c0, c1)], axis=-2)


def _mul_by_v_nd(a: jax.Array) -> jax.Array:
    """v * (fp6 tensor (..., 3, 2, D)): (a0,a1,a2) -> (xi a2, a0, a1)."""
    return jnp.concatenate(
        [_mul_by_xi_nd(a[..., 2:3, :, :]), a[..., 0:2, :, :]], axis=-3
    )


def mul(a, b):
    """Dense multiply: 54 products in one stacked call, ~13 carry chains."""
    a0, a1 = a[..., 0, :, :, :], a[..., 1, :, :, :]
    b0, b1 = b[..., 0, :, :, :], b[..., 1, :, :, :]
    a01 = L.add(FP, a0, a1)
    b01 = L.add(FP, b0, b1)
    AA = jnp.stack([a0, a1, a01], axis=-4)  # (..., 3, 3, 2, D)
    BB = jnp.stack([b0, b1, b01], axis=-4)
    p = L.mont_mul(FP, _fp6_rows(AA), _fp6_rows(BB))  # (..., 3, 18, D)
    P = _fp6_from_products(p)  # (..., 3, 3, 2, D): A0B0, A1B1, (A0+A1)(B0+B1)
    t0 = P[..., 0, :, :, :]
    t1 = P[..., 1, :, :, :]
    s = P[..., 2, :, :, :]
    c0 = L.add(FP, t0, _mul_by_v_nd(t1))
    c1 = L.sub(FP, s, L.add(FP, t0, t1))
    return jnp.stack([c0, c1], axis=-4)


def sqr(a):
    """Complex squaring: c0 = (a0+a1)(a0+v a1) - t - v t, c1 = 2t, t = a0 a1."""
    a0, a1 = a[..., 0, :, :, :], a[..., 1, :, :, :]
    lhs = jnp.stack([a0, L.add(FP, a0, a1)], axis=-4)  # (..., 2, 3, 2, D)
    rhs = jnp.stack([a1, L.add(FP, a0, _mul_by_v_nd(a1))], axis=-4)
    p = L.mont_mul(FP, _fp6_rows(lhs), _fp6_rows(rhs))  # (..., 2, 18, D)
    P = _fp6_from_products(p)
    t = P[..., 0, :, :, :]
    s = P[..., 1, :, :, :]
    c0 = L.sub(FP, s, L.add(FP, t, _mul_by_v_nd(t)))
    c1 = L.add(FP, t, t)
    return jnp.stack([c0, c1], axis=-4)


def _fp6_mul_pairs(X: jax.Array, Y: jax.Array) -> jax.Array:
    """Batched fp6 products: X, Y (..., k, 3, 2, D) -> (..., k, 3, 2, D)."""
    return _fp6_from_products(L.mont_mul(FP, _fp6_rows(X), _fp6_rows(Y)))


def _fp6_inv(a: jax.Array) -> jax.Array:
    """Fp6 inversion (adjoint formula) in coordinate-tensor form."""
    a0 = a[..., 0, :, :]
    a1 = a[..., 1, :, :]
    a2 = a[..., 2, :, :]
    # stage 1: a0^2, a1*a2, a2^2, a0*a1, a1^2, a0*a2  (one fp2-row call)
    lhs = jnp.stack([a0, a1, a2, a0, a1, a0], axis=-3)
    rhs = jnp.stack([a0, a2, a2, a1, a1, a2], axis=-3)
    p = _fp2_mul_nd(lhs, rhs)
    xi2 = _mul_by_xi_nd(jnp.stack([p[..., 1, :, :], p[..., 2, :, :]], axis=-3))
    c0 = L.sub(FP, p[..., 0, :, :], xi2[..., 0, :, :])  # a0^2 - xi a1 a2
    c1 = L.sub(FP, xi2[..., 1, :, :], p[..., 3, :, :])  # xi a2^2 - a0 a1
    c2 = L.sub(FP, p[..., 4, :, :], p[..., 5, :, :])  # a1^2 - a0 a2
    # stage 2: a2 c1, a1 c2, a0 c0
    q = _fp2_mul_nd(
        jnp.stack([a2, a1, a0], axis=-3), jnp.stack([c1, c2, c0], axis=-3)
    )
    txi = _mul_by_xi_nd(L.add(FP, q[..., 0, :, :], q[..., 1, :, :]))
    t = L.add(FP, txi, q[..., 2, :, :])
    tinv = fp2.inv(t)
    C = jnp.stack([c0, c1, c2], axis=-3)
    return _fp2_mul_nd(C, jnp.broadcast_to(tinv[..., None, :, :], C.shape))


def _fp2_mul_nd(a: jax.Array, b: jax.Array) -> jax.Array:
    """Batched fp2 products over a stacked coord axis: (..., k, 2, D)."""
    a0, a1 = a[..., 0, :], a[..., 1, :]
    b0, b1 = b[..., 0, :], b[..., 1, :]
    lhs = jnp.stack([a0, a1, L.add(FP, a0, a1)], axis=-2)  # (..., k, 3, D)
    rhs = jnp.stack([b0, b1, L.add(FP, b0, b1)], axis=-2)
    p = L.mont_mul(FP, lhs, rhs)
    t01 = L.add(FP, p[..., 0, :], p[..., 1, :])
    c0 = L.sub(FP, p[..., 0, :], p[..., 1, :])
    c1 = L.sub(FP, p[..., 2, :], t01)
    return jnp.stack([c0, c1], axis=-2)


def inv(a):
    """1/(a0 + a1 w) = (a0 - a1 w) / (a0^2 - v a1^2); zero -> zero."""
    a0, a1 = a[..., 0, :, :, :], a[..., 1, :, :, :]
    sq = _fp6_mul_pairs(
        jnp.stack([a0, a1], axis=-4), jnp.stack([a0, a1], axis=-4)
    )
    t = L.sub(FP, sq[..., 0, :, :, :], _mul_by_v_nd(sq[..., 1, :, :, :]))
    tinv = _fp6_inv(t)
    return _fp6_mul_pairs(
        jnp.stack([a0, L.neg(FP, a1)], axis=-4),
        jnp.broadcast_to(tinv[..., None, :, :, :], (*tinv.shape[:-3], 2, *tinv.shape[-3:])),
    )


def is_one(a):
    return eq(a, jnp.broadcast_to(one(), a.shape))


def is_zero(a):
    return jnp.all(a == 0, axis=(-1, -2, -3, -4))


def eq(a, b):
    return jnp.all(a == b, axis=(-1, -2, -3, -4))


def select(mask, a, b):
    """mask ? a : b with batch-shaped mask."""
    return jnp.where(mask[..., None, None, None, None], a, b)


# --- Frobenius ---------------------------------------------------------------

def _gammas():
    from ..oracle.field import GAMMA1

    return np.stack([fp2.from_ints(*g) for g in GAMMA1])  # (5, 2, D)


_GAMMA = _gammas()


def frob(a):
    """x -> x^p: coordinate-wise Fp2 conjugation then gamma twists, as one
    negation + one stacked multiply (oracle reference: fp12_frob)."""
    # conjugate every fp2 coord: negate the u-components in one chain
    c = jnp.concatenate(
        [a[..., :, :, 0:1, :], L.neg(FP, a[..., :, :, 1:2, :])], axis=-2
    )  # (..., 2, 3, 2, D)
    flat = c.reshape(*c.shape[:-4], 6, 2, c.shape[-1])  # w-major: b0c0..b0c2, b1c0..b1c2
    # gamma multipliers: b0 coords 1,2 get g1,g3; b1 coords 0,1,2 get g0,g2,g4
    onem = np.zeros((2, FP.n_digits), dtype=np.uint32)
    onem[0] = FP.one_mont
    gt = jnp.asarray(
        np.stack([onem, np.asarray(_GAMMA[1]), np.asarray(_GAMMA[3]),
                  np.asarray(_GAMMA[0]), np.asarray(_GAMMA[2]), np.asarray(_GAMMA[4])])
    )  # (6, 2, D)
    out = _fp2_mul_nd(flat, jnp.broadcast_to(gt, flat.shape))
    return out.reshape(*a.shape)


# --- cyclotomic subgroup ops -------------------------------------------------

def _fp2_sqr_nd(a: jax.Array) -> jax.Array:
    """Batched fp2 squares over a stacked coord axis (..., k, 2, D):
    c0 = (x0+x1)(x0-x1), c1 = 2 x0 x1 — 2 products per square."""
    x0, x1 = a[..., 0, :], a[..., 1, :]
    lhs = jnp.stack([L.add(FP, x0, x1), x0], axis=-2)  # (..., k, 2, D)
    rhs = jnp.stack([L.sub(FP, x0, x1), x1], axis=-2)
    p = L.mont_mul(FP, lhs, rhs)
    c0 = p[..., 0, :]
    c1 = p[..., 1, :]
    return jnp.stack([c0, L.add(FP, c1, c1)], axis=-2)


def cyc_sqr(a):
    """Granger-Scott squaring for elements of the cyclotomic subgroup
    (valid after the easy part of the final exponentiation): 9 Fp2
    squares = 18 Fp products in ONE stacked Montgomery multiply, vs 36
    for the generic `sqr`.  Formula validated against the oracle's
    direct squaring (eprint 2009/565 §3.2)."""
    a0 = a[..., 0, 0, :, :]
    a1 = a[..., 0, 1, :, :]
    a2 = a[..., 0, 2, :, :]
    b0 = a[..., 1, 0, :, :]
    b1 = a[..., 1, 1, :, :]
    b2 = a[..., 1, 2, :, :]
    # 9 fp2 squares: t0..t5 = [b1,a0,a2,b0,b2,a1]^2, s = [(b1+a0),(a2+b0),(b2+a1)]^2
    lo = jnp.stack([b1, a2, b2], axis=-3)
    hi = jnp.stack([a0, b0, a1], axis=-3)
    sums = L.add(FP, lo, hi)
    q = _fp2_sqr_nd(jnp.concatenate([lo, hi, sums], axis=-3))  # (..., 9, 2, D)
    tl = q[..., 0:3, :, :]  # b1^2, a2^2, b2^2
    th = q[..., 3:6, :, :]  # a0^2, b0^2, a1^2
    cross = L.sub(FP, q[..., 6:9, :, :], L.add(FP, tl, th))  # 2a0b1, 2a2b0, 2a1b2
    u = L.add(FP, _mul_by_xi_nd(tl), th)  # xi b1^2 + a0^2, xi a2^2 + b0^2, xi b2^2 + a1^2
    # c0' coords: 2(u_i - c0_i) + u_i
    c0 = jnp.stack([a0, a1, a2], axis=-3)
    d0 = L.sub(FP, u, c0)
    c0n = L.add(FP, L.add(FP, d0, d0), u)
    # c1' coords: 2(t_i + c1_i) + t_i with t = [xi*2a1b2, 2a0b1, 2a2b0]
    t = jnp.concatenate(
        [_mul_by_xi_nd(cross[..., 2:3, :, :]), cross[..., 0:2, :, :]], axis=-3
    )
    c1 = jnp.stack([b0, b1, b2], axis=-3)
    d1 = L.add(FP, t, c1)
    c1n = L.add(FP, L.add(FP, d1, d1), t)
    return jnp.stack([c0n, c1n], axis=-4)


def _cyc_sqr_scan(x, k: int):
    """k Granger-Scott squarings; a lax.scan for long runs keeps the XLA
    graph one-body-sized."""
    if k <= 0:
        return x
    if k <= 2:
        for _ in range(k):
            x = cyc_sqr(x)
        return x
    out, _ = jax.lax.scan(lambda c, _: (cyc_sqr(c), None), x, None, length=k)
    return out


def pow_abs_cyc(a, e: int):
    """a^e for a STATIC e >= 1, a in the cyclotomic subgroup.

    Exploits the static bit pattern: runs of zero bits are pure
    Granger-Scott squaring scans; only the HW(e)-1 set bits pay a dense
    multiply (vs sqr+mul+select every step in `pow_const`)."""
    assert e >= 1
    bits = bin(e)[2:]
    acc = a
    rest = bits[1:]
    pos = 0
    for o in (i for i, b in enumerate(rest) if b == "1"):
        acc = _cyc_sqr_scan(acc, o - pos + 1)
        acc = mul(acc, a)
        pos = o + 1
    return _cyc_sqr_scan(acc, len(rest) - pos)


# --- exponentiation ----------------------------------------------------------

def pow_const(a, e: int, cyclotomic: bool = False):
    """a^e for a STATIC exponent e via lax.scan square-and-multiply.

    For cyclotomic elements (post-easy-part), negative exponents use
    conjugation instead of inversion.
    """
    if e == 0:
        return jnp.broadcast_to(one(), a.shape)
    if e < 0:
        assert cyclotomic, "negative exponent requires cyclotomic input"
        a = conj(a)
        e = -e
    bits = np.array([int(c) for c in bin(e)[2:]], dtype=np.bool_)

    def step(acc, bit):
        acc = sqr(acc)
        acc_mul = mul(acc, a)
        return select(jnp.broadcast_to(bit, acc.shape[:-4]), acc_mul, acc), None

    init = a
    if len(bits) == 1:
        return init
    out, _ = jax.lax.scan(step, init, jnp.asarray(bits[1:]))
    return out
