"""Fp12 = Fp6[w]/(w^2 - v) on digit planes.

An Fp12 element is a ``(..., 2, 3, 2, D)`` uint32 array.  A full Fp12
multiply is 3 Fp6 multiplies = 54 base-field products, flattened into ONE
stacked Montgomery multiply; a squaring uses the complex-squaring identity
(2 Fp6-equivalents = 36 rows).  Frobenius uses precomputed gamma constants
(device-resident, Montgomery form).

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
    """a0 - a1 w (== Frobenius^6; inverse on the cyclotomic subgroup)."""
    return jnp.stack([a[..., 0, :, :, :], fp6.neg(a[..., 1, :, :, :])], axis=-4)


def mul(a, b):
    """3 Fp6 products (Karatsuba) in one 54-row base multiply."""
    a0, a1 = a[..., 0, :, :, :], a[..., 1, :, :, :]
    b0, b1 = b[..., 0, :, :, :], b[..., 1, :, :, :]
    lhs, rhs = [], []
    for x, y in [(a0, b0), (a1, b1), (fp6.add(a0, a1), fp6.add(b0, b1))]:
        l, r = fp6.mul_rows(x, y)
        lhs += l
        rhs += r
    p = L.mont_mul(FP, jnp.stack(lhs, 0), jnp.stack(rhs, 0))
    t0 = fp6.mul_from_rows([p[i] for i in range(18)])
    t1 = fp6.mul_from_rows([p[i] for i in range(18, 36)])
    s = fp6.mul_from_rows([p[i] for i in range(36, 54)])
    c0 = fp6.add(t0, fp6.mul_by_v(t1))
    c1 = fp6.sub(s, fp6.add(t0, t1))
    return jnp.stack([c0, c1], axis=-4)


def sqr(a):
    """Complex squaring: c0 = (a0+a1)(a0+v a1) - t - v t, c1 = 2t, t = a0 a1."""
    a0, a1 = a[..., 0, :, :, :], a[..., 1, :, :, :]
    lhs, rhs = [], []
    for x, y in [(a0, a1), (fp6.add(a0, a1), fp6.add(a0, fp6.mul_by_v(a1)))]:
        l, r = fp6.mul_rows(x, y)
        lhs += l
        rhs += r
    p = L.mont_mul(FP, jnp.stack(lhs, 0), jnp.stack(rhs, 0))
    t = fp6.mul_from_rows([p[i] for i in range(18)])
    s = fp6.mul_from_rows([p[i] for i in range(18, 36)])
    c0 = fp6.sub(s, fp6.add(t, fp6.mul_by_v(t)))
    c1 = fp6.add(t, t)
    return jnp.stack([c0, c1], axis=-4)


def inv(a):
    """1/(a0 + a1 w) = (a0 - a1 w) / (a0^2 - v a1^2); zero -> zero."""
    a0, a1 = a[..., 0, :, :, :], a[..., 1, :, :, :]
    lhs, rhs = [], []
    for x, y in [(a0, a0), (a1, a1)]:
        l, r = fp6.mul_rows(x, y)
        lhs += l
        rhs += r
    p = L.mont_mul(FP, jnp.stack(lhs, 0), jnp.stack(rhs, 0))
    s0 = fp6.mul_from_rows([p[i] for i in range(18)])
    s1 = fp6.mul_from_rows([p[i] for i in range(18, 36)])
    t = fp6.sub(s0, fp6.mul_by_v(s1))
    tinv = fp6.inv(t)
    lhs, rhs = [], []
    for x in (a0, fp6.neg(a1)):
        l, r = fp6.mul_rows(x, tinv)
        lhs += l
        rhs += r
    p = L.mont_mul(FP, jnp.stack(lhs, 0), jnp.stack(rhs, 0))
    c0 = fp6.mul_from_rows([p[i] for i in range(18)])
    c1 = fp6.mul_from_rows([p[i] for i in range(18, 36)])
    return jnp.stack([c0, c1], axis=-4)


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
    """x -> x^p.  Component-wise Fp2 conjugation then gamma twists
    (oracle reference: fp12_frob, kateth_tpu/oracle/field.py)."""
    g = jnp.asarray(_GAMMA)
    c = jnp.stack([a[..., :, :, 0, :], L.neg(FP, a[..., :, :, 1, :])], axis=-2)
    # rows: (b0c0, b0c1*g1, b0c2*g3, b1c0*g0, b1c1*g2, b1c2*g4)
    b0c0 = c[..., 0, 0, :, :]
    pairs = [
        (c[..., 0, 1, :, :], g[1]),
        (c[..., 0, 2, :, :], g[3]),
        (c[..., 1, 0, :, :], g[0]),
        (c[..., 1, 1, :, :], g[2]),
        (c[..., 1, 2, :, :], g[4]),
    ]
    prods = fp6._fp2_mul_many([(x, jnp.broadcast_to(y, x.shape)) for x, y in pairs])
    b0 = jnp.stack([b0c0, prods[0], prods[1]], axis=-3)
    b1 = jnp.stack([prods[2], prods[3], prods[4]], axis=-3)
    return jnp.stack([b0, b1], axis=-4)


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
