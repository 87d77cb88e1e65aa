"""Fp2 = Fp[u]/(u^2+1) on digit planes.

An Fp2 element is a ``(..., 2, D)`` uint32 array (component axis just
before the digit axis), Montgomery form per component.  Multiplication is
Karatsuba: its three independent base-field products are stacked into ONE
batched Fp multiply so the XLA graph stays small and the vector units stay
saturated.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from . import limbs as L
from .specs import FP


def zero(shape=()) -> jax.Array:
    return jnp.zeros((*shape, 2, FP.n_digits), dtype=jnp.uint32)


def one(shape=()) -> jax.Array:
    c0 = jnp.broadcast_to(jnp.asarray(FP.one_mont, dtype=jnp.uint32), (*shape, FP.n_digits))
    return jnp.stack([c0, jnp.zeros_like(c0)], axis=-2)


def from_ints(c0: int, c1: int) -> np.ndarray:
    return np.stack([FP.from_int(c0), FP.from_int(c1)])


def to_ints(a) -> tuple[int, int]:
    a = np.asarray(a)
    return (FP.to_int(a[..., 0, :]), FP.to_int(a[..., 1, :]))


def add(a, b):
    return L.add(FP, a, b)


def sub(a, b):
    return L.sub(FP, a, b)


def neg(a):
    return L.neg(FP, a)


def conj(a):
    return jnp.stack([a[..., 0, :], L.neg(FP, a[..., 1, :])], axis=-2)


def mul(a, b):
    """Karatsuba: 3 Fp products in one batched multiply."""
    a0, a1 = a[..., 0, :], a[..., 1, :]
    b0, b1 = b[..., 0, :], b[..., 1, :]
    lhs = jnp.stack([a0, a1, L.add(FP, a0, a1)], axis=0)
    rhs = jnp.stack([b0, b1, L.add(FP, b0, b1)], axis=0)
    p = L.mont_mul(FP, lhs, rhs)
    t0, t1, t2 = p[0], p[1], p[2]
    c0 = L.sub(FP, t0, t1)
    c1 = L.sub(FP, t2, L.add(FP, t0, t1))
    return jnp.stack([c0, c1], axis=-2)


def sqr(a):
    """(a0+a1 u)^2 = (a0+a1)(a0-a1) + 2 a0 a1 u : 2 Fp products."""
    a0, a1 = a[..., 0, :], a[..., 1, :]
    lhs = jnp.stack([L.add(FP, a0, a1), a0], axis=0)
    rhs = jnp.stack([L.sub(FP, a0, a1), a1], axis=0)
    p = L.mont_mul(FP, lhs, rhs)
    c0 = p[0]
    c1 = L.add(FP, p[1], p[1])
    return jnp.stack([c0, c1], axis=-2)


def mul_by_xi(a):
    """Multiply by the sextic non-residue xi = 1 + u."""
    a0, a1 = a[..., 0, :], a[..., 1, :]
    return jnp.stack([L.sub(FP, a0, a1), L.add(FP, a0, a1)], axis=-2)


def mul_small(a, k: int):
    return L.mul_small(FP, a, k)


def mul_fp(a, s):
    """Multiply both components by an Fp element s (..., D)."""
    lhs = jnp.stack([a[..., 0, :], a[..., 1, :]], axis=0)
    rhs = jnp.stack([s, s], axis=0)
    p = L.mont_mul(FP, lhs, rhs)
    return jnp.stack([p[0], p[1]], axis=-2)


def inv(a):
    """1/(a0 + a1 u) = (a0 - a1 u)/(a0^2 + a1^2); zero -> zero."""
    a0, a1 = a[..., 0, :], a[..., 1, :]
    sq = L.mont_mul(FP, jnp.stack([a0, a1], 0), jnp.stack([a0, a1], 0))
    norm = L.add(FP, sq[0], sq[1])
    ninv = L.inv(FP, norm)
    p = L.mont_mul(FP, jnp.stack([a0, L.neg(FP, a1)], 0), jnp.stack([ninv, ninv], 0))
    return jnp.stack([p[0], p[1]], axis=-2)


def is_zero(a):
    return jnp.all(a == 0, axis=(-1, -2))


def eq(a, b):
    return jnp.all(a == b, axis=(-1, -2))
