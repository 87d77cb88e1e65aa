"""Fp6 = Fp2[v]/(v^3 - xi) on digit planes, xi = 1 + u.

An Fp6 element is a ``(..., 3, 2, D)`` uint32 array.  All base-field
products of an Fp6 multiply (6 Fp2 Karatsuba products = 18 Fp products)
are stacked into ONE batched Montgomery multiply — on TPU the win is graph
size and lane occupancy, mirroring how the reference's blst gets its win
from hand-scheduled assembly (reference tower surface: blst_fp6/blst_fp12
behind blst_miller_loop, src/bls.rs:591-596).

The *_rows/_from_rows helpers expose the raw Fp-row batching so Fp12 can
flatten its three Fp6 multiplies into a single 54-row base multiply.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from . import limbs as L
from . import fp2
from .specs import FP


def zero(shape=()) -> jax.Array:
    return jnp.zeros((*shape, 3, 2, FP.n_digits), dtype=jnp.uint32)


def one(shape=()) -> jax.Array:
    out = np.zeros((*shape, 3, 2, FP.n_digits), dtype=np.uint32)
    out[..., 0, 0, :] = FP.one_mont
    return jnp.asarray(out)


def from_ints(a) -> np.ndarray:
    """((c00,c01),(c10,c11),(c20,c21)) oracle Fp6 -> digit planes."""
    return np.stack([fp2.from_ints(*a[i]) for i in range(3)])


def to_ints(x):
    x = np.asarray(x)
    return tuple(fp2.to_ints(x[..., i, :, :]) for i in range(3))


def add(a, b):
    return L.add(FP, a, b)


def sub(a, b):
    return L.sub(FP, a, b)


def neg(a):
    return L.neg(FP, a)


def mul_by_v(a):
    """(a0, a1, a2) -> (xi*a2, a0, a1)."""
    return jnp.concatenate(
        [fp2.mul_by_xi(a[..., 2:3, :, :]), a[..., 0:2, :, :]], axis=-3
    )


# --- batched multiplication machinery ---------------------------------------
#
# An Fp6 product uses 6 Fp2 products:
#   t0 = a0 b0, t1 = a1 b1, t2 = a2 b2,
#   s0 = (a1+a2)(b1+b2), s1 = (a0+a1)(b0+b1), s2 = (a0+a2)(b0+b2)
#   c0 = t0 + xi (s0 - t1 - t2)
#   c1 = s1 - t0 - t1 + xi t2
#   c2 = s2 - t0 - t2 + t1
# Each Fp2 product is 3 Fp rows (Karatsuba).  `mul_rows` emits the 18 Fp row
# pairs; `mul_from_rows` consumes the 18 products.


def _fp2_rows(a, b):
    """Fp2 pair -> 3 (lhs, rhs) Fp rows (Karatsuba)."""
    a0, a1 = a[..., 0, :], a[..., 1, :]
    b0, b1 = b[..., 0, :], b[..., 1, :]
    return [a0, a1, L.add(FP, a0, a1)], [b0, b1, L.add(FP, b0, b1)]


def _fp2_from_rows(p0, p1, p2):
    c0 = L.sub(FP, p0, p1)
    c1 = L.sub(FP, p2, L.add(FP, p0, p1))
    return jnp.stack([c0, c1], axis=-2)


def mul_rows(a, b):
    """Emit the 18 Fp row pairs of an Fp6 product."""
    a0, a1, a2 = a[..., 0, :, :], a[..., 1, :, :], a[..., 2, :, :]
    b0, b1, b2 = b[..., 0, :, :], b[..., 1, :, :], b[..., 2, :, :]
    pairs = [
        (a0, b0),
        (a1, b1),
        (a2, b2),
        (fp2.add(a1, a2), fp2.add(b1, b2)),
        (fp2.add(a0, a1), fp2.add(b0, b1)),
        (fp2.add(a0, a2), fp2.add(b0, b2)),
    ]
    lhs, rhs = [], []
    for x, y in pairs:
        l, r = _fp2_rows(x, y)
        lhs += l
        rhs += r
    return lhs, rhs


def mul_from_rows(p):
    """Consume 18 Fp products (list) -> Fp6 result."""
    t = [_fp2_from_rows(p[3 * i], p[3 * i + 1], p[3 * i + 2]) for i in range(6)]
    t0, t1, t2, s0, s1, s2 = t
    c0 = fp2.add(t0, fp2.mul_by_xi(fp2.sub(s0, fp2.add(t1, t2))))
    c1 = fp2.add(fp2.sub(s1, fp2.add(t0, t1)), fp2.mul_by_xi(t2))
    c2 = fp2.add(fp2.sub(s2, fp2.add(t0, t2)), t1)
    return jnp.stack([c0, c1, c2], axis=-3)


def mul(a, b):
    lhs, rhs = mul_rows(a, b)
    p = L.mont_mul(FP, jnp.stack(lhs, 0), jnp.stack(rhs, 0))
    return mul_from_rows([p[i] for i in range(18)])


def sqr(a):
    return mul(a, a)


def inv(a):
    """Fp6 inversion via the adjoint formula (zero -> zero)."""
    a0, a1, a2 = a[..., 0, :, :], a[..., 1, :, :], a[..., 2, :, :]
    # c0 = a0^2 - xi a1 a2 ; c1 = xi a2^2 - a0 a1 ; c2 = a1^2 - a0 a2
    prods = _fp2_mul_many(
        [(a0, a0), (a1, a2), (a2, a2), (a0, a1), (a1, a1), (a0, a2)]
    )
    c0 = fp2.sub(prods[0], fp2.mul_by_xi(prods[1]))
    c1 = fp2.sub(fp2.mul_by_xi(prods[2]), prods[3])
    c2 = fp2.sub(prods[4], prods[5])
    inner = _fp2_mul_many([(a2, c1), (a1, c2), (a0, c0)])
    t = fp2.add(fp2.mul_by_xi(fp2.add(inner[0], inner[1])), inner[2])
    tinv = fp2.inv(t)
    outs = _fp2_mul_many([(c0, tinv), (c1, tinv), (c2, tinv)])
    return jnp.stack(outs, axis=-3)


def _fp2_mul_many(pairs):
    """Stacked Fp2 products: ~7 carry chains total regardless of count."""
    import jax.numpy as _jnp

    shapes = [_jnp.broadcast_shapes(a.shape, b.shape) for a, b in pairs]
    A = _jnp.stack([_jnp.broadcast_to(a, s) for (a, _), s in zip(pairs, shapes)], 0)
    B = _jnp.stack([_jnp.broadcast_to(b, s) for (_, b), s in zip(pairs, shapes)], 0)
    out = fp2.mul(A, B)
    return [out[i] for i in range(len(pairs))]


def is_zero(a):
    return jnp.all(a == 0, axis=(-1, -2, -3))


def eq(a, b):
    return jnp.all(a == b, axis=(-1, -2, -3))
