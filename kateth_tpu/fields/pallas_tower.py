"""In-kernel Fp2/Fp6/Fp12 tower on digit lists (for Pallas TPU kernels).

The Miller loop and final-exponentiation chains are latency-bound: as XLA
scans they pay per-step op-launch + HBM round trips for every stacked
field multiply (the round-1 bench spent most of its verify time there).
These helpers let the WHOLE pairing chain run inside one Pallas kernel:
values live in vector registers as digit lists ((lanes,) vectors per
16-bit digit, see pallas_mont.FieldVec), and every independent group of
base-field products is stacked into ONE shared multiply codeblock over a
(rows, lanes) array — keeping the Mosaic instruction count per kernel
body at ~10 multiply blocks instead of ~200.

Bit-exactness: every op returns the canonical (< p) Montgomery digit
vector, so any mathematically-equal formula produces identical bits; the
formulas here mirror fields/fp2.py / fp6.py / fp12.py and oracle.field.

Replaces (with fields/pallas_mont.py) the blst fp2/fp6/fp12 surface
behind blst_miller_loop / blst_final_exp (reference src/bls.rs:591-596).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from .pallas_mont import FieldVec

# ---------------------------------------------------------------------------
# digit-list stacking helpers
# ---------------------------------------------------------------------------
#
# A "digit list" is a list of D arrays (one per 16-bit digit), each with an
# identical shape — usually (L,) lane vectors, or (k, L) for k stacked
# elements sharing one codeblock.


def dstack(items):
    """k digit lists -> one digit list of (k, ...) arrays."""
    D = len(items[0])
    return [jnp.stack([it[i] for it in items], axis=0) for i in range(D)]


def dunstack(x):
    """Digit list of (k, ...) arrays -> list of k digit lists."""
    k = x[0].shape[0]
    return [[d[j] for d in x] for j in range(k)]


def dconst(digits, like):
    """Host ints/np digits -> broadcast constant digit list."""
    return [jnp.full_like(like, np.uint32(int(d))) for d in digits]


class Fp2Vec:
    """Fp2 = Fp[u]/(u^2+1) on digit lists; xi = 1 + u.

    An element is a pair (c0, c1) of digit lists.  All products funnel
    through `mul_many`/`sqr_many` so each call is one codeblock.
    """

    def __init__(self, F: FieldVec):
        self.F = F

    # -- linear ops (per-component chains) --------------------------------

    def add(self, a, b):
        F = self.F
        return (F.add(a[0], b[0]), F.add(a[1], b[1]))

    def sub(self, a, b):
        F = self.F
        return (F.sub(a[0], b[0]), F.sub(a[1], b[1]))

    def neg(self, a):
        F = self.F
        zero = [jnp.zeros_like(d) for d in a[0]]
        return (F.sub(zero, a[0]), F.sub(zero, a[1]))

    def conj(self, a):
        F = self.F
        zero = [jnp.zeros_like(d) for d in a[1]]
        return (a[0], F.sub(zero, a[1]))

    def mul_by_xi(self, a):
        """(1+u)(c0 + c1 u) = (c0 - c1) + (c0 + c1) u."""
        F = self.F
        return (F.sub(a[0], a[1]), F.add(a[0], a[1]))

    def dbl(self, a):
        F = self.F
        return (F.add(a[0], a[0]), F.add(a[1], a[1]))

    def mul_small(self, a, k: int):
        """k*a for tiny static k via double-and-add chains."""
        bits = bin(k)[2:]
        acc = a
        for b in bits[1:]:
            acc = self.dbl(acc)
            if b == "1":
                acc = self.add(acc, a)
        return acc

    def select(self, mask, a, b):
        F = self.F
        return (F.select(mask, a[0], b[0]), F.select(mask, a[1], b[1]))

    def zero_like(self, a):
        return tuple([jnp.zeros_like(d) for d in c] for c in a)

    # -- products ---------------------------------------------------------

    def mul_many(self, pairs):
        """[(a, b), ...] -> products; ONE base-field multiply codeblock
        (3 Karatsuba rows per product)."""
        F = self.F
        rows_a, rows_b = [], []
        for a, b in pairs:
            rows_a += [a[0], a[1], F.add(a[0], a[1])]
            rows_b += [b[0], b[1], F.add(b[0], b[1])]
        P = dunstack(F.mul(dstack(rows_a), dstack(rows_b)))
        out = []
        for j in range(len(pairs)):
            p0, p1, p2 = P[3 * j], P[3 * j + 1], P[3 * j + 2]
            out.append((F.sub(p0, p1), F.sub(p2, F.add(p0, p1))))
        return out

    def sqr_many(self, xs):
        """[a, ...] -> squares; 2 rows per square:
        c0 = (x0+x1)(x0-x1), c1 = 2 x0 x1."""
        F = self.F
        rows_a, rows_b = [], []
        for x in xs:
            rows_a += [F.add(x[0], x[1]), x[0]]
            rows_b += [F.sub(x[0], x[1]), x[1]]
        P = dunstack(F.mul(dstack(rows_a), dstack(rows_b)))
        out = []
        for j in range(len(xs)):
            c0, c1 = P[2 * j], P[2 * j + 1]
            out.append((c0, F.add(c1, c1)))
        return out

    def scale_fp_many(self, items):
        """[(a, s), ...] with s a plain Fp digit list: component-wise
        products (2 rows each), one codeblock."""
        F = self.F
        rows_a, rows_b = [], []
        for a, s in items:
            rows_a += [a[0], a[1]]
            rows_b += [s, s]
        P = dunstack(F.mul(dstack(rows_a), dstack(rows_b)))
        return [(P[2 * j], P[2 * j + 1]) for j in range(len(items))]


# ---------------------------------------------------------------------------
# Fp6 / Fp12 on (Fp2Vec) digit lists
# ---------------------------------------------------------------------------
#
# Fp6 element: (a0, a1, a2) Fp2 tuple (coeffs of 1, v, v^2), v^3 = xi.
# Fp12 element: (c0, c1) Fp6 tuple (coeffs of 1, w), w^2 = v.
# Mirrors fields/fp6.py / fp12.py coordinate conventions exactly.


def fp6_add(F2, a, b):
    return tuple(F2.add(x, y) for x, y in zip(a, b))


def fp6_sub(F2, a, b):
    return tuple(F2.sub(x, y) for x, y in zip(a, b))


def fp6_neg(F2, a):
    return tuple(F2.neg(x) for x in a)


def fp6_mul_by_v(F2, a):
    return (F2.mul_by_xi(a[2]), a[0], a[1])


def _fp6_mul_pairs(F2, x, y):
    """The 6 Fp2 multiplicand pairs of one Karatsuba Fp6 product."""
    return [
        (x[0], y[0]),
        (x[1], y[1]),
        (x[2], y[2]),
        (F2.add(x[1], x[2]), F2.add(y[1], y[2])),
        (F2.add(x[0], x[1]), F2.add(y[0], y[1])),
        (F2.add(x[0], x[2]), F2.add(y[0], y[2])),
    ]


def _fp6_mul_combine(F2, p):
    """Recombine the 6 products [t0,t1,t2,s0,s1,s2] into an Fp6 result."""
    t0, t1, t2, s0, s1, s2 = p
    v0 = F2.sub(s0, F2.add(t1, t2))
    v1 = F2.sub(s1, F2.add(t0, t1))
    v2 = F2.sub(s2, F2.add(t0, t2))
    c0 = F2.add(t0, F2.mul_by_xi(v0))
    c1 = F2.add(v1, F2.mul_by_xi(t2))
    c2 = F2.add(v2, t1)
    return (c0, c1, c2)


def fp12_mul(F2, a, b):
    """Dense Fp12 multiply: 18 Fp2 products in ONE codeblock."""
    a0, a1 = a
    b0, b1 = b
    a01 = fp6_add(F2, a0, a1)
    b01 = fp6_add(F2, b0, b1)
    pairs = (
        _fp6_mul_pairs(F2, a0, b0)
        + _fp6_mul_pairs(F2, a1, b1)
        + _fp6_mul_pairs(F2, a01, b01)
    )
    P = F2.mul_many(pairs)
    t0 = _fp6_mul_combine(F2, P[0:6])
    t1 = _fp6_mul_combine(F2, P[6:12])
    s = _fp6_mul_combine(F2, P[12:18])
    c0 = fp6_add(F2, t0, fp6_mul_by_v(F2, t1))
    c1 = fp6_sub(F2, s, fp6_add(F2, t0, t1))
    return (c0, c1)


def fp12_sqr(F2, a):
    """Complex squaring: t = a0 a1; c0 = (a0+a1)(a0+v a1) - t - vt; c1 = 2t.
    12 Fp2 products in one codeblock."""
    a0, a1 = a
    lhs = fp6_add(F2, a0, a1)
    rhs = fp6_add(F2, a0, fp6_mul_by_v(F2, a1))
    pairs = _fp6_mul_pairs(F2, a0, a1) + _fp6_mul_pairs(F2, lhs, rhs)
    P = F2.mul_many(pairs)
    t = _fp6_mul_combine(F2, P[0:6])
    s = _fp6_mul_combine(F2, P[6:12])
    c0 = fp6_sub(F2, s, fp6_add(F2, t, fp6_mul_by_v(F2, t)))
    c1 = fp6_add(F2, t, t)
    return (c0, c1)


def fp12_conj(F2, a):
    return (a[0], fp6_neg(F2, a[1]))


def fp12_select(F2, mask, a, b):
    return tuple(
        tuple(F2.select(mask, x, y) for x, y in zip(ca, cb))
        for ca, cb in zip(a, b)
    )


def fp12_cyc_sqr(F2, a):
    """Granger-Scott cyclotomic squaring (eprint 2009/565 §3.2): 9 Fp2
    squares = 18 rows in one codeblock.  Mirrors fields/fp12.cyc_sqr."""
    (a0, a1, a2), (b0, b1, b2) = a
    sums = [F2.add(b1, a0), F2.add(a2, b0), F2.add(b2, a1)]
    sq = F2.sqr_many([b1, a2, b2, a0, b0, a1] + sums)
    tl = sq[0:3]  # b1^2, a2^2, b2^2
    th = sq[3:6]  # a0^2, b0^2, a1^2
    cross = [F2.sub(s, F2.add(l, h)) for s, l, h in zip(sq[6:9], tl, th)]
    u = [F2.add(F2.mul_by_xi(l), h) for l, h in zip(tl, th)]
    c0n = []
    for ui, ci in zip(u, (a0, a1, a2)):
        d = F2.sub(ui, ci)
        c0n.append(F2.add(F2.add(d, d), ui))
    t = [F2.mul_by_xi(cross[2]), cross[0], cross[1]]
    c1n = []
    for ti, ci in zip(t, (b0, b1, b2)):
        d = F2.add(ti, ci)
        c1n.append(F2.add(F2.add(d, d), ti))
    return (tuple(c0n), tuple(c1n))


def fp12_frob(F2, a, gammas):
    """x -> x^p: per-coordinate Fp2 conjugation then gamma twists.

    gammas: compile-time (5, 2, D) uint16-digit table (fp12._GAMMA);
    coordinate j of (c0.1, c0.2, c1.0, c1.1, c1.2) multiplies gamma
    [1, 3, 0, 2, 4] respectively (mirrors fields/fp12.frob)."""
    (a0, a1, a2), (b0, b1, b2) = a
    like = a0[0][0]
    coords = [F2.conj(x) for x in (a0, a1, a2, b0, b1, b2)]
    gidx = [None, 1, 3, 0, 2, 4]
    pairs = []
    for j in range(1, 6):
        g = gammas[gidx[j]]
        gc = (dconst(g[0], like), dconst(g[1], like))
        pairs.append((coords[j], gc))
    out = F2.mul_many(pairs)
    return ((coords[0], out[0], out[1]), (out[2], out[3], out[4]))
