"""Pure-Python oracle for BLS12-381 curve groups G1 and G2.

Independent from-scratch implementation of the group layer mirrored from the
reference's observable behavior (reference: src/bls.rs impl_group! macro,
bls.rs:362-570): add, neg, scalar mul, naive/pippenger linear combination,
and the Zcash compressed serialization format with on-curve + subgroup
checks on decompression.

Points are represented as Jacobian triples (X, Y, Z) with affine
x = X/Z^2, y = Y/Z^3; infinity is Z == 0 (canonically (1, 1, 0)).
Field elements are plain ints for G1 and Fp2 pairs for G2.
"""

from __future__ import annotations

from .field import (
    P,
    R,
    H1,
    FP2_ZERO,
    fp_inv,
    fp_sqrt,
    fp2_add,
    fp2_conj,
    fp2_inv,
    fp2_is_zero,
    fp2_mul,
    fp2_neg,
    fp2_scalar,
    fp2_sqr,
    fp2_sqrt,
    fp2_sub,
)

# --- generic Jacobian arithmetic, parameterized by the field ---------------


class _FieldOps:
    """Field operation table so G1 (Fp) and G2 (Fp2) share one curve impl."""

    __slots__ = ("add", "sub", "neg", "mul", "sqr", "inv", "scalar", "is_zero", "zero", "one", "b")

    def __init__(self, add, sub, neg, mul, sqr, inv, scalar, is_zero, zero, one, b):
        self.add = add
        self.sub = sub
        self.neg = neg
        self.mul = mul
        self.sqr = sqr
        self.inv = inv
        self.scalar = scalar
        self.is_zero = is_zero
        self.zero = zero
        self.one = one
        self.b = b  # curve coefficient: y^2 = x^3 + b


FP_OPS = _FieldOps(
    add=lambda a, b: (a + b) % P,
    sub=lambda a, b: (a - b) % P,
    neg=lambda a: -a % P,
    mul=lambda a, b: a * b % P,
    sqr=lambda a: a * a % P,
    inv=fp_inv,
    scalar=lambda a, k: a * k % P,
    is_zero=lambda a: a % P == 0,
    zero=0,
    one=1,
    b=4,
)

FP2_OPS = _FieldOps(
    add=fp2_add,
    sub=fp2_sub,
    neg=fp2_neg,
    mul=fp2_mul,
    sqr=fp2_sqr,
    inv=fp2_inv,
    scalar=fp2_scalar,
    is_zero=fp2_is_zero,
    zero=FP2_ZERO,
    one=(1, 0),
    b=(4, 4),  # 4 * (1 + u)
)


def jac_infinity(F: _FieldOps):
    return (F.one, F.one, F.zero)


def jac_is_infinity(F: _FieldOps, p) -> bool:
    return F.is_zero(p[2])


def jac_double(F: _FieldOps, p):
    X, Y, Z = p
    if F.is_zero(Z) or F.is_zero(Y):
        return jac_infinity(F)
    A = F.sqr(X)
    B = F.sqr(Y)
    C = F.sqr(B)
    D = F.scalar(F.sub(F.sqr(F.add(X, B)), F.add(A, C)), 2)
    E = F.scalar(A, 3)
    Fv = F.sqr(E)
    X3 = F.sub(Fv, F.scalar(D, 2))
    Y3 = F.sub(F.mul(E, F.sub(D, X3)), F.scalar(C, 8))
    Z3 = F.scalar(F.mul(Y, Z), 2)
    return (X3, Y3, Z3)


def jac_add(F: _FieldOps, p, q):
    if jac_is_infinity(F, p):
        return q
    if jac_is_infinity(F, q):
        return p
    X1, Y1, Z1 = p
    X2, Y2, Z2 = q
    Z1Z1 = F.sqr(Z1)
    Z2Z2 = F.sqr(Z2)
    U1 = F.mul(X1, Z2Z2)
    U2 = F.mul(X2, Z1Z1)
    S1 = F.mul(F.mul(Y1, Z2), Z2Z2)
    S2 = F.mul(F.mul(Y2, Z1), Z1Z1)
    if U1 == U2:
        if S1 == S2:
            return jac_double(F, p)
        return jac_infinity(F)
    H = F.sub(U2, U1)
    I = F.sqr(F.scalar(H, 2))
    J = F.mul(H, I)
    rr = F.scalar(F.sub(S2, S1), 2)
    V = F.mul(U1, I)
    X3 = F.sub(F.sub(F.sqr(rr), J), F.scalar(V, 2))
    Y3 = F.sub(F.mul(rr, F.sub(V, X3)), F.scalar(F.mul(S1, J), 2))
    Z3 = F.mul(F.mul(F.scalar(F.mul(Z1, Z2), 2), H), F.one)
    return (X3, Y3, Z3)


def jac_neg(F: _FieldOps, p):
    return (p[0], F.neg(p[1]), p[2])


def jac_mul_raw(F: _FieldOps, p, k: int):
    """Scalar multiplication WITHOUT reducing k mod r (needed for order
    checks, where k == r must actually walk the chain)."""
    if k == 0 or jac_is_infinity(F, p):
        return jac_infinity(F)
    out = jac_infinity(F)
    for bit in bin(k)[2:]:
        out = jac_double(F, out)
        if bit == "1":
            out = jac_add(F, out, p)
    return out


def jac_mul(F: _FieldOps, p, k: int):
    """Scalar multiplication (double-and-add, MSB first); k taken mod r."""
    return jac_mul_raw(F, p, k % R)


def jac_to_affine(F: _FieldOps, p):
    """Returns (x, y) or None for infinity."""
    X, Y, Z = p
    if F.is_zero(Z):
        return None
    zinv = F.inv(Z)
    zinv2 = F.sqr(zinv)
    return (F.mul(X, zinv2), F.mul(Y, F.mul(zinv, zinv2)))


def jac_from_affine(F: _FieldOps, aff):
    if aff is None:
        return jac_infinity(F)
    return (aff[0], aff[1], F.one)


def jac_eq(F: _FieldOps, p, q) -> bool:
    pi, qi = jac_is_infinity(F, p), jac_is_infinity(F, q)
    if pi or qi:
        return pi and qi
    Z1Z1 = F.sqr(p[2])
    Z2Z2 = F.sqr(q[2])
    if F.mul(p[0], Z2Z2) != F.mul(q[0], Z1Z1):
        return False
    return F.mul(F.mul(p[1], q[2]), Z2Z2) == F.mul(F.mul(q[1], p[2]), Z1Z1)


def jac_on_curve(F: _FieldOps, p) -> bool:
    if jac_is_infinity(F, p):
        return True
    X, Y, Z = p
    # Y^2 = X^3 + b Z^6
    lhs = F.sqr(Y)
    rhs = F.add(F.mul(F.sqr(X), X), F.mul(F.b, F.sqr(F.mul(F.sqr(Z), Z))))
    return lhs == rhs


# --- generators ------------------------------------------------------------

G1_GENERATOR_X = 0x17F1D3A73197D7942695638C4FA9AC0FC3688C4F9774B905A14E3A3F171BAC586C55E83FF97A1AEFFB3AF00ADB22C6BB
G1_GENERATOR_Y = 0x08B3F481E3AAA0F1A09E30ED741D8AE4FCF5E095D5D00AF600DB18CB2C04B3EDD03CC744A2888AE40CAA232946C5E7E1

G2_GENERATOR_X = (
    0x024AA2B2F08F0A91260805272DC51051C6E47AD4FA403B02B4510B647AE3D1770BAC0326A805BBEFD48056C8C121BDB8,
    0x13E02B6052719F607DACD3A088274F65596BD0D09920B61AB5DA61BBDC7F5049334CF11213945D57E5AC7D055D042B7E,
)
G2_GENERATOR_Y = (
    0x0CE5D527727D6E118CC9CDC6DA2E351AADFD9BAA8CBDD3A76D429A695160D12C923AC9CC3BACA289E193548608B82801,
    0x0606C4A02EA734CC32ACD2B02BC28B99CB3E287E85A763AF267492AB572E99AB3F370D275CEC1DA1AAA9075FF05F79BE,
)

G1_GEN = (G1_GENERATOR_X, G1_GENERATOR_Y, 1)
G2_GEN = (G2_GENERATOR_X, G2_GENERATOR_Y, (1, 0))


# --- serialization (Zcash compressed format) -------------------------------
#
# Flag bits in the most significant byte: 0x80 compressed, 0x40 infinity,
# 0x20 y-sign (set if y is the lexicographically larger of y, -y).
# Reference behavior anchor: bls.rs:505-531 (Decompress), 491-503 (Compress).


class DecompressError(Exception):
    pass


class BadEncoding(DecompressError):
    """Maps to reference ECGroupError::InvalidEncoding."""


class NotOnCurve(DecompressError):
    """Maps to reference ECGroupError::NotOnCurve."""


class NotInGroup(DecompressError):
    """Maps to reference ECGroupError::NotInGroup."""


def _fp_is_larger(y: int) -> bool:
    return y > P - y


def _fp2_is_larger(y) -> bool:
    ny = fp2_neg(y)
    if y[1] != ny[1]:
        return y[1] > ny[1]
    return y[0] > ny[0]


def g1_compress(p) -> bytes:
    aff = jac_to_affine(FP_OPS, p)
    if aff is None:
        return bytes([0xC0] + [0] * 47)
    x, y = aff
    out = bytearray(x.to_bytes(48, "big"))
    out[0] |= 0x80
    if _fp_is_larger(y):
        out[0] |= 0x20
    return bytes(out)


def g1_decompress(b: bytes, subgroup_check: bool = True):
    if len(b) != 48:
        raise BadEncoding("bad length")
    flags = b[0]
    if not flags & 0x80:
        raise BadEncoding("uncompressed bit")
    infinity = bool(flags & 0x40)
    sign = bool(flags & 0x20)
    x = int.from_bytes(bytes([flags & 0x1F]) + b[1:], "big")
    if infinity:
        if sign or x != 0:
            raise BadEncoding("nonzero infinity encoding")
        return jac_infinity(FP_OPS)
    if x >= P:
        raise BadEncoding("x >= p")
    y2 = (x * x % P * x + 4) % P
    y = fp_sqrt(y2)
    if y is None:
        raise NotOnCurve("x not on curve")
    if _fp_is_larger(y) != sign:
        y = P - y
    pt = (x, y, 1)
    if subgroup_check and not g1_in_subgroup(pt):
        raise NotInGroup("not in G1")
    return pt


def g2_compress(p) -> bytes:
    aff = jac_to_affine(FP2_OPS, p)
    if aff is None:
        return bytes([0xC0] + [0] * 95)
    (x0, x1), y = aff
    out = bytearray(x1.to_bytes(48, "big") + x0.to_bytes(48, "big"))
    out[0] |= 0x80
    if _fp2_is_larger(y):
        out[0] |= 0x20
    return bytes(out)


def g2_decompress(b: bytes, subgroup_check: bool = True):
    if len(b) != 96:
        raise BadEncoding("bad length")
    flags = b[0]
    if not flags & 0x80:
        raise BadEncoding("uncompressed bit")
    infinity = bool(flags & 0x40)
    sign = bool(flags & 0x20)
    x1 = int.from_bytes(bytes([flags & 0x1F]) + b[1:48], "big")
    x0 = int.from_bytes(b[48:], "big")
    if infinity:
        if sign or x0 != 0 or x1 != 0:
            raise BadEncoding("nonzero infinity encoding")
        return jac_infinity(FP2_OPS)
    if x0 >= P or x1 >= P:
        raise BadEncoding("x >= p")
    x = (x0, x1)
    y2 = fp2_add(fp2_mul(fp2_sqr(x), x), FP2_OPS.b)
    y = fp2_sqrt(y2)
    if y is None:
        raise NotOnCurve("x not on curve")
    if _fp2_is_larger(y) != sign:
        y = fp2_neg(y)
    pt = (x, y, (1, 0))
    if subgroup_check and not g2_in_subgroup(pt):
        raise NotInGroup("not in G2")
    return pt


# --- subgroup checks -------------------------------------------------------

def g1_in_subgroup(p) -> bool:
    """Order check: r*P == infinity (slow but unambiguous)."""
    if not jac_on_curve(FP_OPS, p):
        return False
    return jac_is_infinity(FP_OPS, jac_mul_raw(FP_OPS, p, R))


def g2_in_subgroup(p) -> bool:
    if not jac_on_curve(FP2_OPS, p):
        return False
    return jac_is_infinity(FP2_OPS, jac_mul_raw(FP2_OPS, p, R))


# --- convenience: concrete-group wrappers ----------------------------------

def g1_add(p, q):
    return jac_add(FP_OPS, p, q)


def g1_double(p):
    return jac_double(FP_OPS, p)


def g1_neg(p):
    return jac_neg(FP_OPS, p)


def g1_mul(p, k: int):
    return jac_mul(FP_OPS, p, k)


def g1_eq(p, q):
    return jac_eq(FP_OPS, p, q)


def g1_infinity():
    return jac_infinity(FP_OPS)


def g1_is_infinity(p):
    return jac_is_infinity(FP_OPS, p)


def g1_to_affine(p):
    return jac_to_affine(FP_OPS, p)


def g2_add(p, q):
    return jac_add(FP2_OPS, p, q)


def g2_neg(p):
    return jac_neg(FP2_OPS, p)


def g2_mul(p, k: int):
    return jac_mul(FP2_OPS, p, k)


def g2_eq(p, q):
    return jac_eq(FP2_OPS, p, q)


def g2_infinity():
    return jac_infinity(FP2_OPS)


def g2_is_infinity(p):
    return jac_is_infinity(FP2_OPS, p)


def g2_to_affine(p):
    return jac_to_affine(FP2_OPS, p)


def g1_lincomb(points, scalars):
    """Naive linear combination (reference P1::lincomb, bls.rs:406-413)."""
    acc = g1_infinity()
    for pt, s in zip(points, scalars):
        acc = g1_add(acc, g1_mul(pt, s))
    return acc


def g1_msm(points, scalars, window: int = 8):
    """Pippenger bucket MSM over Jacobian points (oracle-speed).

    Mirrors the semantics of reference P1::lincomb_pippenger
    (bls.rs:415-437); algorithm is an independent textbook Pippenger.
    """
    n = min(len(points), len(scalars))
    if n == 0:
        return g1_infinity()
    nwin = (255 + window - 1) // window
    mask = (1 << window) - 1
    acc = g1_infinity()
    for w in range(nwin - 1, -1, -1):
        if not g1_is_infinity(acc):
            for _ in range(window):
                acc = g1_double(acc)
        buckets = [None] * (mask + 1)
        shift = w * window
        for i in range(n):
            d = (scalars[i] >> shift) & mask
            if d == 0:
                continue
            buckets[d] = points[i] if buckets[d] is None else g1_add(buckets[d], points[i])
        running = g1_infinity()
        window_sum = g1_infinity()
        for d in range(mask, 0, -1):
            if buckets[d] is not None:
                running = g1_add(running, buckets[d])
            window_sum = g1_add(window_sum, running)
        acc = g1_add(acc, window_sum)
    return acc
