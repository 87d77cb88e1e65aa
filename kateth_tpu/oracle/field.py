"""Pure-Python big-int oracle for BLS12-381 field arithmetic.

This module is the *reference semantics* for every device kernel in the
library: slow, obviously-correct, arbitrary-precision implementations of
Fr, Fp and the Fp2/Fp6/Fp12 tower.  Mirrors the externally observable
behavior of the reference library's field layer (reference: src/bls.rs,
which delegates to blst), but is an independent from-scratch
implementation.

Tower construction (standard for BLS12-381, compatible with blst):
    Fp2  = Fp[u]  / (u^2 + 1)
    Fp6  = Fp2[v] / (v^3 - (u + 1))
    Fp12 = Fp6[w] / (w^2 - v)

Representation conventions:
    Fp   -> int in [0, P)
    Fp2  -> (c0, c1)                      meaning c0 + c1*u
    Fp6  -> (a0, a1, a2) of Fp2           meaning a0 + a1*v + a2*v^2
    Fp12 -> (b0, b1) of Fp6               meaning b0 + b1*w
"""

from __future__ import annotations

# ---------------------------------------------------------------------------
# Curve constants (BLS12-381)
# ---------------------------------------------------------------------------

#: Base field modulus.
P = 0x1A0111EA397FE69A4B1BA7B6434BACD764774B84F38512BF6730D2A0F6B0F6241EABFFFEB153FFFFB9FEFFFFFFFFAAAB

#: Scalar field modulus (curve order).
R = 0x73EDA753299D7D483339D80809A1D80553BDA402FFFE5BFEFFFFFFFF00000001

#: BLS parameter x (negative); r = x^4 - x^2 + 1, p = (x-1)^2/3 * r + x.
BLS_X = -0xD201000000010000

#: G1 cofactor h1 = (x-1)^2 / 3.
H1 = (BLS_X - 1) ** 2 // 3

FR_BYTES = 32
FP_BYTES = 48


def _check_params() -> None:
    x = BLS_X
    assert R == x**4 - x**2 + 1, "r != x^4 - x^2 + 1"
    assert P == (x - 1) ** 2 * R // 3 + x, "p inconsistent with x and r"
    assert P % 4 == 3, "sqrt via x^((p+1)/4) requires p = 3 mod 4"
    assert (R - 1) % (1 << 32) == 0, "r-1 must have 2-adicity >= 32"


_check_params()


# ---------------------------------------------------------------------------
# Fr (scalar field): plain ints mod R
# ---------------------------------------------------------------------------

def fr_from_be_bytes(b: bytes) -> int:
    """Canonical decode: 32 big-endian bytes, must be < R.

    Mirrors reference Fr::from_be_slice (src/bls.rs:130-139): wrong length
    or non-canonical value is an error (None here).
    """
    if len(b) != FR_BYTES:
        return None  # type: ignore[return-value]
    v = int.from_bytes(b, "big")
    if v >= R:
        return None  # type: ignore[return-value]
    return v


def fr_to_be_bytes(v: int) -> bytes:
    return (v % R).to_bytes(FR_BYTES, "big")


def fr_inv(v: int) -> int:
    return pow(v, R - 2, R)


def fr_batch_inv(vals: list[int]) -> list[int]:
    """Montgomery's trick: one inversion for the whole batch (zeros -> 0)."""
    prefix = []
    acc = 1
    for v in vals:
        prefix.append(acc)
        if v:
            acc = acc * v % R
    inv = pow(acc, R - 2, R)
    out = [0] * len(vals)
    for i in range(len(vals) - 1, -1, -1):
        v = vals[i]
        if v:
            out[i] = inv * prefix[i] % R
            inv = inv * v % R
    return out


# ---------------------------------------------------------------------------
# Fp
# ---------------------------------------------------------------------------

def fp_inv(a: int) -> int:
    return pow(a, P - 2, P)


def fp_sqrt(a: int) -> int | None:
    """Square root in Fp (p = 3 mod 4), or None if non-residue."""
    c = pow(a, (P + 1) // 4, P)
    return c if c * c % P == a % P else None


# ---------------------------------------------------------------------------
# Fp2 = Fp[u]/(u^2+1)
# ---------------------------------------------------------------------------

FP2_ZERO = (0, 0)
FP2_ONE = (1, 0)


def fp2_add(a, b):
    return ((a[0] + b[0]) % P, (a[1] + b[1]) % P)


def fp2_sub(a, b):
    return ((a[0] - b[0]) % P, (a[1] - b[1]) % P)


def fp2_neg(a):
    return (-a[0] % P, -a[1] % P)


def fp2_mul(a, b):
    a0, a1 = a
    b0, b1 = b
    t0 = a0 * b0
    t1 = a1 * b1
    # (a0+a1)(b0+b1) - t0 - t1 = a0*b1 + a1*b0
    return ((t0 - t1) % P, ((a0 + a1) * (b0 + b1) - t0 - t1) % P)


def fp2_sqr(a):
    a0, a1 = a
    # (a0 + a1 u)^2 = (a0+a1)(a0-a1) + 2 a0 a1 u
    return ((a0 + a1) * (a0 - a1) % P, 2 * a0 * a1 % P)


def fp2_scalar(a, k: int):
    return (a[0] * k % P, a[1] * k % P)


def fp2_conj(a):
    return (a[0], -a[1] % P)


def fp2_inv(a):
    a0, a1 = a
    norm = (a0 * a0 + a1 * a1) % P
    ninv = fp_inv(norm)
    return (a0 * ninv % P, -a1 * ninv % P)


def fp2_mul_by_xi(a):
    """Multiply by the sextic non-residue xi = u + 1."""
    a0, a1 = a
    return ((a0 - a1) % P, (a0 + a1) % P)


def fp2_is_zero(a) -> bool:
    return a[0] == 0 and a[1] == 0


def fp2_sqrt(a):
    """Square root in Fp2, or None. Algorithm for p = 3 mod 4 fields:

    cand = a^((p-2+... )) -- use the standard two-step method:
      a1 = a^((p-3)/4); x0 = a1 * a; alpha = a1 * x0
      if alpha == -1: sqrt = u * x0 ... (general complex method)
    We use the simple generic method via norm: find c with c^2 = a by
    solving in terms of Fp square roots.
    """
    if fp2_is_zero(a):
        return (0, 0)
    a0, a1 = a
    if a1 == 0:
        s = fp_sqrt(a0)
        if s is not None:
            return (s, 0)
        # sqrt of non-residue n is u * sqrt(-n) since u^2 = -1
        s = fp_sqrt(-a0 % P)
        if s is None:
            return None
        return (0, s)
    # norm = a0^2 + a1^2 must be a QR in Fp
    norm = (a0 * a0 + a1 * a1) % P
    n = fp_sqrt(norm)
    if n is None:
        return None
    # candidate real part: x^2 = (a0 + n)/2 (or (a0 - n)/2)
    inv2 = fp_inv(2)
    for sign in (n, -n % P):
        x2 = (a0 + sign) * inv2 % P
        x = fp_sqrt(x2)
        if x is None or x == 0:
            continue
        y = a1 * fp_inv(2 * x % P) % P
        if fp2_sqr((x, y)) == (a0 % P, a1 % P):
            return (x, y)
    return None


# ---------------------------------------------------------------------------
# Fp6 = Fp2[v]/(v^3 - xi)
# ---------------------------------------------------------------------------

FP6_ZERO = (FP2_ZERO, FP2_ZERO, FP2_ZERO)
FP6_ONE = (FP2_ONE, FP2_ZERO, FP2_ZERO)


def fp6_add(a, b):
    return (fp2_add(a[0], b[0]), fp2_add(a[1], b[1]), fp2_add(a[2], b[2]))


def fp6_sub(a, b):
    return (fp2_sub(a[0], b[0]), fp2_sub(a[1], b[1]), fp2_sub(a[2], b[2]))


def fp6_neg(a):
    return (fp2_neg(a[0]), fp2_neg(a[1]), fp2_neg(a[2]))


def fp6_mul(a, b):
    a0, a1, a2 = a
    b0, b1, b2 = b
    t0 = fp2_mul(a0, b0)
    t1 = fp2_mul(a1, b1)
    t2 = fp2_mul(a2, b2)
    c0 = fp2_add(t0, fp2_mul_by_xi(fp2_sub(fp2_mul(fp2_add(a1, a2), fp2_add(b1, b2)), fp2_add(t1, t2))))
    c1 = fp2_add(fp2_sub(fp2_mul(fp2_add(a0, a1), fp2_add(b0, b1)), fp2_add(t0, t1)), fp2_mul_by_xi(t2))
    c2 = fp2_add(fp2_sub(fp2_mul(fp2_add(a0, a2), fp2_add(b0, b2)), fp2_add(t0, t2)), t1)
    return (c0, c1, c2)


def fp6_sqr(a):
    return fp6_mul(a, a)


def fp6_mul_by_v(a):
    """Multiply by v: (a0, a1, a2) -> (xi*a2, a0, a1)."""
    return (fp2_mul_by_xi(a[2]), a[0], a[1])


def fp6_inv(a):
    a0, a1, a2 = a
    c0 = fp2_sub(fp2_sqr(a0), fp2_mul_by_xi(fp2_mul(a1, a2)))
    c1 = fp2_sub(fp2_mul_by_xi(fp2_sqr(a2)), fp2_mul(a0, a1))
    c2 = fp2_sub(fp2_sqr(a1), fp2_mul(a0, a2))
    t = fp2_add(
        fp2_mul_by_xi(fp2_add(fp2_mul(a2, c1), fp2_mul(a1, c2))),
        fp2_mul(a0, c0),
    )
    tinv = fp2_inv(t)
    return (fp2_mul(c0, tinv), fp2_mul(c1, tinv), fp2_mul(c2, tinv))


# ---------------------------------------------------------------------------
# Fp12 = Fp6[w]/(w^2 - v)
# ---------------------------------------------------------------------------

FP12_ZERO = (FP6_ZERO, FP6_ZERO)
FP12_ONE = (FP6_ONE, FP6_ZERO)


def fp12_add(a, b):
    return (fp6_add(a[0], b[0]), fp6_add(a[1], b[1]))


def fp12_mul(a, b):
    a0, a1 = a
    b0, b1 = b
    t0 = fp6_mul(a0, b0)
    t1 = fp6_mul(a1, b1)
    c0 = fp6_add(t0, fp6_mul_by_v(t1))
    c1 = fp6_sub(fp6_mul(fp6_add(a0, a1), fp6_add(b0, b1)), fp6_add(t0, t1))
    return (c0, c1)


def fp12_sqr(a):
    a0, a1 = a
    # complex squaring: c0 = (a0+a1)(a0 + v a1) - a0a1 - v a0a1; c1 = 2 a0a1
    t = fp6_mul(a0, a1)
    c0 = fp6_sub(
        fp6_mul(fp6_add(a0, a1), fp6_add(a0, fp6_mul_by_v(a1))),
        fp6_add(t, fp6_mul_by_v(t)),
    )
    c1 = fp6_add(t, t)
    return (c0, c1)


def fp12_conj(a):
    """Conjugation a0 - a1 w == Frobenius^6 (inverse for cyclotomic elements)."""
    return (a[0], fp6_neg(a[1]))


def fp12_inv(a):
    a0, a1 = a
    t = fp6_sub(fp6_sqr(a0), fp6_mul_by_v(fp6_sqr(a1)))
    tinv = fp6_inv(t)
    return (fp6_mul(a0, tinv), fp6_neg(fp6_mul(a1, tinv)))


def fp12_pow(a, e: int):
    if e < 0:
        a = fp12_inv(a)
        e = -e
    out = FP12_ONE
    base = a
    while e:
        if e & 1:
            out = fp12_mul(out, base)
        base = fp12_sqr(base)
        e >>= 1
    return out


def fp12_is_one(a) -> bool:
    return a == FP12_ONE


# ---------------------------------------------------------------------------
# Frobenius endomorphism on Fp12 (x -> x^p)
# ---------------------------------------------------------------------------

# gamma1[i] = xi^(i*(p-1)/6) in Fp2, i = 1..5
def _compute_frobenius_constants():
    xi = (1, 1)
    e = (P - 1) // 6
    gammas = []
    cur = FP2_ONE
    # xi^e via square-and-multiply in Fp2
    def fp2_pow(a, n):
        out = FP2_ONE
        base = a
        while n:
            if n & 1:
                out = fp2_mul(out, base)
            base = fp2_sqr(base)
            n >>= 1
        return out

    g1 = fp2_pow(xi, e)
    cur = FP2_ONE
    for _ in range(5):
        cur = fp2_mul(cur, g1)
        gammas.append(cur)
    return gammas


GAMMA1 = _compute_frobenius_constants()  # gamma1[i-1] = xi^(i(p-1)/6)


def fp2_frob(a):
    """a^p in Fp2 == conjugate."""
    return fp2_conj(a)


def fp6_frob(a):
    a0, a1, a2 = a
    return (
        fp2_frob(a0),
        fp2_mul(fp2_frob(a1), GAMMA1[1]),  # gamma1_2 = xi^(2(p-1)/6)
        fp2_mul(fp2_frob(a2), GAMMA1[3]),  # gamma1_4
    )


def fp12_frob(a):
    """x -> x^p on Fp12.

    (b0 + b1 w)^p = frob6(b0) + frob6(b1) * xi^((p-1)/6) * w.  Flattened:
    the b1 component coefficients become gamma1[0], gamma1[2], gamma1[4]
    applied to the plain Fp2-conjugated coefficients.
    """
    a0, a1 = a
    b0 = fp6_frob(a0)
    b1 = (
        fp2_mul(fp2_frob(a1[0]), GAMMA1[0]),
        fp2_mul(fp2_frob(a1[1]), GAMMA1[2]),
        fp2_mul(fp2_frob(a1[2]), GAMMA1[4]),
    )
    return (b0, b1)
