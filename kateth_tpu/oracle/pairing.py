"""Pure-Python oracle for the BLS12-381 pairing.

Implements the optimal ate pairing in the most transparent (slow) form
possible: the G2 point is *untwisted* into E(Fp12) and the Miller loop runs
with textbook affine line functions over Fp12, so no sparse-multiplication
or twist-type conventions can be silently wrong.  The final exponentiation
computes the hard part by direct integer exponentiation.

This module is the correctness anchor for the device pairing kernels.

Reference behavior anchor: bls::verify_pairings (src/bls.rs:572-598) checks
e(a1, a2) == e(b1, b2) via e(-a1, a2) * e(b1, b2) == 1; this module provides
the same check built on our own pairing.
"""

from __future__ import annotations

from .field import (
    BLS_X,
    P,
    R,
    FP2_ZERO,
    FP6_ZERO,
    FP6_ONE,
    FP12_ONE,
    fp12_conj,
    fp12_frob,
    fp12_inv,
    fp12_is_one,
    fp12_mul,
    fp12_pow,
    fp12_sqr,
    fp6_add,
    fp6_sub,
)
from .curve import (
    FP2_OPS,
    FP_OPS,
    g1_neg,
    g1_to_affine,
    g2_to_affine,
    jac_is_infinity,
)

BLS_X_ABS = -BLS_X
_X_BITS = bin(BLS_X_ABS)[3:]  # bits after the leading one, MSB first


# --- Fp12 embedding helpers ------------------------------------------------

def fp12_from_fp(a: int):
    """Embed Fp scalar into Fp12."""
    return (((a % P, 0), FP2_ZERO, FP2_ZERO), FP6_ZERO)


def fp12_from_fp2(a):
    return ((a, FP2_ZERO, FP2_ZERO), FP6_ZERO)


#: w = 0 + 1*w : the Fp12 generator with w^2 = v, w^6 = xi = u + 1.
FP12_W = (FP6_ZERO, FP6_ONE)

_FP12_W2 = fp12_sqr(FP12_W)
_FP12_W3 = fp12_mul(_FP12_W2, FP12_W)
_FP12_W2_INV = fp12_inv(_FP12_W2)
_FP12_W3_INV = fp12_inv(_FP12_W3)


def fp12_sub(a, b):
    return (fp6_sub(a[0], b[0]), fp6_sub(a[1], b[1]))


def fp12_eq(a, b) -> bool:
    return a == b


def untwist(q_aff):
    """Map an affine point of E'(Fp2) to affine E(Fp12).

    E': y^2 = x^3 + 4(u+1) (M-type twist, xi = u+1).  With w^6 = xi the map
    (x', y') -> (x'/w^2, y'/w^3) lands on E: y^2 = x^3 + 4.
    """
    x2, y2 = q_aff
    x12 = fp12_mul(fp12_from_fp2(x2), _FP12_W2_INV)
    y12 = fp12_mul(fp12_from_fp2(y2), _FP12_W3_INV)
    return (x12, y12)


# --- Miller loop (affine, over E(Fp12)) ------------------------------------

def _line_through(t, q, p):
    """Evaluate at p the line through t and q (or tangent if t == q).

    All points are affine over Fp12. Returns the line value in Fp12.
    Vertical-line factors are omitted (they vanish under the final
    exponentiation for even embedding degree).
    """
    (xt, yt), (xq, yq), (xp, yp) = t, q, p
    if xt == xq and yt == yq:
        # tangent: m = 3 xt^2 / (2 yt)
        num = fp12_mul(fp12_from_fp(3), fp12_sqr(xt))
        den = fp12_mul(fp12_from_fp(2), yt)
    elif xt == xq:
        # vertical line x - xt evaluated at p
        return fp12_sub(xp, xt)
    else:
        num = fp12_sub(yq, yt)
        den = fp12_sub(xq, xt)
    m = fp12_mul(num, fp12_inv(den))
    # l(p) = yp - yt - m (xp - xt)
    return fp12_sub(fp12_sub(yp, yt), fp12_mul(m, fp12_sub(xp, xt)))


def _affine_add(t, q):
    """Affine addition on E(Fp12); t, q not inverse of each other."""
    (xt, yt), (xq, yq) = t, q
    if xt == xq and yt == yq:
        m = fp12_mul(
            fp12_mul(fp12_from_fp(3), fp12_sqr(xt)),
            fp12_inv(fp12_mul(fp12_from_fp(2), yt)),
        )
    else:
        m = fp12_mul(fp12_sub(yq, yt), fp12_inv(fp12_sub(xq, xt)))
    x3 = fp12_sub(fp12_sub(fp12_sqr(m), xt), xq)
    y3 = fp12_sub(fp12_mul(m, fp12_sub(xt, x3)), yt)
    return (x3, y3)


def miller_loop(p_g1, q_g2):
    """f_{|x|, Q}(P), conjugated for the negative BLS parameter.

    p_g1 / q_g2 are oracle Jacobian points on G1 / G2.  Either at infinity
    yields 1 (so the pairing degenerates to 1, as in blst).
    """
    if jac_is_infinity(FP_OPS, p_g1) or jac_is_infinity(FP2_OPS, q_g2):
        return FP12_ONE
    paff = g1_to_affine(p_g1)
    p12 = (fp12_from_fp(paff[0]), fp12_from_fp(paff[1]))
    q12 = untwist(g2_to_affine(q_g2))

    t = q12
    f = FP12_ONE
    for bit in _X_BITS:
        f = fp12_mul(fp12_sqr(f), _line_through(t, t, p12))
        t = _affine_add(t, t)
        if bit == "1":
            f = fp12_mul(f, _line_through(t, q12, p12))
            t = _affine_add(t, q12)
    # negative BLS parameter: f_{-|x|} = 1/f_{|x|} ~ conj(f) after final exp
    return fp12_conj(f)


def final_exponentiation(f):
    """f^((p^12-1)*3/r): easy part via Frobenius, hard part by direct pow.

    The hard part uses the scaled exponent 3*(p^4-p^2+1)/r — the classic
    BLS12 identity 3*(p^4-p^2+1)/r == (x-1)^2*(x+p)*(x^2+p^2-1) + 3 lets
    the device compute it with a short cyclotomic addition chain (five
    ~64-bit x-power chains instead of one 1268-bit chain).  The oracle
    keeps DIRECT integer exponentiation of the same exponent, so the
    bit-exact device-vs-oracle comparison cross-checks the chain against
    an independent derivation.  The factor 3 does not change the
    verification boolean: the reduced value lies in the order-r subgroup
    and gcd(3, r) = 1, so f^(3e) == 1  <=>  f^e == 1.
    """
    # easy part: f^((p^6-1)(p^2+1))
    f = fp12_mul(fp12_conj(f), fp12_inv(f))
    f = fp12_mul(fp12_frob(fp12_frob(f)), f)
    # hard part (scaled): exponent 3*(p^4 - p^2 + 1)/r
    d = 3 * ((P**4 - P**2 + 1) // R)
    return fp12_pow(f, d)


def pairing(p_g1, q_g2):
    """Reduced optimal ate pairing e(P, Q)."""
    return final_exponentiation(miller_loop(p_g1, q_g2))


def verify_pairings(a, b) -> bool:
    """Check e(a1, a2) == e(b1, b2) (reference bls.rs:572-598): computes
    e(-a1, a2) * e(b1, b2) and compares the single reduced product to 1."""
    (a1, a2), (b1, b2) = a, b
    e1 = miller_loop(g1_neg(a1), a2)
    e2 = miller_loop(b1, b2)
    return fp12_is_one(final_exponentiation(fp12_mul(e1, e2)))
