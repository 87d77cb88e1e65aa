"""TPU-native BLS12-381 pairing check.

Replaces the reference's blst pairing surface — blst_miller_loop,
blst_fp12_mul, blst_final_exp, blst_fp12_is_one behind
bls::verify_pairings (reference src/bls.rs:572-598).

Design (branch-free, scan-structured, sized for the XLA compiler):

* Miller loop ON THE TWIST: the G2 state point stays in homogeneous
  projective coordinates over Fp2 (no inversions); line functions are
  evaluated at the G1 point "twisted up" by psi(x, y) = (x w^2, y w^3),
  giving sparse values  A + (B xP) w^2 + (C yP) w^3  with A, B, C in Fp2:

    doubling at T=(X,Y,Z):  A = 3X^3 - 2Y^2 Z,  B = -3X^2 Z,  C = 2YZ^2
    adding affine Q=(xq,yq): N = yq Z - Y, D = xq Z - X,
                             A = N xq - D yq,  B = -N,  C = D

  Each line is the honest chord/tangent line scaled by an element of
  Fp2 * w^3.  All such factors lie in (or pair up into) F_p^6 across the
  PRODUCT of the two Miller loops that `verify_pairings` exponentiates
  (same shape as the reference, bls.rs:591-596), and the final
  exponentiation kills F_p^6 exactly, so the verified product — and the
  reduced pairing value tested against the oracle — is bit-exact.

* The loop over the 63 low bits of |x| = 0xd201000000010000 is ONE
  lax.scan.  The doubling line and the (bit-masked) addition line are
  merged FIRST with a sparse*sparse product (6 Fp2 multiplies — the
  no-addition case selects the identity line (1,0,0|0,0,0) so the merge
  is unconditional), then applied to f with a single dense Fp12 multiply:
  one squaring + one dense multiply per step, uniform shape, traced once.

* Final exponentiation: easy part  f^((p^6-1)(p^2+1))  via conj/inv/frob,
  then the hard part via the cyclotomic addition chain for the scaled
  exponent 3(p^4-p^2+1)/r (see final_exponentiation) — matching the
  oracle's direct-pow final_exponentiation bit-for-bit.

Both miller_loop inputs may be batched; infinity G1/G2 inputs yield f = 1
exactly like blst.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from .fields import limbs as L
from .fields import fp2, fp6, fp12
from .fields.specs import FP
from .curves import ops
from .oracle.field import BLS_X

F2 = ops.FP2_FIELD
X_ABS = -BLS_X  # 0xd201000000010000


def _use_pallas() -> bool:
    """Whole-chain Pallas Miller/hard-part kernels on TPU (default), the
    XLA scan path elsewhere.

    Hardware record: ALL pairing kernels pass bit-exact vs the oracle on
    v5e (TPU_KERNEL_CHECK.json round 3, after the const-init layout fix
    and the hard-part scoped-VMEM raise) — which is what qualifies them
    for the default path.  KATETH_NO_PALLAS_PAIRING=1 disables ONLY these
    kernels (the bench launcher's middle fallback rung);
    KATETH_PALLAS_INTERPRET=1 exercises the bodies on CPU for tests."""
    import os

    if os.environ.get("KATETH_NO_PALLAS_PAIRING") == "1":
        return False
    if os.environ.get("KATETH_PALLAS_INTERPRET") == "1":
        return True
    return jax.default_backend() != "cpu" and not L._NO_PALLAS


def _fp2_mul_many(pairs):
    return fp6._fp2_mul_many(pairs)


def _line_dbl(T):
    """Line coefficients (A, B, C) for the tangent at projective twist T."""
    X, Y, Z = T
    x2, y2, yz = _fp2_mul_many([(X, X), (Y, Y), (Y, Z)])
    x3, y2z, yz2, x2z = _fp2_mul_many([(x2, X), (y2, Z), (yz, Z), (x2, Z)])
    a = fp2.sub(fp2.mul_small(x3, 3), fp2.mul_small(y2z, 2))
    b = fp2.neg(fp2.mul_small(x2z, 3))
    c = fp2.mul_small(yz2, 2)
    return a, b, c


def _line_add(T, q_aff):
    """Line coefficients (A, B, C) through T and affine twist point q."""
    X, Y, Z = T
    xq, yq = q_aff
    nzy, dzx = _fp2_mul_many([(yq, Z), (xq, Z)])
    n = fp2.sub(nzy, Y)
    d = fp2.sub(dzx, X)
    nxq, dyq = _fp2_mul_many([(n, xq), (d, yq)])
    a = fp2.sub(nxq, dyq)
    return a, fp2.neg(n), d


def _merge_lines(l1, l2):
    """Product of two sparse lines (a + b w^2 + c w^3) -> an Fp12 element.

    (a,b,c)*(a',b',c') = (aa' + xi cc',  ab'+a'b,  bb' | 0,  ac'+a'c,
    bc'+b'c) in (Fp6, Fp6 w) coordinates; 6 Fp2 multiplies via Karatsuba
    cross terms.  b/c arrive pre-multiplied by xP / yP.
    """
    a, b, c = l1
    a2, b2, c2 = l2
    p = _fp2_mul_many(
        [
            (a, a2),
            (b, b2),
            (c, c2),
            (fp2.add(a, b), fp2.add(a2, b2)),
            (fp2.add(a, c), fp2.add(a2, c2)),
            (fp2.add(b, c), fp2.add(b2, c2)),
        ]
    )
    aa, bb, cc, ab_s, ac_s, bc_s = p
    ab = fp2.sub(ab_s, fp2.add(aa, bb))
    ac = fp2.sub(ac_s, fp2.add(aa, cc))
    bc = fp2.sub(bc_s, fp2.add(bb, cc))
    z = jnp.zeros_like(aa)
    r0 = jnp.stack([fp2.add(aa, fp2.mul_by_xi(cc)), ab, bb], axis=-3)
    r1 = jnp.stack([z, ac, bc], axis=-3)
    return jnp.stack([r0, r1], axis=-4)


# MSB-first bits of |x| after the leading one (63 static steps)
_X_BITS = np.array([b == "1" for b in bin(X_ABS)[3:]], dtype=np.bool_)


def miller_loop(p_g1, q_g2):
    """f_{|x|,Q'}(psi(P)), conjugated for the negative BLS parameter.

    p_g1: projective G1 digit planes (each coord (..., D)).
    q_g2: projective G2/twist digit planes (each coord (..., 2, D)).
    Batched over leading dims.  Infinity inputs give 1.
    """
    p_inf = ops.is_identity(ops.FP_FIELD, p_g1)
    q_inf = ops.is_identity(F2, q_g2)

    # affine; masked fallback to the generators keeps the math defined
    from .curves import g1 as g1mod, g2 as g2mod

    p_safe = ops.pselect(
        ops.FP_FIELD,
        p_inf,
        tuple(jnp.broadcast_to(a, b.shape) for a, b in zip(g1mod.GENERATOR, p_g1)),
        p_g1,
    )
    q_safe = ops.pselect(
        F2,
        q_inf,
        tuple(jnp.broadcast_to(a, b.shape) for a, b in zip(g2mod.GENERATOR, q_g2)),
        q_g2,
    )
    xp, yp = ops.to_affine(ops.FP_FIELD, p_safe)
    xq, yq = ops.to_affine(F2, q_safe)

    if _use_pallas():
        from . import pallas_pairing

        f = pallas_pairing.miller_loop_affine(xp, yp, xq, yq)
        return fp12.select(p_inf | q_inf, jnp.broadcast_to(fp12.one(), f.shape), f)

    q_aff = (xq, yq)
    q_proj = (xq, yq, F2.one(jnp.shape(xq)[:-2]))

    batch = jnp.shape(xp)[:-1]
    xp2 = jnp.stack([xp, jnp.zeros_like(xp)], axis=-2)  # xP embedded in Fp2
    yp2 = jnp.stack([yp, jnp.zeros_like(yp)], axis=-2)
    one2 = F2.one(batch)
    zero2 = jnp.zeros_like(one2)

    f0 = jnp.broadcast_to(fp12.one(), (*batch, 2, 3, 2, FP.n_digits))
    bits = jnp.asarray(_X_BITS)

    def step(carry, bit):
        f, T = carry
        # tangent line at T (B, C folded with xP, yP), then double T
        a, b, c = _line_dbl(T)
        bxp, cyp = _fp2_mul_many([(b, xp2), (c, yp2)])
        T = ops.pdouble(F2, T)
        # chord line through (T, Q), masked to the identity line when bit=0
        a2, b2, c2 = _line_add(T, q_aff)
        bxp2, cyp2 = _fp2_mul_many([(b2, xp2), (c2, yp2)])
        bit_b = jnp.broadcast_to(bit, batch)
        m = bit_b[..., None, None]
        la2 = jnp.where(m, a2, one2)
        lb2 = jnp.where(m, bxp2, zero2)
        lc2 = jnp.where(m, cyp2, zero2)
        line = _merge_lines((a, bxp, cyp), (la2, lb2, lc2))
        T_add = ops.padd(F2, T, q_proj)
        T = ops.pselect(F2, bit_b, T_add, T)
        f = fp12.mul(fp12.sqr(f), line)
        return (f, T), None

    (f, _), _ = jax.lax.scan(step, (f0, q_proj), bits)
    # negative parameter: conjugate; infinity inputs: 1
    f = fp12.conj(f)
    return fp12.select(p_inf | q_inf, jnp.broadcast_to(fp12.one(), f.shape), f)


def _pow_x(f):
    """f^x for the (negative) BLS parameter on the cyclotomic subgroup:
    conj(f^|x|), |x| = 0xd201000000010000 (64 bits, Hamming weight 6)."""
    return fp12.conj(fp12.pow_abs_cyc(f, X_ABS))


def final_exponentiation(f):
    """f^(3 (p^12-1)/r): easy part via Frobenius, hard part by the
    cyclotomic addition chain for the scaled exponent

        3 (p^4-p^2+1)/r  ==  (x-1)^2 (x+p) (x^2+p^2-1) + 3

    — five ~64-bit x-power chains of Granger-Scott squarings instead of
    the direct 1268-bit square-and-multiply scan (≈4x fewer squarings at
    half the cost each, ≈25x fewer dense multiplies).  Bit-exact with the
    oracle's final_exponentiation, which computes the SAME scaled
    exponent by direct integer pow — an independent derivation that
    cross-checks the chain.  The factor 3 is boolean-invisible:
    the reduced value has order dividing r and gcd(3, r) = 1."""
    # easy part: f^((p^6-1)(p^2+1)) — lands in the cyclotomic subgroup
    f = fp12.mul(fp12.conj(f), fp12.inv(f))
    f = fp12.mul(fp12.frob(fp12.frob(f)), f)
    if _use_pallas():
        from . import pallas_pairing

        return pallas_pairing.hard_part(f)
    # hard part chain (conj == inverse on the cyclotomic subgroup)
    t0 = fp12.mul(_pow_x(f), fp12.conj(f))                 # f^(x-1)
    t1 = fp12.mul(_pow_x(t0), fp12.conj(t0))               # f^((x-1)^2)
    t2 = fp12.mul(_pow_x(t1), fp12.frob(t1))               # ^(x+p)
    t3 = fp12.mul(                                          # ^(x^2+p^2-1)
        fp12.mul(_pow_x(_pow_x(t2)), fp12.frob(fp12.frob(t2))), fp12.conj(t2)
    )
    return fp12.mul(t3, fp12.mul(fp12.cyc_sqr(f), f))      # * f^3


def verify_pairings(a, b):
    """e(a1, a2) == e(b1, b2) via final_exp(ml(-a1, a2) * ml(b1, b2)) == 1
    (reference bls.rs:572-598).  Returns a scalar bool array."""
    (a1, a2), (b1, b2) = a, b
    # batch the two Miller loops into one scan over a stacked axis
    p = tuple(jnp.stack([x, y], axis=0) for x, y in zip(ops.pneg(ops.FP_FIELD, a1), b1))
    q = tuple(jnp.stack([x, y], axis=0) for x, y in zip(a2, b2))
    fs = miller_loop(p, q)
    prod = fp12.mul(fs[0], fs[1])
    return fp12.is_one(final_exponentiation(prod))
