"""Default-suite coverage of the Pallas kernel BODIES (interpret mode).

The whole-chain kernels (Miller loop, hard part, ladders, MSM scan) are
too heavy to interpret on this 1-core CPU box, so their end-to-end checks
are opt-in (KATETH_INTERPRET_TESTS=1) and hardware-gated
(tools/tpu_kernel_check.py).  But the building blocks those chains are
made of — FieldVec Montgomery arithmetic, the Fp2/Fp12 digit-list tower,
the in-kernel complete-formula point adds — fit in ONE small pallas_call
each, so they run here unconditionally: a bug in any kernel-body helper
(e.g. pallas_tower.fp12_mul) fails the default suite, not just a TPU run.

Each test drives a minimal kernel through pl.pallas_call(interpret=True)
at a few lanes and compares bit-for-bit with the pure-Python oracle.

The base-field tests run everywhere.  The tower/point tests compile
multi-thousand-op interpret graphs — tens of minutes on this 1-core dev
box — so they are additionally gated on KATETH_INTERPRET_TESTS=1, which
CI's fast tier sets (GitHub runners are multi-core with cached
compiles); see .github/workflows/ci.yaml.
"""

import os
import random

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

heavy = pytest.mark.skipif(
    os.environ.get("KATETH_INTERPRET_TESTS") != "1",
    reason="heavy interpret-mode body test (KATETH_INTERPRET_TESTS=1; runs in CI)",
)

from kateth_tpu.fields.specs import FP, FR
from kateth_tpu.fields import fp12 as fp12_mod
from kateth_tpu.fields.pallas_mont import FieldVec, G1Vec
from kateth_tpu.fields.pallas_tower import (
    Fp2Vec,
    fp12_mul,
    fp12_cyc_sqr,
    fp12_frob,
)
from kateth_tpu import pallas_pairing as PPK
from kateth_tpu.curves import g1, g2
from kateth_tpu.oracle import curve as oc
from kateth_tpu.oracle import field as of
from kateth_tpu.oracle import pairing as op

rng = random.Random(0xB0D1E5)
L = 8  # lanes per test — interpret mode is per-element, keep it tiny


def fvec(spec) -> FieldVec:
    return FieldVec(
        spec.n_digits,
        [int(x) for x in spec.mod_digits],
        [int(x) for x in spec.nprime_digits],
    )


def run(body, ins, out_shape):
    return np.asarray(
        pl.pallas_call(
            body,
            out_shape=jax.ShapeDtypeStruct(out_shape, jnp.uint32),
            interpret=True,
        )(*[jnp.asarray(x) for x in ins])
    )


def digit_cols(spec, vals, mont=True):
    """ints -> (D, L) digit-major Montgomery planes."""
    return np.stack([spec.from_int(v, mont=mont) for v in vals]).T.astype(np.uint32)


@pytest.mark.parametrize("spec", [FR, FP], ids=["fr", "fp"])
def test_fieldvec_mul_add_sub(spec):
    D = spec.n_digits
    F = fvec(spec)
    avals = [rng.randrange(spec.modulus) for _ in range(L - 1)] + [spec.modulus - 1]
    bvals = [rng.randrange(spec.modulus) for _ in range(L - 1)] + [spec.modulus - 1]

    def body(a_ref, b_ref, o_ref):
        a = [a_ref[i, :] for i in range(D)]
        b = [b_ref[i, :] for i in range(D)]
        for row, out in enumerate([F.mul(a, b), F.add(a, b), F.sub(a, b)]):
            for i in range(D):
                o_ref[row * D + i, :] = out[i]

    out = run(body, [digit_cols(spec, avals), digit_cols(spec, bvals)], (3 * D, L))
    for j in range(L):
        a, b, m = avals[j], bvals[j], spec.modulus
        assert spec.to_int(out[0:D, j]) == a * b % m
        assert spec.to_int(out[D : 2 * D, j]) == (a + b) % m
        assert spec.to_int(out[2 * D : 3 * D, j]) == (a - b) % m


def rand_fp2():
    return (rng.randrange(of.P), rng.randrange(of.P))


def fp2_cols(vals):
    """list of oracle fp2 -> (2*D, L) rows (c0 digits, c1 digits)."""
    D = FP.n_digits
    arr = np.stack(
        [np.concatenate([FP.from_int(v[0]), FP.from_int(v[1])]) for v in vals]
    )  # (L, 2D)
    return arr.T.astype(np.uint32)


def test_fp2vec_mul_many():
    D = FP.n_digits
    F2 = Fp2Vec(fvec(FP))
    avals = [rand_fp2() for _ in range(L)]
    bvals = [rand_fp2() for _ in range(L)]

    def body(a_ref, b_ref, o_ref):
        a = PPK._read_fp2(a_ref, 0, D)
        b = PPK._read_fp2(b_ref, 0, D)
        (prod,) = F2.mul_many([(a, b)])
        for u in range(2):
            for i in range(D):
                o_ref[u * D + i, :] = prod[u][i]

    out = run(body, [fp2_cols(avals), fp2_cols(bvals)], (2 * D, L))
    for j in range(L):
        want = of.fp2_mul(avals[j], bvals[j])
        assert (FP.to_int(out[0:D, j]), FP.to_int(out[D:, j])) == want


def rand_fp12():
    def rand_fp6():
        return tuple(rand_fp2() for _ in range(3))

    return (rand_fp6(), rand_fp6())


def fp12_rows(vals):
    arr = np.stack([fp12_mod.from_ints(v) for v in vals])  # (L, 2, 3, 2, D)
    rows, _ = PPK.fp12_to_rows(jnp.asarray(arr))
    return np.asarray(rows)


def fp12_unrows(out):
    return np.asarray(PPK.fp12_from_rows(jnp.asarray(out), (out.shape[-1],)))


@heavy
def test_fp12_mul_kernel_body():
    D = FP.n_digits
    F2 = Fp2Vec(fvec(FP))
    a = [rand_fp12() for _ in range(L)]
    b = [rand_fp12() for _ in range(L)]

    def body(a_ref, b_ref, o_ref):
        PPK._write_fp12(
            o_ref,
            fp12_mul(F2, PPK._read_fp12(a_ref, D), PPK._read_fp12(b_ref, D)),
            D,
        )

    res = fp12_unrows(run(body, [fp12_rows(a), fp12_rows(b)], (12 * D, L)))
    for j in range(L):
        assert fp12_mod.to_ints(res[j]) == of.fp12_mul(a[j], b[j])


@heavy
def test_fp12_cyc_sqr_and_frob_kernel_body():
    D = FP.n_digits
    F2 = Fp2Vec(fvec(FP))
    # cyclotomic squaring is only valid on the cyclotomic subgroup: use
    # final-exponentiation outputs as inputs
    a = [op.final_exponentiation(rand_fp12()) for _ in range(2)]
    lanes = len(a)

    def body(a_ref, o_ref, o2_ref):
        f = PPK._read_fp12(a_ref, D)
        PPK._write_fp12(o_ref, fp12_cyc_sqr(F2, f), D)
        PPK._write_fp12(o2_ref, fp12_frob(F2, f, PPK._GAMMAS), D)

    rows = fp12_rows(a)
    sq, fr = pl.pallas_call(
        lambda a_ref, o_ref, o2_ref: body(a_ref, o_ref, o2_ref),
        out_shape=(
            jax.ShapeDtypeStruct((12 * D, lanes), jnp.uint32),
            jax.ShapeDtypeStruct((12 * D, lanes), jnp.uint32),
        ),
        interpret=True,
    )(jnp.asarray(rows))
    sq, fr = fp12_unrows(np.asarray(sq)), fp12_unrows(np.asarray(fr))
    for j in range(lanes):
        assert fp12_mod.to_ints(sq[j]) == of.fp12_sqr(a[j])
        assert fp12_mod.to_ints(fr[j]) == of.fp12_frob(a[j])


def g1_cols(pts):
    x, y, z = g1.from_oracle(pts)  # each (L, D)
    return np.concatenate([x.T, y.T, z.T], axis=0).astype(np.uint32)  # (3D, L)


@heavy
def test_g1_padd_kernel_body():
    D = FP.n_digits
    G = G1Vec(fvec(FP), [int(x) for x in FP.one_mont])
    base = [oc.g1_mul(oc.G1_GEN, rng.randrange(1, of.R)) for _ in range(L)]
    other = [oc.g1_mul(oc.G1_GEN, rng.randrange(1, of.R)) for _ in range(L - 3)]
    # edge lanes: identity on either side, P + P (doubling through add)
    other += [oc.g1_infinity(), base[L - 2], base[L - 1]]
    base[L - 3] = oc.g1_infinity()

    def body(a_ref, b_ref, o_ref):
        pa = tuple([a_ref[c * D + i, :] for i in range(D)] for c in range(3))
        pb = tuple([b_ref[c * D + i, :] for i in range(D)] for c in range(3))
        out = G.padd(pa, pb)
        for c in range(3):
            for i in range(D):
                o_ref[c * D + i, :] = out[c][i]

    out = run(body, [g1_cols(base), g1_cols(other)], (3 * D, L))
    got = g1.to_oracle(tuple(out.reshape(3, D, L)[c].T for c in range(3)))
    for j in range(L):
        assert oc.g1_eq(got[j], oc.g1_add(base[j], other[j]))


def g2_cols(pts):
    x, y, z = g2.from_oracle(pts)  # each (L, 2, D)
    return np.concatenate(
        [np.transpose(c, (1, 2, 0)).reshape(2 * FP.n_digits, len(pts)) for c in (x, y, z)],
        axis=0,
    ).astype(np.uint32)  # (6D, L), element-row c*2+u


@heavy
def test_g2_padd_kernel_body():
    D = FP.n_digits
    F2 = Fp2Vec(fvec(FP))
    base = [oc.g2_mul(oc.G2_GEN, rng.randrange(1, of.R)) for _ in range(L - 1)]
    base.append(oc.g2_infinity())
    other = [oc.g2_mul(oc.G2_GEN, rng.randrange(1, of.R)) for _ in range(L - 1)]
    other.append(base[0])

    def body(a_ref, b_ref, o_ref):
        pa = tuple(PPK._read_fp2(a_ref, c, D) for c in range(3))
        pb = tuple(PPK._read_fp2(b_ref, c, D) for c in range(3))
        out = PPK._padd(F2, pa, pb)
        for c in range(3):
            for u in range(2):
                for i in range(D):
                    o_ref[(c * 2 + u) * D + i, :] = out[c][u][i]

    out = run(body, [g2_cols(base), g2_cols(other)], (6 * D, L))
    coords = out.reshape(3, 2, D, L)
    got = g2.to_oracle(tuple(np.transpose(coords[c], (2, 0, 1)) for c in range(3)))
    # lane L-1 adds the identity on the left: ordinary projective equality
    for j in range(L):
        assert oc.g2_eq(got[j], oc.g2_add(base[j], other[j]))
