"""Batched device G1/G2 compression vs the oracle (flags, infinity, sign
bit, lexicographic Fp2 ordering)."""

import random

import numpy as np
import jax.numpy as jnp

from kateth_tpu.curves import compress, g1 as g1mod
from kateth_tpu.oracle import curve as oc
from kateth_tpu.oracle import field as of

rng = random.Random(0xC04)


def _dev_compress(pts):
    dp = tuple(jnp.asarray(c) for c in g1mod.from_oracle(pts))
    return compress.points_to_bytes(dp)


def test_compress_matches_oracle():
    pts = [oc.g1_mul(oc.G1_GEN, rng.randrange(1, of.R)) for _ in range(12)]
    pts.append(oc.g1_infinity())
    got = _dev_compress(pts)
    want = [oc.g1_compress(p) for p in pts]
    assert got == want


def test_compress_sign_bit_both_ways():
    """Force both lexicographic sign-bit values: P and -P differ only in
    the 0x20 flag."""
    p = oc.g1_mul(oc.G1_GEN, 0xDEADBEEF)
    pn = oc.g1_neg(p)
    got = _dev_compress([p, pn])
    assert got[0] == oc.g1_compress(p)
    assert got[1] == oc.g1_compress(pn)
    assert (got[0][0] ^ got[1][0]) == 0x20
    assert got[0][1:] == got[1][1:]


def test_compress_unnormalized_projective():
    """Compression must normalize: scale (X, Y, Z) by a random lambda and
    expect identical bytes."""
    p = oc.g1_mul(oc.G1_GEN, 42)
    dp = tuple(jnp.asarray(c) for c in g1mod.from_oracle([p]))
    lam = rng.randrange(2, of.P)
    from kateth_tpu.fields import limbs as L
    from kateth_tpu.fields.specs import FP

    lam_m = jnp.asarray(np.stack([FP.from_int(lam)]))
    scaled = tuple(L.mont_mul(FP, c, lam_m) for c in dp)
    assert compress.points_to_bytes(scaled) == [oc.g1_compress(p)]


# -- G2 (reference blst_p2_compress surface, bls.rs:554-570) -------------


def _dev_g2_compress(pts):
    from kateth_tpu.curves import g2 as g2mod

    dp = tuple(jnp.asarray(c) for c in g2mod.from_oracle(pts))
    return compress.g2_points_to_bytes(dp)


def test_g2_compress_matches_oracle():
    pts = [oc.g2_mul(oc.G2_GEN, rng.randrange(1, of.R)) for _ in range(8)]
    pts.append(oc.g2_infinity())
    got = _dev_g2_compress(pts)
    want = [oc.g2_compress(p) for p in pts]
    assert got == want


def test_g2_compress_sign_bit_both_ways():
    p = oc.g2_mul(oc.G2_GEN, 0xFEEDFACE)
    pn = oc.g2_neg(p)
    got = _dev_g2_compress([p, pn])
    assert got[0] == oc.g2_compress(p)
    assert got[1] == oc.g2_compress(pn)
    assert (got[0][0] ^ got[1][0]) == 0x20
    assert got[0][1:] == got[1][1:]


def test_g2_compress_setup_roundtrip(oracle_setup):
    """The 65 mainnet G2 monomial points: device compression reproduces
    the ceremony's own encodings byte-for-byte."""
    got = _dev_g2_compress(oracle_setup.g2_monomial)
    want = [oc.g2_compress(p) for p in oracle_setup.g2_monomial]
    assert got == want
