"""Oracle pairing tests: bilinearity, non-degeneracy, verify_pairings."""

import random

from kateth_tpu.oracle import curve as c
from kateth_tpu.oracle import field as f
from kateth_tpu.oracle import pairing as pr

rng = random.Random(0x9A1F)


def test_pairing_nondegenerate():
    e = pr.pairing(c.G1_GEN, c.G2_GEN)
    assert e != f.FP12_ONE


def test_pairing_bilinear():
    a = rng.randrange(1, 2**64)
    b = rng.randrange(1, 2**64)
    pa = c.g1_mul(c.G1_GEN, a)
    qb = c.g2_mul(c.G2_GEN, b)
    e1 = pr.pairing(pa, qb)
    e2 = f.fp12_pow(pr.pairing(c.G1_GEN, c.G2_GEN), a * b)
    assert e1 == e2


def test_pairing_additive_in_g1():
    a, b = rng.randrange(1, 1 << 32), rng.randrange(1, 1 << 32)
    lhs = pr.pairing(c.g1_add(c.g1_mul(c.G1_GEN, a), c.g1_mul(c.G1_GEN, b)), c.G2_GEN)
    rhs = f.fp12_mul(
        pr.pairing(c.g1_mul(c.G1_GEN, a), c.G2_GEN),
        pr.pairing(c.g1_mul(c.G1_GEN, b), c.G2_GEN),
    )
    assert lhs == rhs


def test_pairing_has_order_r():
    e = pr.pairing(c.G1_GEN, c.G2_GEN)
    assert f.fp12_pow(e, f.R) == f.FP12_ONE


def test_pairing_infinity():
    assert pr.pairing(c.g1_infinity(), c.G2_GEN) == f.FP12_ONE
    assert pr.pairing(c.G1_GEN, c.g2_infinity()) == f.FP12_ONE


def test_verify_pairings():
    # e(aG1, bG2) == e(abG1, G2)
    a, b = rng.randrange(1, f.R), rng.randrange(1, f.R)
    p1 = (c.g1_mul(c.G1_GEN, a), c.g2_mul(c.G2_GEN, b))
    p2 = (c.g1_mul(c.G1_GEN, a * b % f.R), c.G2_GEN)
    assert pr.verify_pairings(p1, p2)
    p3 = (c.g1_mul(c.G1_GEN, a * b % f.R + 1), c.G2_GEN)
    assert not pr.verify_pairings(p1, p3)
