"""Oracle field-layer self-consistency tests."""

import random

from kateth_tpu.oracle import field as f

rng = random.Random(0xBE11)


def rand_fp():
    return rng.randrange(f.P)


def rand_fp2():
    return (rand_fp(), rand_fp())


def rand_fp6():
    return (rand_fp2(), rand_fp2(), rand_fp2())


def rand_fp12():
    return (rand_fp6(), rand_fp6())


def test_params_consistent():
    x = f.BLS_X
    assert f.R == x**4 - x**2 + 1
    assert f.P == (x - 1) ** 2 * f.R // 3 + x
    # r-1 2-adicity >= 12 needed for the 4096 evaluation domain
    assert (f.R - 1) % 4096 == 0


def test_fr_codec():
    assert f.fr_from_be_bytes(b"\x00" * 32) == 0
    assert f.fr_from_be_bytes((f.R - 1).to_bytes(32, "big")) == f.R - 1
    assert f.fr_from_be_bytes(f.R.to_bytes(32, "big")) is None
    assert f.fr_from_be_bytes(b"\xff" * 32) is None
    assert f.fr_from_be_bytes(b"\x00" * 31) is None
    v = rng.randrange(f.R)
    assert f.fr_from_be_bytes(f.fr_to_be_bytes(v)) == v


def test_fr_batch_inv():
    vals = [rng.randrange(1, f.R) for _ in range(50)] + [0, 0]
    rng.shuffle(vals)
    invs = f.fr_batch_inv(vals)
    for v, i in zip(vals, invs):
        if v == 0:
            assert i == 0
        else:
            assert v * i % f.R == 1


def test_fp_sqrt():
    for _ in range(10):
        a = rand_fp()
        s = f.fp_sqrt(a * a % f.P)
        assert s is not None and s * s % f.P == a * a % f.P


def test_fp2_mul_inv():
    for _ in range(10):
        a, b = rand_fp2(), rand_fp2()
        ab = f.fp2_mul(a, b)
        assert f.fp2_mul(ab, f.fp2_inv(b)) == tuple(x % f.P for x in a)
        assert f.fp2_sqr(a) == f.fp2_mul(a, a)


def test_fp2_sqrt():
    for _ in range(10):
        a = rand_fp2()
        sq = f.fp2_sqr(a)
        s = f.fp2_sqrt(sq)
        assert s is not None
        assert f.fp2_sqr(s) == sq


def test_fp6_mul_inv():
    a, b = rand_fp6(), rand_fp6()
    ab = f.fp6_mul(a, b)
    assert f.fp6_mul(ab, f.fp6_inv(b)) == f.fp6_mul(a, f.FP6_ONE)
    # associativity spot check
    c = rand_fp6()
    assert f.fp6_mul(f.fp6_mul(a, b), c) == f.fp6_mul(a, f.fp6_mul(b, c))


def test_fp12_mul_inv_pow():
    a, b = rand_fp12(), rand_fp12()
    ab = f.fp12_mul(a, b)
    assert f.fp12_mul(ab, f.fp12_inv(b)) == f.fp12_mul(a, f.FP12_ONE)
    assert f.fp12_sqr(a) == f.fp12_mul(a, a)
    assert f.fp12_mul(f.fp12_pow(a, 5), f.fp12_pow(a, 7)) == f.fp12_pow(a, 12)


def test_fp12_frobenius():
    """x -> x^p computed by Frobenius must equal direct exponentiation."""
    a = rand_fp12()
    assert f.fp12_frob(a) == f.fp12_pow(a, f.P)


def test_fp12_conj_is_frob6():
    a = rand_fp12()
    x = a
    for _ in range(6):
        x = f.fp12_frob(x)
    assert x == f.fp12_conj(a)
