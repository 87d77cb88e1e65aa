"""Device Fp6/Fp12 tower vs the pure-Python oracle."""

import random

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from kateth_tpu.fields import fp6, fp12
from kateth_tpu.oracle import field as of

rng = random.Random(0x70776572)


def rand_fp2():
    return (rng.randrange(of.P), rng.randrange(of.P))


def rand_fp6():
    return (rand_fp2(), rand_fp2(), rand_fp2())


def rand_fp12():
    return (rand_fp6(), rand_fp6())


def dev6(vals):
    return jnp.asarray(np.stack([fp6.from_ints(v) for v in vals]))


def dev12(vals):
    return jnp.asarray(np.stack([fp12.from_ints(v) for v in vals]))


class TestFp6:
    def test_mul(self):
        a = [rand_fp6() for _ in range(4)]
        b = [rand_fp6() for _ in range(4)]
        out = jax.jit(fp6.mul)(dev6(a), dev6(b))
        for i in range(4):
            assert fp6.to_ints(np.asarray(out)[i]) == of.fp6_mul(a[i], b[i])

    def test_inv(self):
        a = [rand_fp6() for _ in range(2)]
        out = jax.jit(fp6.inv)(dev6(a))
        for i in range(2):
            assert fp6.to_ints(np.asarray(out)[i]) == of.fp6_inv(a[i])

    def test_mul_by_v(self):
        a = [rand_fp6() for _ in range(2)]
        out = jax.jit(fp6.mul_by_v)(dev6(a))
        for i in range(2):
            assert fp6.to_ints(np.asarray(out)[i]) == of.fp6_mul_by_v(a[i])


class TestFp12:
    def test_mul(self):
        a = [rand_fp12() for _ in range(3)]
        b = [rand_fp12() for _ in range(3)]
        out = jax.jit(fp12.mul)(dev12(a), dev12(b))
        for i in range(3):
            assert fp12.to_ints(np.asarray(out)[i]) == of.fp12_mul(a[i], b[i])

    def test_sqr(self):
        a = [rand_fp12() for _ in range(3)]
        out = jax.jit(fp12.sqr)(dev12(a))
        for i in range(3):
            assert fp12.to_ints(np.asarray(out)[i]) == of.fp12_sqr(a[i])

    def test_inv(self):
        a = [rand_fp12() for _ in range(2)]
        out = jax.jit(fp12.inv)(dev12(a))
        for i in range(2):
            assert fp12.to_ints(np.asarray(out)[i]) == of.fp12_inv(a[i])

    def test_conj_frob(self):
        a = [rand_fp12() for _ in range(2)]
        d = dev12(a)
        outc = jax.jit(fp12.conj)(d)
        outf = jax.jit(fp12.frob)(d)
        for i in range(2):
            assert fp12.to_ints(np.asarray(outc)[i]) == of.fp12_conj(a[i])
            assert fp12.to_ints(np.asarray(outf)[i]) == of.fp12_frob(a[i])

    def test_pow_const(self):
        a = [rand_fp12() for _ in range(2)]
        e = 0xD201000000010000
        out = jax.jit(lambda x: fp12.pow_const(x, e))(dev12(a))
        for i in range(2):
            assert fp12.to_ints(np.asarray(out)[i]) == of.fp12_pow(a[i], e)

    def test_is_one(self):
        one = of.FP12_ONE
        a = rand_fp12()
        out = jax.jit(fp12.is_one)(dev12([one, a]))
        assert bool(out[0]) and not bool(out[1])
