"""Device limb arithmetic vs the big-int oracle (fuzz + edge cases)."""

import random

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from kateth_tpu.fields import FP, FR
from kateth_tpu.fields import limbs as L

rng = random.Random(0x11B5)

# jitted wrappers (spec and other non-array params are static)
j_add = jax.jit(L.add, static_argnums=0)
j_sub = jax.jit(L.sub, static_argnums=0)
j_neg = jax.jit(L.neg, static_argnums=0)
j_mul = jax.jit(L.mont_mul, static_argnums=0)
j_to_mont = jax.jit(L.to_mont, static_argnums=0)
j_from_mont = jax.jit(L.from_mont, static_argnums=0)
j_inv = jax.jit(L.inv, static_argnums=0)
j_batch_inv = jax.jit(L.batch_inv, static_argnums=(0, 2))
j_pow = jax.jit(L.pow_const, static_argnums=(0, 2))
j_mul_small = jax.jit(L.mul_small, static_argnums=(0, 2))


def rand_batch(spec, n, mont=True):
    """Random field elements: (ints, digit array in Montgomery form)."""
    vals = [rng.randrange(spec.modulus) for _ in range(n)]
    arr = np.stack([spec.from_int(v, mont=mont) for v in vals])
    return vals, jnp.asarray(arr)


def to_ints(spec, arr, mont=True):
    return [spec.to_int(np.asarray(arr)[i], mont=mont) for i in range(arr.shape[0])]


@pytest.mark.parametrize("spec", [FR, FP], ids=["fr", "fp"])
class TestFieldOps:
    N = 64

    def test_codec_roundtrip(self, spec):
        vals, arr = rand_batch(spec, self.N)
        assert to_ints(spec, arr) == vals

    def test_add(self, spec):
        a_vals, a = rand_batch(spec, self.N)
        b_vals, b = rand_batch(spec, self.N)
        out = to_ints(spec, j_add(spec, a, b))
        assert out == [(x + y) % spec.modulus for x, y in zip(a_vals, b_vals)]

    def test_add_edge(self, spec):
        m = spec.modulus
        for x, y in [(m - 1, 1), (m - 1, m - 1), (0, 0), (1, m - 2)]:
            a = jnp.asarray(spec.from_int(x)[None])
            b = jnp.asarray(spec.from_int(y)[None])
            assert to_ints(spec, j_add(spec, a, b)) == [(x + y) % m]

    def test_sub(self, spec):
        a_vals, a = rand_batch(spec, self.N)
        b_vals, b = rand_batch(spec, self.N)
        out = to_ints(spec, j_sub(spec, a, b))
        assert out == [(x - y) % spec.modulus for x, y in zip(a_vals, b_vals)]

    def test_neg(self, spec):
        a_vals, a = rand_batch(spec, self.N)
        out = to_ints(spec, j_neg(spec, a))
        assert out == [-x % spec.modulus for x in a_vals]
        z = jnp.asarray(spec.from_int(0)[None])
        assert to_ints(spec, j_neg(spec, z)) == [0]

    def test_mont_mul(self, spec):
        a_vals, a = rand_batch(spec, self.N)
        b_vals, b = rand_batch(spec, self.N)
        out = to_ints(spec, j_mul(spec, a, b))
        assert out == [x * y % spec.modulus for x, y in zip(a_vals, b_vals)]

    def test_mont_mul_edge(self, spec):
        m = spec.modulus
        cases = [(m - 1, m - 1), (0, 12345), (1, m - 1), (m - 1, 1), (2, (m + 1) // 2)]
        for x, y in cases:
            a = jnp.asarray(spec.from_int(x)[None])
            b = jnp.asarray(spec.from_int(y)[None])
            assert to_ints(spec, j_mul(spec, a, b)) == [x * y % m]

    def test_mont_domain_conversion(self, spec):
        a_vals, a_plain = rand_batch(spec, 8, mont=False)
        a_mont = j_to_mont(spec, a_plain)
        assert to_ints(spec, a_mont) == a_vals  # to_int undoes Montgomery
        back = j_from_mont(spec, a_mont)
        assert to_ints(spec, back, mont=False) == a_vals

    def test_inv(self, spec):
        a_vals, a = rand_batch(spec, 4)
        out = to_ints(spec, j_inv(spec, a))
        assert out == [pow(x, -1, spec.modulus) for x in a_vals]

    def test_inv_zero(self, spec):
        z = jnp.asarray(spec.from_int(0)[None])
        assert to_ints(spec, j_inv(spec, z)) == [0]

    def test_batch_inv(self, spec):
        a_vals, a = rand_batch(spec, 32)
        a_vals[7] = 0
        a = a.at[7].set(jnp.asarray(spec.from_int(0)))
        out = to_ints(spec, j_batch_inv(spec, a, 0))
        expected = [pow(x, -1, spec.modulus) if x else 0 for x in a_vals]
        assert out == expected

    def test_pow_const(self, spec):
        a_vals, a = rand_batch(spec, 4)
        for e in [0, 1, 2, 3, 65537, spec.modulus - 2]:
            out = to_ints(spec, j_pow(spec, a, e))
            assert out == [pow(x, e, spec.modulus) for x in a_vals], e

    def test_mul_small(self, spec):
        a_vals, a = rand_batch(spec, 16)
        for k in [2, 3, 8, 12]:
            out = to_ints(spec, j_mul_small(spec, a, k))
            assert out == [x * k % spec.modulus for x in a_vals]

    def test_eq_iszero_canonical(self, spec):
        a_vals, a = rand_batch(spec, 8)
        assert bool(jnp.all(L.eq(a, a)))
        assert not bool(L.eq(a[0], a[1])) or a_vals[0] == a_vals[1]
        assert bool(L.is_zero(jnp.asarray(spec.from_int(0))))
        assert not bool(L.is_zero(a[0])) or a_vals[0] == 0

    def test_lt_modulus(self, spec):
        ok = jnp.asarray(L.int_to_digits(spec.modulus - 1, spec.n_digits))
        bad = jnp.asarray(L.int_to_digits(spec.modulus, spec.n_digits))
        assert bool(L.lt_modulus(spec, ok))
        assert not bool(L.lt_modulus(spec, bad))

    def test_byte_codec(self, spec):
        nbytes = spec.n_digits * 2
        raw = bytes(rng.randrange(256) for _ in range(nbytes))
        b = jnp.asarray(np.frombuffer(raw, dtype=np.uint8))
        d = L.be_bytes_to_digits(spec, b)
        assert L.digits_to_int(np.asarray(d)) == int.from_bytes(raw, "big")
        back = np.asarray(L.digits_to_be_bytes(spec, d))
        assert bytes(back.tolist()) == raw


def test_fuzz_mul_chain():
    """Long random op chains vs oracle (catches carry corner cases)."""
    spec = FP
    m = spec.modulus
    a_int = rng.randrange(m)
    a = jnp.asarray(spec.from_int(a_int)[None])
    for i in range(20):
        b_int = rng.randrange(m)
        b = jnp.asarray(spec.from_int(b_int)[None])
        op = i % 3
        if op == 0:
            a, a_int = j_mul(spec, a, b), a_int * b_int % m
        elif op == 1:
            a, a_int = j_add(spec, a, b), (a_int + b_int) % m
        else:
            a, a_int = j_sub(spec, a, b), (a_int - b_int) % m
    assert spec.to_int(np.asarray(a)[0]) == a_int
