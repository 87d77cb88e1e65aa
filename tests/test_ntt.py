"""NTT kernels vs a naive oracle DFT."""

import random

import numpy as np
import jax
import jax.numpy as jnp

from kateth_tpu import ntt
from kateth_tpu.fields import limbs as L
from kateth_tpu.fields.specs import FR
from kateth_tpu.oracle.field import R
from kateth_tpu.oracle.kzg import bit_reversal_permutation, compute_roots_of_unity

rng = random.Random(0x4E5454)

N = 16


def to_mont_planes(vals):
    return jnp.asarray(np.stack([FR.from_int(v) for v in vals]))


def from_mont_planes(x):
    x = np.asarray(x)
    return [FR.to_int(x[i]) for i in range(x.shape[0])]


def naive_eval(coeffs, x):
    acc = 0
    for c in reversed(coeffs):
        acc = (acc * x + c) % R
    return acc


def test_forward_matches_naive_dft():
    coeffs = [rng.randrange(R) for _ in range(N)]
    roots = compute_roots_of_unity(N)
    out = jax.jit(ntt.monomial_to_lagrange_brp)(to_mont_planes(coeffs))
    got = from_mont_planes(out)
    want = bit_reversal_permutation([naive_eval(coeffs, w) for w in roots])
    assert got == want


def test_roundtrip():
    evals = [rng.randrange(R) for _ in range(N)]
    x = to_mont_planes(evals)
    coeffs = jax.jit(ntt.lagrange_brp_to_monomial)(x)
    back = jax.jit(ntt.monomial_to_lagrange_brp)(coeffs)
    assert from_mont_planes(back) == evals


def test_batched():
    batch = [[rng.randrange(R) for _ in range(N)] for _ in range(3)]
    x = jnp.stack([to_mont_planes(b) for b in batch])
    out = jax.jit(ntt.monomial_to_lagrange_brp)(x)
    roots = compute_roots_of_unity(N)
    for i, coeffs in enumerate(batch):
        want = bit_reversal_permutation([naive_eval(coeffs, w) for w in roots])
        assert from_mont_planes(out[i]) == want
