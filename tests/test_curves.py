"""Device curve kernels vs the oracle: complete formulas, edge cases."""

import random

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from kateth_tpu.curves import g1, g2, ops
from kateth_tpu.fields.specs import FR
from kateth_tpu.oracle import curve as oc
from kateth_tpu.oracle import field as of

rng = random.Random(0x6331)

j_g1_add = jax.jit(g1.add)
j_g1_double = jax.jit(g1.double)
j_g1_smul = jax.jit(g1.scalar_mul)
j_g2_add = jax.jit(g2.add)
j_g2_double = jax.jit(g2.double)
j_g2_smul = jax.jit(g2.scalar_mul)


def rand_g1(n):
    return [oc.g1_mul(oc.G1_GEN, rng.randrange(of.R)) for _ in range(n)]


def rand_g2(n):
    return [oc.g2_mul(oc.G2_GEN, rng.randrange(of.R)) for _ in range(n)]


def fr_digits(vals):
    return jnp.asarray(np.stack([FR.from_int(v, mont=False) for v in vals]))


class TestG1:
    def test_roundtrip(self):
        pts = rand_g1(4) + [oc.g1_infinity()]
        dev = tuple(jnp.asarray(a) for a in g1.from_oracle(pts))
        back = g1.to_oracle(dev)
        for a, b in zip(pts, back):
            assert oc.g1_eq(a, b)

    def test_add_batch(self):
        ps = rand_g1(8)
        qs = rand_g1(8)
        dp = tuple(jnp.asarray(a) for a in g1.from_oracle(ps))
        dq = tuple(jnp.asarray(a) for a in g1.from_oracle(qs))
        out = g1.to_oracle(j_g1_add(dp, dq))
        for p, q, o in zip(ps, qs, out):
            assert oc.g1_eq(o, oc.g1_add(p, q))

    def test_add_edge_cases(self):
        """Complete formulas must handle identity, doubling, inverse pairs."""
        p = rand_g1(1)[0]
        cases = [
            (p, oc.g1_infinity()),
            (oc.g1_infinity(), p),
            (oc.g1_infinity(), oc.g1_infinity()),
            (p, p),
            (p, oc.g1_neg(p)),
        ]
        dp = tuple(jnp.asarray(a) for a in g1.from_oracle([a for a, _ in cases]))
        dq = tuple(jnp.asarray(a) for a in g1.from_oracle([b for _, b in cases]))
        out = g1.to_oracle(j_g1_add(dp, dq))
        for (a, b), o in zip(cases, out):
            assert oc.g1_eq(o, oc.g1_add(a, b))

    def test_double(self):
        pts = rand_g1(4) + [oc.g1_infinity()]
        dp = tuple(jnp.asarray(a) for a in g1.from_oracle(pts))
        out = g1.to_oracle(j_g1_double(dp))
        for p, o in zip(pts, out):
            assert oc.g1_eq(o, oc.g1_double(p))

    def test_scalar_mul(self):
        pts = rand_g1(3)
        ks = [rng.randrange(of.R), 0, 1]
        dp = tuple(jnp.asarray(a) for a in g1.from_oracle(pts))
        out = g1.to_oracle(j_g1_smul(dp, fr_digits(ks)))
        for p, k, o in zip(pts, ks, out):
            assert oc.g1_eq(o, oc.g1_mul(p, k))

    def test_on_curve_and_eq(self):
        pts = rand_g1(2)
        dp = tuple(jnp.asarray(a) for a in g1.from_oracle(pts))
        assert bool(jnp.all(ops.on_curve(ops.FP_FIELD, dp)))
        assert bool(jnp.all(g1.eq(dp, dp)))
        d2 = j_g1_double(dp)
        assert not bool(jnp.any(g1.eq(dp, d2)))


class TestG2:
    def test_add_batch(self):
        ps = rand_g2(3)
        qs = rand_g2(3)
        dp = tuple(jnp.asarray(a) for a in g2.from_oracle(ps))
        dq = tuple(jnp.asarray(a) for a in g2.from_oracle(qs))
        out = g2.to_oracle(j_g2_add(dp, dq))
        for p, q, o in zip(ps, qs, out):
            assert oc.g2_eq(o, oc.g2_add(p, q))

    def test_add_edge_cases(self):
        p = rand_g2(1)[0]
        cases = [
            (p, oc.g2_infinity()),
            (oc.g2_infinity(), oc.g2_infinity()),
            (p, p),
            (p, oc.g2_neg(p)),
        ]
        dp = tuple(jnp.asarray(a) for a in g2.from_oracle([a for a, _ in cases]))
        dq = tuple(jnp.asarray(a) for a in g2.from_oracle([b for _, b in cases]))
        out = g2.to_oracle(j_g2_add(dp, dq))
        for (a, b), o in zip(cases, out):
            assert oc.g2_eq(o, oc.g2_add(a, b))

    def test_scalar_mul(self):
        pts = rand_g2(2)
        ks = [rng.randrange(of.R), 12345]
        dp = tuple(jnp.asarray(a) for a in g2.from_oracle(pts))
        out = g2.to_oracle(j_g2_smul(dp, fr_digits(ks)))
        for p, k, o in zip(pts, ks, out):
            assert oc.g2_eq(o, oc.g2_mul(p, k))

    def test_on_curve(self):
        pts = rand_g2(2)
        dp = tuple(jnp.asarray(a) for a in g2.from_oracle(pts))
        assert bool(jnp.all(ops.on_curve(ops.FP2_FIELD, dp)))
