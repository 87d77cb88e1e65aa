"""Pippenger MSM kernel vs the oracle (reference lincomb_pippenger,
src/bls.rs:415-437, and naive lincomb, bls.rs:406-413)."""

import random

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from kateth_tpu.curves import g1, msm, ops
from kateth_tpu.fields.specs import FR
from kateth_tpu.oracle import curve as oc
from kateth_tpu.oracle import field as of

rng = random.Random(0x4D534D)

F = ops.FP_FIELD


def fr_digits(vals):
    return jnp.asarray(np.stack([FR.from_int(v, mont=False) for v in vals]))


def dev_points(pts):
    return tuple(jnp.asarray(a) for a in g1.from_oracle(pts))


@pytest.mark.parametrize("n", [1, 3, 8])
def test_msm_small(n):
    pts = [oc.g1_mul(oc.G1_GEN, rng.randrange(of.R)) for _ in range(n)]
    ks = [rng.randrange(of.R) for _ in range(n)]
    expect = oc.g1_msm(pts, ks)
    out = g1.to_oracle(jax.jit(lambda p, s: msm.msm(F, p, s))(dev_points(pts), fr_digits(ks)))[0]
    assert oc.g1_eq(out, expect)


def test_msm_edge_scalars():
    """zeros, ones, r-1, identical digits, infinity points."""
    pts = [oc.g1_mul(oc.G1_GEN, rng.randrange(of.R)) for _ in range(6)]
    pts.append(oc.g1_infinity())
    ks = [0, 1, of.R - 1, 0xFF, (1 << 255) % of.R, rng.randrange(of.R), 5]
    expect = oc.g1_msm(pts, ks)
    out = g1.to_oracle(jax.jit(lambda p, s: msm.msm(F, p, s))(dev_points(pts), fr_digits(ks)))[0]
    assert oc.g1_eq(out, expect)


def test_msm_128():
    n = 128
    pts = [oc.g1_mul(oc.G1_GEN, rng.randrange(of.R)) for _ in range(n)]
    ks = [rng.randrange(of.R) for _ in range(n)]
    expect = oc.g1_msm(pts, ks)
    out = g1.to_oracle(jax.jit(lambda p, s: msm.msm(F, p, s))(dev_points(pts), fr_digits(ks)))[0]
    assert oc.g1_eq(out, expect)


def test_lincomb_small():
    n = 4
    pts = [oc.g1_mul(oc.G1_GEN, rng.randrange(of.R)) for _ in range(n)]
    ks = [rng.randrange(of.R) for _ in range(n)]
    expect = oc.g1_msm(pts, ks)
    out = g1.to_oracle(
        jax.jit(lambda p, s: msm.lincomb_small(F, p, s))(dev_points(pts), fr_digits(ks))
    )[0]
    assert oc.g1_eq(out, expect)


def test_tree_sum_non_pow2():
    pts = [oc.g1_mul(oc.G1_GEN, rng.randrange(of.R)) for _ in range(5)]
    expect = pts[0]
    for p in pts[1:]:
        expect = oc.g1_add(expect, p)
    out = g1.to_oracle(jax.jit(lambda p: msm.tree_sum(F, p))(dev_points(pts)))[0]
    assert oc.g1_eq(out, expect)
