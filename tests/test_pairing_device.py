"""Device pairing vs the oracle.

Individual Miller values are only defined up to exponentiation-killed
factors (twisted-line scaling, see kateth_tpu/pairing.py docstring), so
the oracle comparisons happen (a) on final_exponentiation as a standalone
map, which is bit-exact, and (b) on the verify_pairings boolean across
true/false/edge cases.
"""

import random

import numpy as np
import jax
import jax.numpy as jnp

from kateth_tpu import pairing
from kateth_tpu.fields import fp12
from kateth_tpu.curves import g1, g2
from kateth_tpu.oracle import curve as oc
from kateth_tpu.oracle import field as of
from kateth_tpu.oracle import pairing as op

rng = random.Random(0x70616972)


def rand_fp12():
    def rand_fp6():
        return tuple((rng.randrange(of.P), rng.randrange(of.P)) for _ in range(3))

    return (rand_fp6(), rand_fp6())


def dev12(vals):
    return jnp.asarray(np.stack([fp12.from_ints(v) for v in vals]))


def dev_g1(pts):
    return tuple(jnp.asarray(a) for a in g1.from_oracle(pts))


def dev_g2(pts):
    return tuple(jnp.asarray(a) for a in g2.from_oracle(pts))


def test_final_exponentiation_matches_oracle():
    vals = [rand_fp12() for _ in range(2)]
    out = jax.jit(pairing.final_exponentiation)(dev12(vals))
    for i, v in enumerate(vals):
        assert fp12.to_ints(np.asarray(out)[i]) == op.final_exponentiation(v)


def test_verify_pairings_bilinear():
    """e(aP, Q) == e(P, aQ) must verify; mismatched scalars must not."""
    a = rng.randrange(1, of.R)
    p1 = oc.g1_mul(oc.G1_GEN, rng.randrange(1, of.R))
    q2 = oc.g2_mul(oc.G2_GEN, rng.randrange(1, of.R))
    ap1 = oc.g1_mul(p1, a)
    aq2 = oc.g2_mul(q2, a)

    f = jax.jit(pairing.verify_pairings)
    good = f((dev_g1([ap1]), dev_g2([q2])), (dev_g1([p1]), dev_g2([aq2])))
    assert bool(np.asarray(good)[0]) is True
    bad = f((dev_g1([ap1]), dev_g2([q2])), (dev_g1([p1]), dev_g2([q2])))
    assert bool(np.asarray(bad)[0]) is False


def test_verify_pairings_infinity():
    """Both sides at infinity: e(0, Q) == e(0, Q2) -> 1 == 1 -> True
    (blst semantics: infinity Miller value is one)."""
    inf1 = oc.g1_infinity()
    q2 = oc.g2_mul(oc.G2_GEN, 7)
    f = jax.jit(pairing.verify_pairings)
    out = f((dev_g1([inf1]), dev_g2([q2])), (dev_g1([inf1]), dev_g2([oc.G2_GEN])))
    assert bool(np.asarray(out)[0]) is True
