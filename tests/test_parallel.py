"""Sharded execution on the 8-device virtual CPU mesh.

The deterministic-output requirement across shardings (SURVEY §5: same
bits on 1 chip vs N) is the distributed correctness bar: every sharded
result must be byte-identical to the single-device kernel's.
"""

import random

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from kateth_tpu.curves import g1, msm, ops
from kateth_tpu.fields.specs import FR
from kateth_tpu.oracle import curve as oc
from kateth_tpu.oracle import field as of
from kateth_tpu.parallel import (
    make_mesh,
    sharded_msm,
    sharded_commit,
    sharded_commit_comb,
)

rng = random.Random(0x6D657368)

F = ops.FP_FIELD
N = 32
WINDOW = 4


@pytest.fixture(scope="module")
def data():
    pts = [oc.g1_mul(oc.G1_GEN, rng.randrange(of.R)) for _ in range(N)]
    ks = [rng.randrange(of.R) for _ in range(N)]
    dev_pts = tuple(jnp.asarray(a) for a in g1.from_oracle(pts))
    scal = jnp.asarray(np.stack([FR.from_int(v, mont=False) for v in ks]))
    return pts, ks, dev_pts, scal


def test_sharded_msm_matches_single_device(data):
    pts, ks, dev_pts, scal = data
    mesh = make_mesh(jax.devices()[:8])
    out = sharded_msm(mesh, dev_pts, scal, window=WINDOW)
    expect = oc.g1_msm(pts, ks)
    got = g1.to_oracle(tuple(np.asarray(c) for c in out))[0]
    assert oc.g1_eq(got, expect)


def test_sharded_commit_matches_oracle(data):
    pts, ks, dev_pts, scal = data
    mesh = make_mesh(jax.devices()[:8])
    batch = jnp.stack([scal, scal[::-1]])
    # pad batch to mesh size
    batch8 = jnp.concatenate([batch] * 4, axis=0)
    out = sharded_commit(mesh, dev_pts, batch8, window=WINDOW)
    got = g1.to_oracle(tuple(np.asarray(c) for c in out))
    expect0 = oc.g1_msm(pts, ks)
    expect1 = oc.g1_msm(pts, ks[::-1])
    for i in range(8):
        assert oc.g1_eq(got[i], expect0 if i % 2 == 0 else expect1)


def test_sharded_commit_comb_matches_oracle(data):
    """DP comb commit (table replicated, batch sharded) — bit-identical
    to the single-device comb and correct vs the oracle."""
    from kateth_tpu.curves import comb

    pts, ks, dev_pts, scal = data
    H = 4
    table = comb.build_table(F, dev_pts, H)
    mesh = make_mesh(jax.devices()[:8])
    batch = jnp.stack([scal, scal[::-1]])
    batch8 = jnp.concatenate([batch] * 4, axis=0)
    out = sharded_commit_comb(mesh, table, batch8, H)
    single = comb.commit(F, table, batch8, H, N)
    assert all(
        (np.asarray(a) == np.asarray(b)).all() for a, b in zip(out, single)
    ), "sharded comb commit != single-device comb commit (bitwise)"
    got = g1.to_oracle(tuple(np.asarray(c) for c in out))
    expect0 = oc.g1_msm(pts, ks)
    expect1 = oc.g1_msm(pts, ks[::-1])
    for i in range(8):
        assert oc.g1_eq(got[i], expect0 if i % 2 == 0 else expect1)


def test_mesh_sizes(data):
    """Same program on 1, 2, 4 device meshes -> identical results."""
    pts, ks, dev_pts, scal = data
    results = []
    for nd in (1, 2, 4):
        mesh = make_mesh(jax.devices()[:nd])
        out = sharded_msm(mesh, dev_pts, scal, window=WINDOW)
        results.append(tuple(np.asarray(c) for c in out))
    expect = oc.g1_msm(pts, ks)
    for r in results:
        assert oc.g1_eq(g1.to_oracle(r)[0], expect)


def test_sharded_ntt_matches_single_device():
    from kateth_tpu import ntt as ntt_mod
    from kateth_tpu.parallel.ntt import sharded_ntt_natural

    # n = 256 with P = 8 gives B/P = 4 > 1, exercising the cross-device
    # column reorder the old b == p case couldn't see
    n = 256
    vals = [rng.randrange(of.R) for _ in range(n)]
    x = jnp.asarray(np.stack([FR.from_int(v) for v in vals]))  # Montgomery
    mesh = make_mesh(jax.devices()[:8])
    got = sharded_ntt_natural(mesh, x)
    want = ntt_mod.ntt_mont(x)
    assert np.array_equal(np.asarray(got), np.asarray(want))
    # inverse roundtrip through the distributed path
    back = sharded_ntt_natural(mesh, got, inverse=True)
    assert np.array_equal(np.asarray(back), np.asarray(x))


def test_sharded_ntt_batched():
    from kateth_tpu import ntt as ntt_mod
    from kateth_tpu.parallel.ntt import sharded_ntt

    n, batch = 128, 3
    x = jnp.asarray(
        np.stack(
            [
                np.stack([FR.from_int(rng.randrange(of.R)) for _ in range(n)])
                for _ in range(batch)
            ]
        )
    )
    mesh = make_mesh(jax.devices()[:8])
    got = sharded_ntt(mesh, x)
    want = ntt_mod.ntt_mont(x)
    assert np.array_equal(np.asarray(got), np.asarray(want))


def test_sharded_ntt_from_brp_matches_blob_path():
    """The BRP-input distributed NTT == the single-device monomial
    conversion used by Kzg.blobs_to_coefficients (natural output, no
    host permutation anywhere)."""
    from kateth_tpu import ntt as ntt_mod
    from kateth_tpu.parallel.ntt import sharded_ntt_from_brp

    n, batch = 256, 2
    x = jnp.asarray(
        np.stack(
            [
                np.stack([FR.from_int(rng.randrange(of.R)) for _ in range(n)])
                for _ in range(batch)
            ]
        )
    )
    mesh = make_mesh(jax.devices()[:8])
    got = sharded_ntt_from_brp(mesh, x, inverse=True)
    want = ntt_mod.lagrange_brp_to_monomial(x)
    assert np.array_equal(np.asarray(got), np.asarray(want))
