"""Fixed-base comb commitment (curves/comb.py) vs the oracle.

Covers the table build (entry-by-entry against oracle scalar multiples),
the column digit extraction (exact scalar reconstruction), the XLA
chain-sum commit path against both the oracle MSM and the generic
windowed MSM, and (opt-in) the Pallas chain-sum kernel in interpret mode
against the XLA fallback.
"""

import os
import random

import numpy as np
import pytest
import jax.numpy as jnp

from kateth_tpu.curves import comb, g1, msm, ops, pallas_msm
from kateth_tpu.fields.specs import FP, FR
from kateth_tpu.oracle import curve as oc
from kateth_tpu.oracle import field as of
from kateth_tpu.oracle.kzg import OracleSetup

rng = random.Random(0xC0B)
F1 = ops.FP_FIELD

N = 8
H = 4
D_COLS = comb.comb_dims(H)


@pytest.fixture(scope="module")
def osetup():
    return OracleSetup.generate_insecure(N, g2_len=2)


@pytest.fixture(scope="module")
def points(osetup):
    return tuple(jnp.asarray(c) for c in g1.from_oracle(osetup.g1_lagrange_brp))


@pytest.fixture(scope="module")
def table(points):
    return comb.build_table(F1, points, H)


def scalars_planes(vals):
    return jnp.asarray(np.stack([FR.from_int(v, mont=False) for v in vals]))


def test_column_digits_reconstruct():
    """sum_t 2^t * sum_k col_bit_k 2^(k*d) recovers the scalar exactly."""
    vals = [rng.randrange(of.R) for _ in range(5)]
    cols = np.asarray(comb.column_digits(scalars_planes(vals), H, D_COLS))
    assert cols.shape == (D_COLS, 5)
    for lane, v in enumerate(vals):
        acc = 0
        for t in range(D_COLS):
            j = int(cols[t, lane])
            acc += sum(((j >> k) & 1) << (t + k * D_COLS) for k in range(H))
        assert acc == v


def test_table_entries_match_oracle(osetup, table):
    """T[i][j] = sum_k j_k * 2^(k*d) * P_i, spot-checked in affine."""
    tx, ty = (np.asarray(c) for c in table)
    assert tx.shape == ty.shape == (N << H, FP.n_digits)
    for _ in range(12):
        i = rng.randrange(N)
        j = rng.randrange(1 << H)
        want = oc.g1_infinity()
        for k in range(H):
            if (j >> k) & 1:
                want = oc.g1_add(
                    want,
                    oc.g1_mul(osetup.g1_lagrange_brp[i], 1 << (k * D_COLS)),
                )
        r = (i << H) + j
        if j == 0:
            assert (tx[r] == 0).all()
            assert (ty[r] == np.asarray(FP.one_mont)).all()
            continue
        x = FP.to_int(tx[r], mont=True)
        y = FP.to_int(ty[r], mont=True)
        wx, wy = oc.g1_to_affine(want)
        assert (x, y) == (wx, wy), f"table entry ({i},{j}) mismatch"


def test_commit_matches_oracle(osetup, points, table):
    vals = [[rng.randrange(of.R) for _ in range(N)] for _ in range(3)]
    vals[1][0] = 0  # a zero scalar (identity columns everywhere for it)
    sc = jnp.asarray(
        np.stack([np.stack([FR.from_int(v, mont=False) for v in row]) for row in vals])
    )
    got = comb.commit(F1, table, sc, H, N)
    want_msm = msm.msm(F1, points, sc)
    same = np.asarray(ops.peq(F1, got, want_msm))
    assert same.all(), "comb commit != windowed MSM"
    for b in range(3):
        gb = g1.to_oracle(tuple(np.asarray(c)[b][None] for c in got))[0]
        want = oc.g1_msm(osetup.g1_lagrange_brp, vals[b])
        assert oc.g1_eq(gb, want), f"comb commit lane {b} != oracle"


def test_commit_zero_scalars(points, table):
    sc = jnp.zeros((2, N, 16), dtype=jnp.uint32)
    got = comb.commit(F1, table, sc, H, N)
    z = np.asarray(got[2])
    assert (z == 0).all(), "zero scalars must commit to the identity"


def test_api_commit_uses_comb(osetup):
    """The API path with comb enabled is bit-identical to the oracle and
    to the same API with the comb disabled."""
    from kateth_tpu.kzg import Kzg, KzgConfig, DeviceSetup
    from kateth_tpu.oracle.kzg import blob_to_bytes

    cfg = KzgConfig(n=N, g2_len=2, comb_h=H)
    kzg = Kzg(DeviceSetup.from_oracle(osetup, cfg))
    blobs = [
        blob_to_bytes([rng.randrange(of.R) for _ in range(N)]) for _ in range(2)
    ]
    got = kzg.blobs_to_kzg_commitments(blobs)
    want = [osetup.blob_to_commitment(b) for b in blobs]
    assert got == want
    os.environ["KATETH_NO_COMB"] = "1"
    try:
        kzg2 = Kzg(DeviceSetup.from_oracle(osetup, cfg))
        assert kzg2.blobs_to_kzg_commitments(blobs) == want
    finally:
        del os.environ["KATETH_NO_COMB"]


@pytest.mark.skipif(
    os.environ.get("KATETH_INTERPRET_TESTS") != "1",
    reason="interpret-mode kernel tests are opt-in (KATETH_INTERPRET_TESTS=1)",
)
def test_chain_sum_kernel_matches_xla(monkeypatch):
    """The Pallas comb chain-sum kernel (interpret mode) against the XLA
    fallback, including identity flags and repeated points.

    Runs the kernel at chain length g=8: the per-step mixed-add math and
    the (k, digit) row layout are parametric in g, and the g=32
    production instantiation's interpret-mode compile exceeds this 1-core
    box's budget (>50 min).  The g=32 body is validated bit-exact against
    the host oracle on real TPU hardware by tools/comb_check.py."""
    monkeypatch.setenv("KATETH_PALLAS_INTERPRET", "1")
    g = 8
    n, B = 64, 64  # lanes = B * n/g = 512 = one tile
    base = [oc.g1_mul(oc.G1_GEN, rng.randrange(1, of.R)) for _ in range(8)]
    aff = [oc.g1_to_affine(p) for p in (base * 8)[:n]]
    one_arr = np.asarray(FP.one_mont, dtype=np.uint32)
    flags_np = (np.random.default_rng(3).random((B, n)) > 0.25).astype(np.uint32)
    flags_np[:, 0] = 0  # guaranteed identity lanes
    x_one = np.stack([FP.from_int(x) for (x, _) in aff])
    y_one = np.stack([FP.from_int(y) for (_, y) in aff])
    xs = np.broadcast_to(x_one, (B, n, 24)).copy()
    ys = np.broadcast_to(y_one, (B, n, 24)).copy()
    # identity rows where flag == 0, as the table stores them
    xs = np.where(flags_np[..., None] > 0, xs, 0).astype(np.uint32)
    ys = np.where(flags_np[..., None] > 0, ys, one_arr).astype(np.uint32)
    xs, ys, flags = jnp.asarray(xs), jnp.asarray(ys), jnp.asarray(flags_np)

    assert pallas_msm.comb_available(n, B, g)
    chains = pallas_msm.comb_chain_sum(xs, ys, flags, g)
    got = comb._sum_halving(F1, chains, axis=1)
    want = comb._chain_sum_xla(F1, xs, ys, flags)
    same = np.asarray(ops.peq(F1, got, want))
    assert same.shape == (B,)
    assert same.all()
