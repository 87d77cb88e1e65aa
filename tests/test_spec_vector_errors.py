"""Mainnet-shape validation-error vectors on CPU.

The full vector set needs TPU (or KATETH_MAINNET_TESTS=1 patience) for
the compute-heavy happy paths, but every `output: null` case for the
compute ops and the single-point verify rejects BEFORE the heavy device
graphs run (blob decode / host point decode / length checks), so they
are cheap at mainnet shape and run unconditionally here.  This closes
the round-1 gap where no mainnet-size rejection logic ran in CI.

The batch-verify error cases stay TPU-gated: the fused device program
surfaces validity masks only after the full pipeline.
"""

from __future__ import annotations

import os

import pytest

from test_spec_vectors import cases, unhex  # reuse the loader

pytestmark = []  # explicitly NOT gated on KATETH_MAINNET_TESTS


def error_cases(op: str):
    return [c for c in cases(op) if c.values[0]["output"] is None]


@pytest.fixture(scope="module")
def kzg():
    from kateth_tpu.kzg import Kzg
    from kateth_tpu.kzg.setup import DEFAULT_TRUSTED_SETUP

    return Kzg.load_json(DEFAULT_TRUSTED_SETUP)


def assert_rejects(fn):
    from kateth_tpu.kzg import KzgError

    with pytest.raises((KzgError, ValueError)):
        fn()


@pytest.mark.parametrize("case", error_cases("blob_to_kzg_commitment"))
def test_commitment_rejects(kzg, case):
    assert_rejects(lambda: kzg.blob_to_kzg_commitment(unhex(case["input"]["blob"])))


@pytest.mark.parametrize("case", error_cases("compute_kzg_proof"))
def test_compute_proof_rejects(kzg, case):
    assert_rejects(
        lambda: kzg.compute_kzg_proof(
            unhex(case["input"]["blob"]), unhex(case["input"]["z"])
        )
    )


@pytest.mark.parametrize("case", error_cases("compute_blob_kzg_proof"))
def test_compute_blob_proof_rejects(kzg, case):
    assert_rejects(
        lambda: kzg.compute_blob_kzg_proof(
            unhex(case["input"]["blob"]), unhex(case["input"]["commitment"])
        )
    )


@pytest.mark.parametrize("case", error_cases("verify_kzg_proof"))
def test_verify_proof_rejects(kzg, case):
    i = case["input"]
    assert_rejects(
        lambda: kzg.verify_kzg_proof(
            unhex(i["proof"]), unhex(i["commitment"]), unhex(i["z"]), unhex(i["y"])
        )
    )
