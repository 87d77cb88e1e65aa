"""Consensus-spec-style vector runner for the DEVICE pipeline.

Mirrors the reference's six integration tests (reference
src/kzg/setup.rs:278-464 iterating consensus-spec-tests via the typed
decoders in src/kzg/spec.rs): a case with `output: null` must be REJECTED
(KzgError), otherwise the byte-exact output (or boolean) must match.

The vendored vectors under tests/vectors/ are mainnet-shaped (4096
elements), which only runs acceptably on real TPU hardware — these tests
are skipped unless KATETH_MAINNET_TESTS=1 (the driver's bench.py performs
an equivalent bit-exactness self-check on the TPU every round).

OFFICIAL FIXTURES: set KATETH_SPEC_FIXTURES to a checkout of
ethereum/consensus-spec-tests' `tests/general/deneb/kzg` directory and
every `<op>/kzg-mainnet/*/data.yaml` case is parametrized IN ADDITION to
the vendored vectors (reference path template: setup.rs:305-317).  This
box has no network egress, so CI fetches them (see the `spec-vectors`
job in .github/workflows/ci.yaml); tests/test_setup_relation.py provides
the local-only external ground truth.
"""

from __future__ import annotations

import os

import pytest
import yaml

VECTOR_ROOT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "vectors")
OFFICIAL_ROOT = os.environ.get("KATETH_SPEC_FIXTURES", "")

pytestmark = pytest.mark.skipif(
    os.environ.get("KATETH_MAINNET_TESTS") != "1",
    reason="mainnet-size vectors need real TPU (set KATETH_MAINNET_TESTS=1)",
)


def _collect(root: str, prefix: str):
    if not root or not os.path.isdir(root):
        return []
    out = []
    for name in sorted(os.listdir(root)):
        path = os.path.join(root, name, "data.yaml")
        if os.path.exists(path):
            with open(path) as f:
                out.append(pytest.param(yaml.safe_load(f), id=f"{prefix}{name}"))
    return out


def cases(op: str):
    out = _collect(os.path.join(VECTOR_ROOT, op), "")
    # official consensus-spec-tests layout: <op>/kzg-mainnet/<case>/data.yaml
    out += _collect(os.path.join(OFFICIAL_ROOT, op, "kzg-mainnet"), "official-")
    return out


def unhex(h):
    return bytes.fromhex(h[2:] if h.startswith("0x") else h)


@pytest.fixture(scope="module")
def kzg():
    from kateth_tpu.kzg import Kzg

    from kateth_tpu.kzg.setup import DEFAULT_TRUSTED_SETUP

    return Kzg.load_json(DEFAULT_TRUSTED_SETUP)


def run_rejecting(case, fn):
    from kateth_tpu.kzg import KzgError

    if case["output"] is None:
        with pytest.raises((KzgError, ValueError)):
            fn()
    else:
        return fn()


@pytest.mark.parametrize("case", cases("blob_to_kzg_commitment"))
def test_blob_to_kzg_commitment(kzg, case):
    got = run_rejecting(case, lambda: kzg.blob_to_kzg_commitment(unhex(case["input"]["blob"])))
    if case["output"] is not None:
        assert got == unhex(case["output"])


@pytest.mark.parametrize("case", cases("compute_kzg_proof"))
def test_compute_kzg_proof(kzg, case):
    got = run_rejecting(
        case,
        lambda: kzg.compute_kzg_proof(unhex(case["input"]["blob"]), unhex(case["input"]["z"])),
    )
    if case["output"] is not None:
        proof, y = got
        assert proof == unhex(case["output"][0]) and y == unhex(case["output"][1])


@pytest.mark.parametrize("case", cases("compute_blob_kzg_proof"))
def test_compute_blob_kzg_proof(kzg, case):
    got = run_rejecting(
        case,
        lambda: kzg.compute_blob_kzg_proof(
            unhex(case["input"]["blob"]), unhex(case["input"]["commitment"])
        ),
    )
    if case["output"] is not None:
        assert got == unhex(case["output"])


@pytest.mark.parametrize("case", cases("verify_kzg_proof"))
def test_verify_kzg_proof(kzg, case):
    i = case["input"]
    got = run_rejecting(
        case,
        lambda: kzg.verify_kzg_proof(
            unhex(i["proof"]), unhex(i["commitment"]), unhex(i["z"]), unhex(i["y"])
        ),
    )
    if case["output"] is not None:
        assert got is case["output"]


@pytest.mark.parametrize("case", cases("verify_blob_kzg_proof"))
def test_verify_blob_kzg_proof(kzg, case):
    i = case["input"]
    got = run_rejecting(
        case,
        lambda: kzg.verify_blob_kzg_proof(
            unhex(i["blob"]), unhex(i["commitment"]), unhex(i["proof"])
        ),
    )
    if case["output"] is not None:
        assert got is case["output"]


@pytest.mark.parametrize("case", cases("verify_blob_kzg_proof_batch"))
def test_verify_blob_kzg_proof_batch(kzg, case):
    i = case["input"]
    got = run_rejecting(
        case,
        lambda: kzg.verify_blob_kzg_proof_batch(
            [unhex(b) for b in i["blobs"]],
            [unhex(c) for c in i["commitments"]],
            [unhex(p) for p in i["proofs"]],
        ),
    )
    if case["output"] is not None:
        assert got is case["output"]
