"""Prove the KATETH_SPEC_FIXTURES integration seam BEFORE real fixtures
arrive (VERDICT r4 item 8).

Builds a synthetic directory in the exact consensus-spec-tests layout the
reference iterates (<op>/kzg-mainnet/<case>/data.yaml, reference
src/kzg/setup.rs:305-317), points the hook at it, and asserts the cases
are (a) COLLECTED by tests/test_spec_vectors.py's loader and (b) RUN
correctly by tools/spec_run.run_case — using a tiny insecure setup so the
whole round trip executes on CPU in the fast tier.
"""

from __future__ import annotations

import importlib.util
import os
import random
import sys

import pytest

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)

N = 8
rng = random.Random(0xF1C5)


@pytest.fixture(scope="module")
def kzg():
    from kateth_tpu.kzg import Kzg, KzgConfig, DeviceSetup
    from kateth_tpu.oracle.kzg import OracleSetup

    osetup = OracleSetup.generate_insecure(N, g2_len=2)
    return Kzg(DeviceSetup.from_oracle(osetup, KzgConfig(n=N, g2_len=2)))


def _write_case(root: str, op: str, name: str, case: dict) -> None:
    import yaml

    d = os.path.join(root, op, "kzg-mainnet", name)
    os.makedirs(d)
    with open(os.path.join(d, "data.yaml"), "w") as f:
        yaml.safe_dump(case, f)


@pytest.fixture()
def fixture_root(tmp_path, kzg):
    """A synthetic consensus-spec-tests checkout with one valid and one
    must-reject case per collected op."""
    from kateth_tpu.oracle.kzg import blob_to_bytes
    from kateth_tpu.oracle import field as of

    blob = blob_to_bytes([rng.randrange(of.R) for _ in range(N)])
    cm = kzg.blob_to_kzg_commitment(blob)
    proof = kzg.compute_blob_kzg_proof(blob, cm)
    root = str(tmp_path)
    _write_case(
        root,
        "blob_to_kzg_commitment",
        "case_valid",
        {"input": {"blob": "0x" + blob.hex()}, "output": "0x" + cm.hex()},
    )
    _write_case(
        root,
        "blob_to_kzg_commitment",
        "case_invalid_blob",
        {"input": {"blob": "0x" + b"\xff".hex() * 32 * N}, "output": None},
    )
    _write_case(
        root,
        "verify_blob_kzg_proof",
        "case_valid",
        {
            "input": {
                "blob": "0x" + blob.hex(),
                "commitment": "0x" + cm.hex(),
                "proof": "0x" + proof.hex(),
            },
            "output": True,
        },
    )
    return root


def _load_spec_vectors_module(monkeypatch, root: str):
    """Import tests/test_spec_vectors.py fresh with the hook env set (its
    OFFICIAL_ROOT is read at import time, like a real pytest launch)."""
    monkeypatch.setenv("KATETH_SPEC_FIXTURES", root)
    spec = importlib.util.spec_from_file_location(
        "spec_vectors_under_test", os.path.join(HERE, "test_spec_vectors.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_hook_collects_official_cases(monkeypatch, fixture_root):
    mod = _load_spec_vectors_module(monkeypatch, fixture_root)
    ids = [p.id for p in mod.cases("blob_to_kzg_commitment")]
    assert "official-case_valid" in ids
    assert "official-case_invalid_blob" in ids
    # vendored vectors are still collected alongside the official ones
    assert any(not i.startswith("official-") for i in ids)
    ids2 = [p.id for p in mod.cases("verify_blob_kzg_proof")]
    assert "official-case_valid" in ids2


def test_hook_cases_run(monkeypatch, fixture_root, kzg):
    """The collected official cases execute end-to-end through the same
    runner bench.py uses (tools/spec_run.run_case)."""
    sys.path.insert(0, os.path.join(REPO, "tools"))
    import spec_run

    mod = _load_spec_vectors_module(monkeypatch, fixture_root)
    ran = 0
    for op in ("blob_to_kzg_commitment", "verify_blob_kzg_proof"):
        for param in mod.cases(op):
            if not param.id.startswith("official-"):
                continue
            ok, detail = spec_run.run_case(kzg, op, param.values[0])
            assert ok, f"{op}/{param.id}: {detail}"
            ran += 1
    assert ran == 3


def test_hook_absent_collects_nothing_extra(monkeypatch):
    monkeypatch.delenv("KATETH_SPEC_FIXTURES", raising=False)
    spec = importlib.util.spec_from_file_location(
        "spec_vectors_no_hook", os.path.join(HERE, "test_spec_vectors.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    assert all(
        not p.id.startswith("official-") for p in mod.cases("blob_to_kzg_commitment")
    )
