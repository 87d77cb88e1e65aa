"""Benchmark of record (driver-run, real TPU).

Measures the primary BASELINE.json metric — blob KZG proofs verified per
second per chip via verify_blob_kzg_proof_batch — after a bit-exact
self-check of the device pipeline against a vendored spec-style vector.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

vs_baseline is measured against the BASELINE.json north star of 10,000
aggregate verifications/s on a v5p-16 (8 chips) => 1,250 /s/chip.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

PER_CHIP_TARGET = 10_000 / 8.0

# Benchmark shape: mirrors the reference's criterion batch sweep upper end
# (reference benches/kzg.rs:45-64, n in 1..128) and BASELINE config 3.
BATCH = int(os.environ.get("KATETH_BENCH_BATCH", "64"))
N_FIELD = 4096


def _self_check(kzg, osetup) -> None:
    """Bit-exact device-vs-oracle check on one full-size blob."""
    from kateth_tpu.oracle.kzg import blob_to_bytes
    from kateth_tpu.oracle import field as of

    rng = np.random.default_rng(0xC0FFEE)
    blob = blob_to_bytes(
        [int.from_bytes(rng.bytes(32), "big") % of.R for _ in range(N_FIELD)]
    )
    cm = kzg.blob_to_kzg_commitment(blob)
    want = osetup.blob_to_commitment(blob)
    assert cm == want, "device commitment mismatch vs oracle"
    proof = kzg.compute_blob_kzg_proof(blob, cm)
    assert proof == osetup.blob_proof(blob, cm), "device proof mismatch vs oracle"
    assert kzg.verify_blob_kzg_proof(blob, cm, proof) is True
    bad = bytearray(blob)
    bad[35] ^= 1
    assert kzg.verify_blob_kzg_proof(bytes(bad), cm, proof) is False


def main() -> None:
    repo = os.path.dirname(os.path.abspath(__file__))
    sys.path.insert(0, repo)
    import jax

    jax.config.update("jax_compilation_cache_dir", os.path.join(repo, ".cache", "jax"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

    from kateth_tpu.kzg import Kzg, DeviceSetup
    from kateth_tpu.oracle.kzg import OracleSetup, blob_to_bytes
    from kateth_tpu.oracle import field as of

    t0 = time.time()
    setup_path = os.environ.get(
        "KATETH_TRUSTED_SETUP", "/root/reference/trusted_setup_4096.json"
    )
    # oracle setup is only needed for the self-check; cache it
    import pickle

    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".cache")
    os.makedirs(cache_dir, exist_ok=True)
    ocache = os.path.join(cache_dir, "oracle_setup.pkl")
    if os.path.exists(ocache):
        with open(ocache, "rb") as f:
            osetup = pickle.load(f)
    else:
        osetup = OracleSetup.load_json(setup_path)
        with open(ocache, "wb") as f:
            pickle.dump(osetup, f)
    kzg = Kzg(DeviceSetup.from_oracle(osetup))
    print(f"# setup loaded in {time.time()-t0:.1f}s on {jax.devices()[0].platform}", file=sys.stderr)

    t0 = time.time()
    _self_check(kzg, osetup)
    print(f"# self-check (bit-exact vs oracle) passed in {time.time()-t0:.1f}s", file=sys.stderr)

    # --- workload: BATCH blobs with valid proofs ------------------------
    rng = np.random.default_rng(1)
    blobs = [
        blob_to_bytes([int.from_bytes(rng.bytes(32), "big") % of.R for _ in range(N_FIELD)])
        for _ in range(BATCH)
    ]
    cms = kzg.blobs_to_kzg_commitments(blobs)
    proofs = kzg.compute_blob_kzg_proofs(blobs, cms)

    # warmup (compile)
    assert kzg.verify_blob_kzg_proof_batch(blobs, cms, proofs) is True

    reps = int(os.environ.get("KATETH_BENCH_REPS", "3"))
    t0 = time.time()
    for _ in range(reps):
        assert kzg.verify_blob_kzg_proof_batch(blobs, cms, proofs) is True
    dt = (time.time() - t0) / reps
    per_s = BATCH / dt

    print(
        json.dumps(
            {
                "metric": "blob_proofs_verified_per_s_per_chip",
                "value": round(per_s, 2),
                "unit": "proofs/s/chip",
                "vs_baseline": round(per_s / PER_CHIP_TARGET, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
