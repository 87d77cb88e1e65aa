"""Validate + time the comb fixed-base commit on the real TPU.

Builds the mainnet comb table (h from config), bit-exact-checks one
commitment against the host oracle, then times the batch-64 commit and
prove paths.  The focused counterpart of bench.py for the round-5 commit
work: small compile surface (no verify/pairing graphs).

Writes COMB_CHECK.json at the repo root.

Usage: python tools/comb_check.py  (TPU)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(REPO, "COMB_CHECK.json")
results: dict = {}


def record(name, value):
    results[name] = value
    with open(OUT, "w") as f:
        json.dump(results, f, indent=1)
    print(f"# {name}: {value}", file=sys.stderr, flush=True)


def main() -> None:
    import jax

    jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".cache", "jax"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from kateth_tpu.kzg import DeviceSetup, Kzg
    from kateth_tpu.kzg.setup import DEFAULT_TRUSTED_SETUP
    from kateth_tpu.oracle import field as of
    from kateth_tpu.oracle.kzg import blob_to_bytes

    B, N = 64, 4096
    record("platform", jax.devices()[0].platform)

    # Load via the cached host-oracle pickle when present (same scheme as
    # bench.py): skips the device decompression compile entirely, and the
    # oracle is needed below for the bit-exact check anyway.
    import hashlib
    import pickle

    with open(DEFAULT_TRUSTED_SETUP, "rb") as f:
        key = hashlib.sha256(f.read()).hexdigest()[:16]
    ocache = os.path.join(REPO, ".cache", f"oracle_setup_{key}.pkl")
    osetup = None
    t0 = time.time()
    if os.path.exists(ocache):
        with open(ocache, "rb") as f:
            osetup = pickle.load(f)
        kzg = Kzg(DeviceSetup.from_oracle(osetup))
    else:
        kzg = Kzg.load_json(DEFAULT_TRUSTED_SETUP)
    record("setup_load_s", round(time.time() - t0, 1))
    record("comb_h", kzg.config.comb_h)

    rng = np.random.default_rng(0xC0B5)
    blobs = [
        blob_to_bytes(
            [int.from_bytes(rng.bytes(32), "big") % of.R for _ in range(N)]
        )
        for _ in range(B)
    ]

    # first call: builds the table + compiles the commit graph
    t0 = time.time()
    cms = kzg.blobs_to_kzg_commitments(blobs)
    record("first_commit_call_s", round(time.time() - t0, 1))

    # bit-exact check vs the host oracle on blob 0
    if osetup is not None:
        want = osetup.blob_to_commitment(blobs[0])
        record("oracle_check", "PASS" if cms[0] == want else "FAIL")
        if cms[0] != want:
            raise SystemExit("comb commitment mismatch vs oracle")
    else:
        record("oracle_check", "skipped (no cached oracle setup)")

    reps = int(os.environ.get("KATETH_BENCH_REPS", "3"))
    t0 = time.time()
    for _ in range(reps):
        kzg.blobs_to_kzg_commitments(blobs)
    ms = (time.time() - t0) / reps * 1000
    record("commit_batch64_ms", round(ms, 1))
    record("blob_to_kzg_commitment_ms", round(ms / B, 2))

    # prove path (evaluate + quotient + comb commit of the quotient)
    t0 = time.time()
    proofs = kzg.compute_blob_kzg_proofs(blobs, cms)
    record("first_prove_call_s", round(time.time() - t0, 1))
    if osetup is not None:
        wantp = osetup.blob_proof(blobs[0], cms[0])
        record("oracle_proof_check", "PASS" if proofs[0] == wantp else "FAIL")
        if proofs[0] != wantp:
            raise SystemExit("comb proof mismatch vs oracle")
    t0 = time.time()
    for _ in range(reps):
        kzg.compute_blob_kzg_proofs(blobs, cms)
    ms = (time.time() - t0) / reps * 1000
    record("prove_batch64_ms", round(ms, 1))
    record("compute_blob_kzg_proof_ms", round(ms / B, 2))

    print(json.dumps(results))


if __name__ == "__main__":
    main()
