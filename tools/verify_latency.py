"""Attribute the verify_blob_kzg_proof_batch wall time stage by stage on
the real TPU — explains the gap between profiler-style calls (pre-staged
device arrays, ~50 ms) and the public API, and records the numbers the
round-4 verdict asked for in-tree:

* per-stage latency of one API call (host prefix, transfer, dispatch,
  device compute, result sync),
* host->device tunnel bandwidth at the verify batch size (the sustained-
  throughput wall: ~8.4 MB of blob bytes per 64-blob batch),
* COMPUTE-ONLY throughput: all inputs pre-staged on device, K fused
  verify programs timed back-to-back — the per-chip capability once
  blobs are resident,
* sustained STREAMING throughput at several pipeline depths.

Writes VERIFY_LATENCY.json at the repo root (the committed artifact of
record; the round-4 version lived only in .cache/).

Uses generator points as commitments/proofs (verdict False, identical
cost) so only the fused verify + pairing graphs compile — no prove path.

Usage: python tools/verify_latency.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".cache", "jax"))

    from kateth_tpu.kzg import Kzg, protocol
    from kateth_tpu.kzg.api import _G1_GEN_BYTES, _hash_to_fr
    from kateth_tpu.kzg.setup import DEFAULT_TRUSTED_SETUP
    from kateth_tpu.oracle import field as of
    from kateth_tpu.oracle.kzg import RC_DOMAIN, blob_to_bytes

    B, N = 64, 4096
    kzg = Kzg.load_json(DEFAULT_TRUSTED_SETUP)
    rng = np.random.default_rng(5)
    blobs = [
        blob_to_bytes([int.from_bytes(rng.bytes(32), "big") % of.R for _ in range(N)])
        for _ in range(B)
    ]
    cms = [_G1_GEN_BYTES] * B
    proofs = [_G1_GEN_BYTES] * B

    print("# compiling (first call)...", file=sys.stderr, flush=True)
    t0 = time.time()
    res = kzg.verify_blob_kzg_proof_batch(blobs, cms, proofs)
    print(f"# first call {time.time()-t0:.1f}s verdict={res}", file=sys.stderr, flush=True)

    # --- instrumented replay of the API body --------------------------------
    out = {}

    def span(name, fn):
        t = time.time()
        r = fn()
        out[name] = round((time.time() - t) * 1000, 2)
        print(f"# {name}: {out[name]} ms", file=sys.stderr, flush=True)
        return r

    for rep in range(3):
        nbytes = kzg.config.bytes_per_blob
        joined_blobs = span("join_blobs", lambda: b"".join(bytes(b) for b in blobs))
        joined_comms = b"".join(cms)
        joined_proofs = b"".join(proofs)
        blob_arr = span(
            "asarray_blobs",
            lambda: jnp.asarray(
                np.frombuffer(joined_blobs, dtype=np.uint8).reshape(B, nbytes)
            ),
        )
        comm_arr = jnp.asarray(np.frombuffer(joined_comms, dtype=np.uint8).reshape(B, 48))
        proof_arr = jnp.asarray(np.frombuffer(joined_proofs, dtype=np.uint8).reshape(B, 48))
        z_digests = span(
            "challenges", lambda: kzg._challenge_digests(joined_blobs, joined_comms, B)
        )
        z_vals = [int.from_bytes(d, "big") % of.R for d in z_digests]
        r = _hash_to_fr(RC_DOMAIN + b"".join(z_digests) + joined_comms + joined_proofs)
        weights = [pow(r, i, of.R) for i in range(B)]
        zw = [w * z % of.R for w, z in zip(weights, z_vals)]
        planes = span(
            "fr_planes_x3",
            lambda: [kzg._fr_planes(v) for v in (z_vals, zw, weights)],
        )
        pc_in, packed = span(
            "fused_dispatch",
            lambda: protocol.verify_blob_batch_fused(
                blob_arr, comm_arr, proof_arr, *planes, kzg.setup.roots, kzg.setup.tau2
            ),
        )
        span("fused_block", lambda: jax.block_until_ready(pc_in))
        verdict = span("pairing_dispatch", lambda: protocol.pairing_check(*pc_in)[0])
        span("pairing_block", lambda: jax.block_until_ready(verdict))
        span(
            "device_get_masks",
            lambda: jax.device_get((verdict, packed)),
        )
        print(f"# --- rep {rep} total {sum(out.values()):.0f} ms ---", file=sys.stderr, flush=True)

    # --- tunnel bandwidth at the verify payload size ------------------------
    nbytes = kzg.config.bytes_per_blob
    payload = np.frombuffer(b"".join(bytes(b) for b in blobs), dtype=np.uint8)
    jax.block_until_ready(jnp.asarray(payload))  # warm the path
    bw = []
    for _ in range(3):
        t = time.time()
        jax.block_until_ready(jnp.asarray(payload))
        bw.append(time.time() - t)
    mb = payload.nbytes / 2**20
    out["tunnel_h2d_mb"] = round(mb, 2)
    out["tunnel_h2d_ms"] = round(min(bw) * 1000, 1)
    out["tunnel_h2d_mb_s"] = round(mb / min(bw), 1)
    print(
        f"# tunnel h2d: {mb:.1f} MB in {min(bw)*1000:.0f} ms "
        f"({mb/min(bw):.1f} MB/s)",
        file=sys.stderr,
        flush=True,
    )

    # --- COMPUTE-ONLY: everything pre-staged, K fused programs chained ------
    args = (blob_arr, comm_arr, proof_arr, *planes, kzg.setup.roots, kzg.setup.tau2)
    for rep in range(3):
        K = 6
        t = time.time()
        vs = []
        for _ in range(K):
            pc_in2, _packed = protocol.verify_blob_batch_fused(*args)
            vs.append(protocol.pairing_check(*pc_in2))
        jax.block_until_ready(vs)
        dt = time.time() - t
        out["compute_only_ms_per_batch"] = round(dt / K * 1000, 1)
        out["compute_only_per_s"] = round(K * B / dt, 1)
        print(
            f"# compute-only: {K}x{B} blobs in {dt*1000:.1f} ms "
            f"({K*B/dt:.0f}/s)",
            file=sys.stderr,
            flush=True,
        )

    # --- full API call + streaming depths -----------------------------------
    for _ in range(3):
        t = time.time()
        kzg.verify_blob_kzg_proof_batch(blobs, cms, proofs)
        ms = (time.time() - t) * 1000
        out["api_e2e_ms"] = round(ms, 1)
        print(f"# api_e2e: {ms:.1f} ms", file=sys.stderr, flush=True)
    for streams in (2, 4, 8, 12):
        batches = [(blobs, cms, proofs)] * streams
        kzg.verify_blob_kzg_proof_batches(batches)  # warm
        t = time.time()
        kzg.verify_blob_kzg_proof_batches(batches)
        dt = time.time() - t
        out[f"stream_{streams}_per_s"] = round(streams * B / dt, 1)
        print(
            f"# streaming x{streams}: {streams*B/dt:.1f}/s ({dt*1000:.0f} ms)",
            file=sys.stderr,
            flush=True,
        )

    with open(os.path.join(REPO, "VERIFY_LATENCY.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
