"""Measure the HOST-side + transfer components of verify_blob_kzg_proof_batch
on the real TPU — none of this compiles any device graph, so it runs in
seconds and attributes the gap between PROFILE.json's device-side
verify_end_to_end and the bench's measured wall time.

Usage: python tools/host_overhead.py
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

    from kateth_tpu import native
    from kateth_tpu.oracle import field as of
    from kateth_tpu.oracle.kzg import FS_DOMAIN, RC_DOMAIN, blob_to_bytes
    from kateth_tpu.fields.specs import FR
    import hashlib

    B, N = 64, 4096
    rng = np.random.default_rng(3)
    blobs = [
        blob_to_bytes([int.from_bytes(rng.bytes(32), "big") % of.R for _ in range(N)])
        for _ in range(B)
    ]
    cms = [b"\xc0" + b"\x00" * 47] * B
    proofs = cms
    res = {}
    REPS = 5

    def t(name, fn):
        fn()
        t0 = time.time()
        for _ in range(REPS):
            fn()
        ms = (time.time() - t0) / REPS * 1000
        res[name] = round(ms, 2)
        print(f"# {name}: {ms:.1f} ms", file=sys.stderr, flush=True)

    t("join_blobs_8MB", lambda: b"".join(bytes(b) for b in blobs))
    joined = b"".join(blobs)

    t("frombuffer_reshape", lambda: np.frombuffer(joined, dtype=np.uint8).reshape(B, 32 * N))
    arr = np.frombuffer(joined, dtype=np.uint8).reshape(B, 32 * N)

    def put_sync():
        x = jnp.asarray(arr)
        x.block_until_ready()

    t("device_put_8MB_sync", put_sync)

    def challenges():
        return native.challenges(
            FS_DOMAIN + N.to_bytes(16, "big"), joined, 32 * N, b"".join(cms), B
        )

    t("native_challenges_64", challenges)

    def r_hash_full():
        return hashlib.sha256(
            RC_DOMAIN + N.to_bytes(16, "big") + B.to_bytes(16, "big")
            + joined + b"".join(cms) + b"".join(proofs)
        ).digest()

    t("r_hash_full_8MB", r_hash_full)

    z_vals = [int.from_bytes(d, "big") % of.R for d in challenges()]

    def r_hash_digest_chain():
        return hashlib.sha256(
            RC_DOMAIN + N.to_bytes(16, "big") + B.to_bytes(16, "big")
            + b"".join(z.to_bytes(32, "big") for z in z_vals)
            + b"".join(cms) + b"".join(proofs)
        ).digest()

    t("r_hash_digest_chain", r_hash_digest_chain)

    r = 12345
    t("weights_pow", lambda: [pow(r, i, of.R) for i in range(B)])
    weights = [pow(r, i, of.R) for i in range(B)]

    t("fr_planes_x3", lambda: [
        np.stack([FR.from_int(v, mont=False) for v in vals])
        for vals in (z_vals, weights, weights)
    ])

    # everything a verify call does BEFORE the fused program, in order,
    # with the device transfer started FIRST (async) so it overlaps
    def full_host_prefix_overlapped():
        joined2 = b"".join(bytes(b) for b in blobs)
        arr2 = np.frombuffer(joined2, dtype=np.uint8).reshape(B, 32 * N)
        dev = jnp.asarray(arr2)  # async
        zs = [int.from_bytes(d, "big") % of.R for d in native.challenges(
            FS_DOMAIN + N.to_bytes(16, "big"), joined2, 32 * N, b"".join(cms), B)]
        rr = int.from_bytes(hashlib.sha256(
            RC_DOMAIN + joined2).digest(), "big") % of.R
        ws = [pow(rr, i, of.R) for i in range(B)]
        zw = [w * z % of.R for w, z in zip(ws, zs)]
        planes = [np.stack([FR.from_int(v, mont=False) for v in vals])
                  for vals in (zs, ws, zw)]
        dev.block_until_ready()
        return planes

    t("host_prefix_total_overlapped", full_host_prefix_overlapped)

    with open(os.path.join(REPO, ".cache", "host_overhead.json"), "w") as f:
        json.dump(res, f, indent=1)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
