"""Per-stage latency profile of the batch-verify + commit pipelines on the
real TPU (or CPU with KATETH_PROFILE_CPU=1 at reduced shapes).

Times each stage as its own jitted program (warmup + reps), so the output
attributes the fused verify latency to decode / decompress / evaluate /
ladder / miller / final-exp / MSM.  Writes PROFILE.json at the repo root
and prints one line per stage to stderr.

Usage:  python tools/profile_stages.py [--batch 64]
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
    cpu = os.environ.get("KATETH_PROFILE_CPU") == "1"
    if cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    if cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".cache", "jax"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    import jax.numpy as jnp
    from kateth_tpu.kzg import Kzg, DeviceSetup, KzgConfig, protocol
    from kateth_tpu.oracle.kzg import OracleSetup, blob_to_bytes
    from kateth_tpu.oracle import field as of
    from kateth_tpu.fields.specs import FR
    from kateth_tpu.curves import decompress, g1 as g1mod, ops
    from kateth_tpu import pairing

    BATCH = int(os.environ.get("KATETH_PROFILE_BATCH", "64"))
    N = 256 if cpu else 4096

    print(f"# profiling on {jax.devices()[0].platform}, N={N}, B={BATCH}", file=sys.stderr)
    t0 = time.time()
    if N == 4096:
        from kateth_tpu.kzg.setup import DEFAULT_TRUSTED_SETUP

        kzg = Kzg.load_json(DEFAULT_TRUSTED_SETUP)
    else:
        osetup = OracleSetup.generate_insecure(N, g2_len=2)
        kzg = Kzg(DeviceSetup.from_oracle(osetup, KzgConfig(n=N, g2_len=2)))
    print(f"# setup in {time.time()-t0:.1f}s", file=sys.stderr)

    rng = np.random.default_rng(2)
    blobs = [
        blob_to_bytes([int.from_bytes(rng.bytes(32), "big") % of.R for _ in range(N)])
        for _ in range(BATCH)
    ]
    cms = kzg.blobs_to_kzg_commitments(blobs)
    proofs = kzg.compute_blob_kzg_proofs(blobs, cms)

    blob_arr = jnp.asarray(
        np.frombuffer(b"".join(blobs), dtype=np.uint8).reshape(BATCH, 32 * N)
    )
    comm_arr = jnp.asarray(
        np.frombuffer(b"".join(cms), dtype=np.uint8).reshape(BATCH, 48)
    )
    proof_arr = jnp.asarray(
        np.frombuffer(b"".join(proofs), dtype=np.uint8).reshape(BATCH, 48)
    )
    z_vals = kzg._challenges(blobs, cms)
    import hashlib

    r = 7  # fixed weights are fine for timing
    weights = [pow(r, i, of.R) for i in range(BATCH)]
    zw = [w * z % of.R for w, z in zip(weights, z_vals)]
    zp = kzg._fr_planes(z_vals)
    wp = kzg._fr_planes(weights)
    zwp = kzg._fr_planes(zw)

    results = {}
    REPS = int(os.environ.get("KATETH_PROFILE_REPS", "3"))

    def bench(name, fn):
        out = fn()  # compile
        jax.block_until_ready(out)
        t0 = time.time()
        for _ in range(REPS):
            jax.block_until_ready(fn())
        ms = (time.time() - t0) / REPS * 1000
        results[name] = round(ms, 2)
        print(f"# {name}: {ms:.1f} ms", file=sys.stderr)

    import jax as _jax

    decode_j = _jax.jit(protocol.decode_blobs)
    bench("decode_blobs", lambda: decode_j(blob_arr))

    both = jnp.concatenate([comm_arr, proof_arr], axis=0)
    dec_j = _jax.jit(decompress.g1_decompress_nosub)
    bench("decompress_2B", lambda: dec_j(both))

    elements, _ = decode_j(blob_arr)
    em_j = _jax.jit(lambda e: protocol.fr_to_mont(e))
    em = em_j(elements)
    zm = protocol.fr_to_mont(zp)
    ev_j = _jax.jit(lambda e, z, r: protocol.evaluate(e, z, r, N))
    bench("evaluate", lambda: ev_j(em, zm, kzg.setup.roots))

    # the fused 6B+2-lane G1 ladder
    pts, _, _ = dec_j(both)
    lanes = tuple(jnp.concatenate([a, a, a], axis=0) for a in pts)
    sc = jnp.concatenate([wp, wp, zwp, wp, wp, zwp], axis=0)
    lad_j = _jax.jit(protocol._ladder)
    bench("ladder_6B", lambda: lad_j(lanes, sc))

    # pairing split: miller on 2 lanes, final exp on 1
    g1p = tuple(a[:2] for a in pts)
    from kateth_tpu.curves import g2 as g2mod

    g2p = tuple(jnp.stack([c, c]) for c in g2mod.GENERATOR)
    mil_j = _jax.jit(pairing.miller_loop)
    bench("miller_2", lambda: mil_j(g1p, g2p))
    f = mil_j(g1p, g2p)
    from kateth_tpu.fields import fp12

    prod_j = _jax.jit(lambda f: fp12.mul(f[0], f[1]))
    fe_j = _jax.jit(lambda x: pairing.final_exponentiation(x))
    prod = prod_j(f)
    bench("final_exp_1", lambda: fe_j(prod))

    # whole fused verify: pre-pairing program, the hoisted pairing check,
    # and the chained end-to-end latency
    ver_args = (blob_arr, comm_arr, proof_arr, zp, zwp, wp, kzg.setup.roots, kzg.setup.tau2)
    ver_j = _jax.jit(protocol.verify_blob_batch_fused)
    bench("verify_fused_pre", lambda: ver_j(*ver_args))
    pc_in = ver_j(*ver_args)[0]
    bench("pairing_check", lambda: protocol.pairing_check(*pc_in))
    bench("verify_end_to_end", lambda: protocol.pairing_check(*ver_j(*ver_args)[0]))

    # commit path: the comb fixed-base commit (the default since round 5)
    # over the full canonical batch, plus the windowed-MSM fallback at
    # chunk 8 for comparison
    bench("commit_comb_batch", lambda: kzg._commit_elements(elements))
    os.environ["KATETH_NO_COMB"] = "1"
    try:
        bench("commit_msm_chunk8", lambda: kzg._commit_elements(elements[:8]))
    finally:
        del os.environ["KATETH_NO_COMB"]

    with open(os.path.join(REPO, "PROFILE.json"), "w") as fh:
        json.dump({"n": N, "batch": BATCH, "ms": results}, fh, indent=1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
