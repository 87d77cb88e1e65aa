"""Data-parallel scaling efficiency on the virtual device mesh
(BASELINE config 5 analog).

Times the batched commitment pipeline (`parallel.sharded_commit`) at a
fixed per-device workload while growing the mesh 1 -> 2 -> 4 -> 8
devices (weak scaling), and at a fixed global workload (strong scaling).
Writes SCALING.json at the repo root.

CAVEAT (recorded in the JSON): on this box the 8 "devices" are XLA:CPU
virtual devices sharing ONE physical core, so wall-clock time cannot
improve with mesh size — the meaningful signal here is the OVERHEAD
ratio (how much slower P virtual devices are than 1; ~1.0 for weak
scaling means the sharded program adds no collective/launch overhead
beyond the extra arithmetic). True ICI scaling needs a real multi-chip
pod; the sharding layout is identical (shard_map + psum over AXIS).

Usage: XLA_FLAGS=--xla_force_host_platform_device_count=8 \
       JAX_PLATFORMS=cpu python tools/scaling_bench.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    flags += " --xla_force_host_platform_device_count=8"
if "xla_cpu_max_isa" not in flags:
    flags += " --xla_cpu_max_isa=AVX2"
os.environ["XLA_FLAGS"] = flags.strip()

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".cache", "jax"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    import jax.numpy as jnp

    from kateth_tpu.kzg import DeviceSetup, KzgConfig, protocol
    from kateth_tpu.oracle.kzg import OracleSetup, blob_to_bytes
    from kateth_tpu.oracle import field as of
    from kateth_tpu.parallel import make_mesh, sharded_commit

    N = 64
    PER_DEV = 2  # blobs per device (weak scaling unit)
    WINDOW = 4
    rng = np.random.default_rng(5)

    osetup = OracleSetup.generate_insecure(N, g2_len=2)
    dsetup = DeviceSetup.from_oracle(osetup, KzgConfig(n=N, g2_len=2))

    def blobs(batch):
        raw = [
            blob_to_bytes([int.from_bytes(rng.bytes(32), "big") % of.R for _ in range(N)])
            for _ in range(batch)
        ]
        return jnp.asarray(
            np.frombuffer(b"".join(raw), dtype=np.uint8).reshape(batch, 32 * N)
        )

    def commit_batch(mesh, blob_arr):
        elements, _ = protocol.decode_blobs(blob_arr)
        return sharded_commit(mesh, dsetup.g1_points, elements, window=WINDOW)

    reps = int(os.environ.get("KATETH_BENCH_REPS", "3"))
    results = {"weak": {}, "strong": {}, "caveat": "virtual CPU devices share one core; see docstring"}

    for p in (1, 2, 4, 8):
        mesh = make_mesh(jax.devices()[:p])
        # weak scaling: PER_DEV blobs per device
        for label, batch in (("weak", PER_DEV * p), ("strong", 8)):
            blob_arr = blobs(batch)
            f = jax.jit(lambda b, m=mesh: commit_batch(m, b))
            out = f(blob_arr)
            jax.block_until_ready(out)
            t0 = time.time()
            for _ in range(reps):
                jax.block_until_ready(f(blob_arr))
            ms = (time.time() - t0) / reps * 1000
            results[label][str(p)] = round(ms, 2)
            print(f"# {label} P={p} batch={batch}: {ms:.1f} ms", file=sys.stderr)

    w = results["weak"]
    results["weak_overhead_8dev"] = round(w["8"] / (8 * w["1"]), 3) if "8" in w else None
    with open(os.path.join(REPO, "SCALING.json"), "w") as fh:
        json.dump(results, fh, indent=1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
