"""G1 MSM points/s sweep, 2^12 .. 2^20 (BASELINE config 4 analog).

Tiles the 4096 trusted-setup G1 points up to each size (point values do
not affect Pippenger's control flow or cost — scalars are fresh random
draws per size), runs the production `curves.msm.msm` path (the chunked
Pallas prefix kernel on TPU), and records points/s per size.

At 2^12 the result is cross-checked bit-exactly against the pure-Python
oracle MSM, anchoring the whole sweep's correctness.

Writes MSM_SWEEP.json at the repo root; one stderr line per size.

Usage: python tools/msm_sweep.py [--max-log 20] (TPU; set
KATETH_PROFILE_CPU=1 for a reduced CPU smoke run)
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

    from kateth_tpu.curves import g1, msm as msm_mod, ops
    from kateth_tpu.fields.specs import FR
    from kateth_tpu.kzg import Kzg
    from kateth_tpu.kzg.setup import DEFAULT_TRUSTED_SETUP
    from kateth_tpu.oracle import curve as oc
    from kateth_tpu.oracle import field as of

    max_log = 20
    if "--max-log" in sys.argv:
        max_log = int(sys.argv[sys.argv.index("--max-log") + 1])
    if cpu:
        max_log = min(max_log, 13)

    print(f"# msm sweep on {jax.default_backend()}", file=sys.stderr)
    kzg = Kzg.load_json(DEFAULT_TRUSTED_SETUP)
    base_pts = kzg.setup.g1_points  # (4096, 24) coords, Montgomery
    rng = np.random.default_rng(11)

    def scalars(n):
        vals = [int.from_bytes(rng.bytes(32), "big") % of.R for _ in range(n)]
        return (
            jnp.asarray(np.stack([FR.from_int(v, mont=False) for v in vals])),
            vals,
        )

    reps = int(os.environ.get("KATETH_BENCH_REPS", "3"))
    results = {}
    for log in range(12, max_log + 1):
        n = 1 << log
        tiles = n // 4096 if n >= 4096 else 1
        pts = tuple(
            jnp.tile(c, (tiles, 1))[:n] if n >= 4096 else c[:n]
            for c in base_pts
        )
        sc, vals = scalars(n)
        f = jax.jit(lambda p, s: msm_mod.msm(ops.FP_FIELD, p, s))
        out = f(pts, sc)  # compile
        jax.block_until_ready(out)
        if log == 12:
            got = g1.to_oracle(tuple(np.asarray(c)[None] for c in out))[0]
            want = oc.g1_msm(g1.to_oracle(tuple(np.asarray(c) for c in base_pts)), vals)
            assert oc.g1_eq(got, want), "MSM 2^12 does not match the oracle"
            print("# 2^12 oracle cross-check OK", file=sys.stderr)
        t0 = time.time()
        for _ in range(reps):
            jax.block_until_ready(f(pts, sc))
        dt = (time.time() - t0) / reps
        results[str(n)] = {
            "ms": round(dt * 1000, 2),
            "points_per_s": round(n / dt, 1),
        }
        print(f"# n=2^{log}: {dt*1000:.1f} ms ({n/dt:,.0f} pts/s)", file=sys.stderr, flush=True)
        # incremental write: a timeout mid-sweep still leaves an artifact
        with open(os.path.join(REPO, "MSM_SWEEP.json"), "w") as fh:
            json.dump(results, fh, indent=1)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
