"""Round-5 commit-MSM attribution on the real TPU (VERDICT r4 item 1/3).

Answers "where do the 3.67 s of a 64-blob commit go" by timing each stage
of the window-scanned MSM (curves/msm.py) as its own jitted program, plus
the host<->device tunnel bandwidth that bounds the verify path.

Stages (all at the production shape: batch 64, N = 4096, c = 8, one
window's worth of work — multiply by W = 32 for the whole MSM):
  sort          argsort of one window's digits           (64, 4096)
  gather        point gather into bucket order           (64, 4096, 3x24)
  pallas_scan   the chunked Pallas prefix scan           (chain 8)
  chain_scan    the XLA Hillis-Steele over chain totals  (64, 512)
  window_tail   boundary gather + tree_sum + (B-1)*total
  window_full   one whole _window_sum call
  msm_full      the complete 32-window MSM (the production graph)

Writes PROFILE_R5_MSM.json at the repo root incrementally (a timeout
mid-run still leaves an artifact).

Usage: python tools/profile_msm_r5.py   (TPU; KATETH_PROFILE_CPU=1 for a
reduced CPU smoke run at N=256, batch 8)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(REPO, "PROFILE_R5_MSM.json")

results: dict = {}


def record(name, value):
    results[name] = value
    with open(OUT, "w") as f:
        json.dump(results, f, indent=1)
    print(f"# {name}: {value}", file=sys.stderr, flush=True)


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

    from kateth_tpu.curves import msm as msm_mod, ops, pallas_msm
    from kateth_tpu.fields.specs import FR
    from kateth_tpu.kzg import Kzg, DeviceSetup, KzgConfig
    from kateth_tpu.oracle import field as of
    from kateth_tpu.oracle.kzg import OracleSetup

    F = ops.FP_FIELD
    BATCH = 8 if cpu else 64
    N = 256 if cpu else 4096
    C = 8
    reps = int(os.environ.get("KATETH_BENCH_REPS", "3"))
    record("platform", jax.devices()[0].platform)
    record("batch", BATCH)
    record("n", N)

    # --- tunnel bandwidth (bounds the verify path; VERDICT r4 weak #2) ---
    for mb in (1, 8, 32):
        nbytes = mb * (1 << 20)
        host = np.random.default_rng(0).integers(0, 255, nbytes, dtype=np.uint8)
        dev = jax.block_until_ready(jnp.asarray(host))  # warm path
        t0 = time.time()
        for _ in range(reps):
            dev = jax.block_until_ready(jnp.asarray(host))
        up = (time.time() - t0) / reps
        t0 = time.time()
        for _ in range(reps):
            _ = jax.device_get(dev)
        down = (time.time() - t0) / reps
        record(
            f"tunnel_{mb}mb",
            {
                "h2d_ms": round(up * 1000, 1),
                "h2d_mb_s": round(mb / up, 1),
                "d2h_ms": round(down * 1000, 1),
                "d2h_mb_s": round(mb / down, 1),
            },
        )

    # --- setup + scalars -------------------------------------------------
    t0 = time.time()
    if cpu:
        osetup = OracleSetup.generate_insecure(N, g2_len=2)
        kzg = Kzg(DeviceSetup.from_oracle(osetup, KzgConfig(n=N, g2_len=2)))
    else:
        from kateth_tpu.kzg.setup import DEFAULT_TRUSTED_SETUP

        kzg = Kzg.load_json(DEFAULT_TRUSTED_SETUP)
    points = kzg.setup.g1_points
    record("setup_s", round(time.time() - t0, 1))

    rng = np.random.default_rng(7)
    vals = [int.from_bytes(rng.bytes(32), "big") % of.R for _ in range(BATCH * N)]
    sc = jnp.asarray(
        np.stack([FR.from_int(v, mont=False) for v in vals]).reshape(BATCH, N, 16)
    )

    def timed(name, fn, *args):
        t0 = time.time()
        out = jax.block_until_ready(fn(*args))
        compile_s = time.time() - t0
        t0 = time.time()
        for _ in range(reps):
            out = jax.block_until_ready(fn(*args))
        ms = (time.time() - t0) / reps * 1000
        record(name, {"ms": round(ms, 1), "compile_s": round(compile_s, 1)})
        return out

    # one window's digits, pre-staged
    digits = jax.block_until_ready(
        jax.jit(lambda s: msm_mod.window_digits(s, C))(sc)
    )  # (W, B, N)
    dig0 = jax.block_until_ready(jnp.copy(digits[5]))  # (B, N) a mid window

    # --- stage: sort ------------------------------------------------------
    sort_f = jax.jit(lambda d: jnp.argsort(d, axis=-1))
    order = timed("sort", sort_f, dig0)
    order = jax.block_until_ready(jnp.copy(order))

    # --- stage: gather ----------------------------------------------------
    gather_f = jax.jit(
        lambda o: tuple(jnp.take(c, o, axis=0) for c in points)
    )
    gathered = timed("gather", gather_f, order)
    gathered = tuple(jax.block_until_ready(jnp.copy(g)) for g in gathered)

    # --- stage: pallas chunked prefix scan -------------------------------
    if pallas_msm.available(F, N):
        scan_f = jax.jit(
            lambda g: tuple(
                jnp.sum(c, axis=-2) for c in pallas_msm.prefix_scan_kernel(F, g, axis=1)
            )
        )
        timed("pallas_scan", scan_f, gathered)

    # --- stage: XLA chain-total scan (64, N/8) ---------------------------
    totals = tuple(
        jax.block_until_ready(jnp.copy(g.reshape(BATCH, N // 8, 8, 24)[:, :, -1]))
        for g in gathered
    )
    chain_f = jax.jit(
        lambda t: tuple(jnp.sum(c, axis=-2) for c in msm_mod.prefix_scan(F, t, axis=1))
    )
    timed("chain_scan", chain_f, totals)

    # --- stage: window tail (boundary gather + tree + smul) --------------
    prefix = tuple(jax.block_until_ready(jnp.copy(g)) for g in gathered)

    def tail(pre, sd):
        B = 1 << C
        total = tuple(jax.lax.index_in_dim(a, N - 1, axis=1, keepdims=False) for a in pre)
        counts = jnp.sum(
            sd[..., None] == jnp.arange(B, dtype=jnp.uint32), axis=-2, dtype=jnp.int32
        )
        cum = jnp.cumsum(counts, axis=-1)
        c_j = cum[..., : B - 1]
        idx = jnp.maximum(c_j - 1, 0)
        boundary = tuple(
            jnp.take_along_axis(a, idx.reshape(*idx.shape, 1), axis=1) for a in pre
        )
        empty = c_j == 0
        boundary = ops.pselect(F, empty, ops.identity(F, (BATCH, B - 1)), boundary)
        gsum = msm_mod.tree_sum(F, boundary, axis=1)
        return ops.padd(F, msm_mod.scalar_mul_const(F, total, B - 1), ops.pneg(F, gsum))

    sorted_digits = jax.block_until_ready(
        jax.jit(lambda d, o: jnp.take_along_axis(d, o, axis=-1))(dig0, order)
    )
    timed("window_tail", jax.jit(tail), prefix, sorted_digits)

    # --- stage: one whole window -----------------------------------------
    timed(
        "window_full",
        jax.jit(lambda d: msm_mod._window_sum(F, points, d, C)),
        dig0,
    )

    # --- the full production MSM -----------------------------------------
    msm_f = jax.jit(lambda s: msm_mod.msm(F, points, s, c=C))
    timed("msm_full", msm_f, sc)

    # optional profiler trace of one full MSM (may not work over axon)
    try:
        tdir = os.path.join(REPO, ".cache", "trace_msm")
        with jax.profiler.trace(tdir):
            jax.block_until_ready(msm_f(sc))
        files = []
        for root, _, names in os.walk(tdir):
            files += [os.path.join(root, n) for n in names]
        record("trace_files", files[:10])
    except Exception as e:  # pragma: no cover
        record("trace_error", repr(e))

    print(json.dumps(results))


if __name__ == "__main__":
    main()
