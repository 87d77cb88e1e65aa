"""Benchmark of record (driver-run, real TPU).

Measures the primary BASELINE.json metric — blob KZG proofs verified per
second per chip via verify_blob_kzg_proof_batch — after a bit-exact
self-check of the device pipeline against a vendored spec-style vector.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, "pallas": bool}

vs_baseline is measured against the BASELINE.json north star of 10,000
aggregate verifications/s on a v5p-16 (8 chips) => 1,250 /s/chip.

Crash containment: a Mosaic (Pallas-TPU) compiler abort is a SIGABRT that
kills the whole process — no try/except can survive it (round 2's bench
died exactly this way, BENCH_r02.json rc=1).  So the default entry point
is a LAUNCHER that runs the real bench in a subprocess; if that exits
non-zero (or times out) it reruns with KATETH_NO_PALLAS=1 so the XLA
fallback path still produces the metric line.  `--inner` runs the bench
directly in-process.
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
    from kateth_tpu.kzg.setup import DEFAULT_TRUSTED_SETUP

    setup_path = DEFAULT_TRUSTED_SETUP
    # oracle setup is only needed for the self-check; cache it, keyed on
    # the setup file's content hash so a changed KATETH_TRUSTED_SETUP can
    # never silently reuse a stale oracle
    import hashlib
    import pickle

    with open(setup_path, "rb") as f:
        setup_hash = hashlib.sha256(f.read()).hexdigest()[:16]
    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".cache")
    os.makedirs(cache_dir, exist_ok=True)
    ocache = os.path.join(cache_dir, f"oracle_setup_{setup_hash}.pkl")
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

    # optional: the FULL vendored spec-vector suite in-process (reuses
    # every graph the bench just compiled — a standalone run would pay
    # the whole TPU compile budget again); writes SPEC_RUN.json
    if os.environ.get("KATETH_BENCH_SPEC") == "1":
        sys.path.insert(0, os.path.join(repo, "tools"))
        import spec_run as spec_mod

        t0 = time.time()
        passed = total = 0
        results = {}
        for op in spec_mod.OPS:
            opdir = os.path.join(repo, "tests", "vectors", op)
            op_res = {}
            for name in sorted(os.listdir(opdir)):
                import yaml

                with open(os.path.join(opdir, name, "data.yaml")) as f:
                    case = yaml.safe_load(f)
                ok, detail = spec_mod.run_case(kzg, op, case)
                total += 1
                passed += ok
                op_res[name] = {"ok": bool(ok), "detail": detail}
                if not ok:
                    print(f"# SPEC FAIL {op}/{name}: {detail}", file=sys.stderr)
            results[op] = op_res
        wall = round(time.time() - t0, 1)
        with open(os.path.join(repo, "SPEC_RUN.json"), "w") as f:
            json.dump(
                {
                    "platform": jax.devices()[0].platform,
                    "passed": passed,
                    "total": total,
                    "wall_s": wall,
                    "results": results,
                },
                f,
                indent=1,
            )
        print(f"# spec suite: {passed}/{total} in {wall}s", file=sys.stderr)

    # --- workload: BATCH blobs with valid proofs ------------------------
    rng = np.random.default_rng(1)
    blobs = [
        blob_to_bytes([int.from_bytes(rng.bytes(32), "big") % of.R for _ in range(N_FIELD)])
        for _ in range(BATCH)
    ]
    details = {}
    reps = int(os.environ.get("KATETH_BENCH_REPS", "3"))

    def timed(name, fn, per: int = 1):
        """Run fn() reps times (it is already compiled by its first call
        upstream); record ms per element."""
        t0 = time.time()
        for _ in range(reps):
            fn()
        ms = (time.time() - t0) / reps / per * 1000.0
        details[name] = round(ms, 3)
        print(f"# {name}: {ms:.2f} ms", file=sys.stderr)

    cms = kzg.blobs_to_kzg_commitments(blobs)  # compiles the commit path
    proofs = kzg.compute_blob_kzg_proofs(blobs, cms)  # compiles the prove path
    timed("blob_to_kzg_commitment_ms", lambda: kzg.blobs_to_kzg_commitments(blobs), BATCH)
    timed("compute_blob_kzg_proof_ms", lambda: kzg.compute_blob_kzg_proofs(blobs, cms), BATCH)

    # optional per-kernel profiler trace of one verify pass
    trace = "--trace" in sys.argv or os.environ.get("KATETH_BENCH_TRACE") == "1"

    # warmup (compile) — explicit check, not assert: asserts vanish under
    # python -O and a silent False here would poison every timed rep
    if kzg.verify_blob_kzg_proof_batch(blobs, cms, proofs) is not True:
        raise RuntimeError("verify_blob_kzg_proof_batch returned False on valid input")
    if trace:
        tdir = os.path.join(cache_dir, "trace")
        with jax.profiler.trace(tdir):
            kzg.verify_blob_kzg_proof_batch(blobs, cms, proofs)
        print(f"# profiler trace written to {tdir}", file=sys.stderr)

    t0 = time.time()
    for _ in range(reps):
        if kzg.verify_blob_kzg_proof_batch(blobs, cms, proofs) is not True:
            raise RuntimeError("verify_blob_kzg_proof_batch returned False mid-bench")
    dt = (time.time() - t0) / reps
    details["verify_blob_kzg_proof_batch_ms_total"] = round(dt * 1000.0, 3)
    details["batch"] = BATCH

    # headline: SUSTAINED throughput via the streaming entry point — all
    # batches dispatched before any verdict is awaited, so host->device
    # blob transfers (the wall over the remote device link: ~8.4 MB/batch)
    # pipeline under device compute.  This is the serving number; the
    # single-call latency above stays in the details.
    streams = int(os.environ.get("KATETH_BENCH_STREAMS", "6"))
    stream_batches = [(blobs, cms, proofs)] * streams
    if not all(kzg.verify_blob_kzg_proof_batches(stream_batches)):  # warm
        raise RuntimeError("streaming verify returned False on valid input")
    t0 = time.time()
    for _ in range(reps):
        if not all(kzg.verify_blob_kzg_proof_batches(stream_batches)):
            raise RuntimeError("streaming verify returned False mid-bench")
    sdt = (time.time() - t0) / reps
    per_s = streams * BATCH / sdt
    details["verify_stream_batches"] = streams
    details["verify_stream_ms_total"] = round(sdt * 1000.0, 3)
    details["verify_stream_per_s"] = round(per_s, 2)
    print(
        f"# streaming verify: {streams}x{BATCH} blobs in {sdt*1000:.1f} ms "
        f"({per_s:.1f}/s)",
        file=sys.stderr,
    )

    # COMPUTE-ONLY throughput: inputs pre-staged on device, K fused verify
    # programs chained — the per-chip capability once blobs are resident.
    # Reported alongside the sustained number because the remote-device
    # tunnel (~37 MB/s, VERIFY_LATENCY.json) caps sustained throughput at
    # ~280/s while the chip itself computes far faster.
    compute_only_per_s = 0.0
    try:
        from kateth_tpu.kzg import protocol as _protocol

        _, args = kzg._verify_batch_stage(blobs, cms, proofs)
        jax.block_until_ready(args)
        K = streams
        t0 = time.time()
        for _ in range(reps):
            vs = []
            for _ in range(K):
                pc_in, _packed = _protocol.verify_blob_batch_fused(*args)
                vs.append(_protocol.pairing_check(*pc_in))
            jax.block_until_ready(vs)
        cdt = (time.time() - t0) / reps
        compute_only_per_s = K * BATCH / cdt
        details["verify_compute_only_per_s"] = round(compute_only_per_s, 2)
        print(
            f"# compute-only verify: {K}x{BATCH} blobs in {cdt*1000:.1f} ms "
            f"({compute_only_per_s:.1f}/s)",
            file=sys.stderr,
        )
    except Exception as e:  # pragma: no cover - defensive
        details["verify_compute_only_error"] = repr(e)
        print(f"# compute-only verify failed: {e!r}", file=sys.stderr)

    # single-op verify latency (BASELINE config 2): full pairing check on
    # one (commitment, z, y, proof) quadruple.  Runs AFTER the headline
    # batch metric and inside try/except: a bug here must never cost the
    # metric line (round-3 lesson — a non-canonical z killed a 20-min run).
    try:
        z = b"\x00" + rng.bytes(31)  # leading zero byte => always < Fr modulus
        proof_single, y = kzg.compute_kzg_proof(blobs[0], z)
        if kzg.verify_kzg_proof(proof_single, cms[0], z, y) is not True:  # compile
            # a real correctness regression must surface in the metric line,
            # not vanish into the broad compile/tunnel except below
            details["verify_kzg_proof_error"] = "verify returned False on valid input"
            raise RuntimeError("single-op verify regression: False on valid input")
        timed(
            "verify_kzg_proof_ms",
            lambda: kzg.verify_kzg_proof(proof_single, cms[0], z, y),
        )
    except RuntimeError:
        raise
    except Exception as e:  # pragma: no cover - defensive (compile/tunnel)
        details["verify_kzg_proof_error"] = repr(e)
        print(f"# single-op verify timing failed: {e!r}", file=sys.stderr)

    # optional batch-size sweep (reference benches/kzg.rs:45-64 analog) —
    # each size is a fresh XLA compile through the TPU tunnel, so this is
    # opt-in; results land in BENCH_SWEEP.json
    if os.environ.get("KATETH_BENCH_SWEEP") == "1":
        sweep = {}
        for nb in (1, 2, 4, 8, 16, 32, 64, 128, 256):
            bs, cs, ps = (blobs * 4)[:nb], (cms * 4)[:nb], (proofs * 4)[:nb]
            if kzg.verify_blob_kzg_proof_batch(bs, cs, ps) is not True:  # compile
                raise RuntimeError(f"sweep n={nb}: verify returned False")
            t0 = time.time()
            for _ in range(reps):
                kzg.verify_blob_kzg_proof_batch(bs, cs, ps)
            el = (time.time() - t0) / reps
            sweep[nb] = {"ms": round(el * 1000, 2), "per_s": round(nb / el, 2)}
            print(f"# sweep n={nb}: {el*1000:.1f} ms ({nb/el:.1f}/s)", file=sys.stderr)
        with open(os.path.join(repo, "BENCH_SWEEP.json"), "w") as f:
            json.dump(sweep, f, indent=1)
        details["sweep"] = sweep

    details["pallas"] = os.environ.get("KATETH_NO_PALLAS") != "1"
    with open(os.path.join(repo, "bench_details.json"), "w") as f:
        json.dump(details, f, indent=1)

    # methodology is IN the metric line: since round 4 the headline is the
    # STREAMING (pipelined) path, not the single-call latency of rounds
    # 1-3 — the extra fields keep round-over-round comparisons honest
    print(
        json.dumps(
            {
                "metric": "blob_proofs_verified_per_s_per_chip",
                "value": round(per_s, 2),
                "unit": "proofs/s/chip",
                "vs_baseline": round(per_s / PER_CHIP_TARGET, 4),
                "streaming": True,
                "stream_batches": streams,
                "batch": BATCH,
                "compute_only_per_s": round(compute_only_per_s, 2),
            }
        )
    )


def launch() -> int:
    """Run the bench in a subprocess; fall back to the XLA path on ANY
    failure so a metric line is always printed and the exit code is 0."""
    import subprocess

    here = os.path.abspath(__file__)
    # the pairing kernels appear in three separate graphs (batch-1 fused,
    # batch-64 fused, single verify) and each axon AOT compile of the
    # hard-part chain costs ~10-20 min (TPU_KERNEL_CHECK.json) — budget
    # the first rung generously before falling back
    timeout_s = int(os.environ.get("KATETH_BENCH_TIMEOUT", "7200"))
    if os.environ.get("KATETH_NO_PALLAS") == "1":
        attempts = [({}, "xla-only")]
    else:
        # default rung = every whole-chain kernel (all hardware-proven,
        # TPU_KERNEL_CHECK.json); middle rung drops only the pairing
        # kernels; last rung is pure XLA
        attempts = [
            ({}, "full-pallas"),
            ({"KATETH_NO_COMB": "1"}, "no-comb"),
            ({"KATETH_NO_PALLAS_PAIRING": "1", "KATETH_NO_COMB": "1"}, "no-pairing-kernels"),
            ({"KATETH_NO_PALLAS": "1"}, "xla-only"),
        ]

    for extra_env, mode in attempts:
        env = dict(os.environ, **extra_env)
        cmd = [sys.executable, here, "--inner"] + [
            a for a in sys.argv[1:] if a != "--inner"
        ]
        try:
            # stderr inherits (live progress); stdout captured for the line
            res = subprocess.run(
                cmd, env=env, stdout=subprocess.PIPE, text=True, timeout=timeout_s
            )
        except subprocess.TimeoutExpired:
            print(
                f"# bench attempt ({mode}) timed out after {timeout_s}s",
                file=sys.stderr,
            )
            continue
        line = None
        for raw in res.stdout.splitlines():
            raw = raw.strip()
            if raw.startswith("{"):
                line = raw
        if res.returncode == 0 and line:
            obj = json.loads(line)
            obj["pallas"] = mode != "xla-only"
            obj["pallas_mode"] = mode
            print(json.dumps(obj))
            return 0
        print(
            f"# bench attempt ({mode}) failed rc={res.returncode}; "
            f"stdout tail: {res.stdout[-500:]!r}",
            file=sys.stderr,
        )

    # every attempt failed — record that as data, not as a crash
    print(
        json.dumps(
            {
                "metric": "blob_proofs_verified_per_s_per_chip",
                "value": 0.0,
                "unit": "proofs/s/chip",
                "vs_baseline": 0.0,
                "error": "all bench attempts failed",
            }
        )
    )
    return 0


if __name__ == "__main__":
    if "--inner" in sys.argv:
        main()
    else:
        sys.exit(launch())
