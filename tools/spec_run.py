"""Run the FULL vendored spec-vector suite at mainnet size on the current
backend (real TPU by default) and write SPEC_RUN.json.

This is the driver-runnable equivalent of the reference's six
consensus-spec-test integration runs (reference src/kzg/setup.rs:319-463):
every case under tests/vectors/<op>/<case>/data.yaml is executed against
the device pipeline; `output: null` cases must raise KzgError, the rest
must match byte-exactly (or boolean-exactly).

Thanks to the canonical batch shapes in kzg/api.py, the whole suite
compiles only a handful of fused graphs (every batched op pads to the
canon_batch quantum — 64 lanes at mainnet — plus the single-point verify
graph), so one run fits the TPU compile budget.

Usage: python tools/spec_run.py            # current backend (TPU)
       KATETH_SPEC_CPU=1 python tools/spec_run.py   # CPU (slow compiles)
"""

from __future__ import annotations

import json
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
VECTOR_ROOT = os.path.join(REPO, "tests", "vectors")

OPS = (
    "blob_to_kzg_commitment",
    "compute_kzg_proof",
    "compute_blob_kzg_proof",
    "verify_kzg_proof",
    "verify_blob_kzg_proof",
    "verify_blob_kzg_proof_batch",
)


def unhex(h: str) -> bytes:
    return bytes.fromhex(h[2:] if h.startswith("0x") else h)


def run_case(kzg, op: str, case: dict):
    """Returns (ok: bool, detail: str)."""
    from kateth_tpu.kzg import KzgError

    i = case["input"]
    want = case["output"]

    def call():
        if op == "blob_to_kzg_commitment":
            return kzg.blob_to_kzg_commitment(unhex(i["blob"]))
        if op == "compute_kzg_proof":
            return kzg.compute_kzg_proof(unhex(i["blob"]), unhex(i["z"]))
        if op == "compute_blob_kzg_proof":
            return kzg.compute_blob_kzg_proof(unhex(i["blob"]), unhex(i["commitment"]))
        if op == "verify_kzg_proof":
            return kzg.verify_kzg_proof(
                unhex(i["proof"]), unhex(i["commitment"]), unhex(i["z"]), unhex(i["y"])
            )
        if op == "verify_blob_kzg_proof":
            return kzg.verify_blob_kzg_proof(
                unhex(i["blob"]), unhex(i["commitment"]), unhex(i["proof"])
            )
        if op == "verify_blob_kzg_proof_batch":
            return kzg.verify_blob_kzg_proof_batch(
                [unhex(b) for b in i["blobs"]],
                [unhex(c) for c in i["commitments"]],
                [unhex(p) for p in i["proofs"]],
            )
        raise AssertionError(op)

    try:
        got = call()
    except (KzgError, ValueError) as e:
        if want is None:
            return True, "rejected (expected)"
        return False, f"unexpected rejection: {e!r}"
    if want is None:
        return False, f"accepted input that must be rejected (got {got!r:.60})"
    if op == "blob_to_kzg_commitment" or op == "compute_blob_kzg_proof":
        ok = got == unhex(want)
    elif op == "compute_kzg_proof":
        ok = got[0] == unhex(want[0]) and got[1] == unhex(want[1])
    else:
        ok = got is want
    return ok, "match" if ok else f"MISMATCH got={got!r:.80} want={want!r:.80}"


def main() -> int:
    if os.environ.get("KATETH_SPEC_CPU") == "1":
        os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    if os.environ.get("KATETH_SPEC_CPU") == "1":
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".cache", "jax"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    import yaml
    from kateth_tpu.kzg import Kzg
    from kateth_tpu.kzg.setup import DEFAULT_TRUSTED_SETUP

    t_all = time.time()
    kzg = Kzg.load_json(DEFAULT_TRUSTED_SETUP)
    platform = jax.devices()[0].platform
    print(f"# spec_run on {platform}", file=sys.stderr)

    results: dict[str, dict] = {}
    passed = total = 0
    for op in OPS:
        opdir = os.path.join(VECTOR_ROOT, op)
        cases = sorted(os.listdir(opdir)) if os.path.isdir(opdir) else []
        op_res = {}
        for name in cases:
            path = os.path.join(opdir, name, "data.yaml")
            if not os.path.exists(path):
                continue
            with open(path) as f:
                case = yaml.safe_load(f)
            t0 = time.time()
            try:
                ok, detail = run_case(kzg, op, case)
            except Exception:
                ok, detail = False, "CRASH: " + traceback.format_exc(limit=3)
            dt = time.time() - t0
            total += 1
            passed += ok
            op_res[name] = {"ok": ok, "detail": detail, "s": round(dt, 2)}
            print(
                f"# {'PASS' if ok else 'FAIL'} {op}/{name} ({dt:.1f}s) {'' if ok else detail}",
                file=sys.stderr,
                flush=True,
            )
        results[op] = op_res

    out = {
        "platform": platform,
        "passed": passed,
        "total": total,
        "wall_s": round(time.time() - t_all, 1),
        "results": results,
    }
    with open(os.path.join(REPO, "SPEC_RUN.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({"spec_run": f"{passed}/{total}", "platform": platform,
                      "wall_s": out["wall_s"]}))
    return 0 if passed == total else 1


if __name__ == "__main__":
    sys.exit(main())
