"""Multi-host blob-proof pipeline (BASELINE config 5).

Real `jax.distributed` bring-up: the parent spawns N python processes,
each owning K virtual CPU devices; the children rendezvous through a
local coordinator, build ONE global mesh over all N*K devices, and run
the full data-parallel pipeline (blob decode -> barycentric evaluate ->
quotient -> sharded commitment MSM) as a single SPMD program whose batch
axis spans processes.  A point-sharded MSM (`sharded_msm`) additionally
exercises a cross-process all_gather + tree reduction — the ICI/DCN
collective path of a real pod.

Every process checks its OWN addressable output shards bit-exactly
against the pure-Python oracle, so a sharding/collective bug on any rank
fails the run (rc != 0), not just rank 0.

On this box the processes share one physical core, so wall-clock numbers
measure sharding/collective overhead, not speedup (same caveat as
tools/scaling_bench.py, recorded in the JSON).  On a real multi-host pod
the same script, pointed at real coordinator/process env, measures
config-5 scaling; the program is identical.

The reference has no multi-process anything (an explicit `TODO:
parallelize` sits at reference src/kzg/poly.rs:43); anchor for the
pipeline semantics is setup.rs:167-194.

Usage:
  python tools/multihost_pipeline.py [--procs 2] [--devs 4] [--n 64]
Writes MULTIHOST.json at the repo root (parent mode).
"""

from __future__ import annotations

import argparse
import json
import os
import socket
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


# ---------------------------------------------------------------------------
# child: one process of the SPMD program
# ---------------------------------------------------------------------------

def child(args) -> None:
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".cache", "jax"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    jax.distributed.initialize(
        coordinator_address=f"127.0.0.1:{args.port}",
        num_processes=args.procs,
        process_id=args.proc_id,
    )
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from kateth_tpu.fields.specs import FR
    from kateth_tpu.kzg import DeviceSetup, KzgConfig, protocol
    from kateth_tpu.oracle.kzg import OracleSetup, blob_to_bytes
    from kateth_tpu.oracle import field as of
    from kateth_tpu.oracle import curve as oc
    from kateth_tpu.curves import g1
    from kateth_tpu.parallel import make_mesh, sharded_commit, sharded_msm
    from kateth_tpu.parallel.mesh import AXIS

    pid = args.proc_id
    n_global = args.procs * args.devs
    assert jax.process_count() == args.procs, jax.process_count()
    assert jax.device_count() == n_global, jax.device_count()
    assert len(jax.local_devices()) == args.devs

    N = args.n
    B = 2 * n_global  # 2 blobs per device
    mesh = make_mesh()  # global mesh over all processes' devices

    # deterministic inputs: every process derives the same full batch
    osetup = OracleSetup.generate_insecure(N, g2_len=2)
    dsetup = DeviceSetup.from_oracle(osetup, KzgConfig(n=N, g2_len=2))
    rng = np.random.default_rng(23)
    vals = [
        [int.from_bytes(rng.bytes(32), "big") % of.R for _ in range(N)]
        for _ in range(B)
    ]
    blobs = [blob_to_bytes(v) for v in vals]
    blob_np = np.frombuffer(b"".join(blobs), dtype=np.uint8).reshape(B, 32 * N)

    bsh = NamedSharding(mesh, P(AXIS))
    blob_arr = jax.make_array_from_callback(
        blob_np.shape, bsh, lambda idx: blob_np[idx]
    )
    rep = NamedSharding(mesh, P())
    roots = jax.device_put(dsetup.roots, rep)
    inv_roots = jax.device_put(dsetup.inv_roots, rep)
    points = tuple(jax.device_put(c, rep) for c in dsetup.g1_points)

    # ---- the DP pipeline as two SPMD programs around the host Fiat-Shamir
    # round trip (reference Blob::challenge, blob.rs:78-97): decode+commit
    # on the mesh -> allgather compressed commitments -> SHA-256 challenges
    # on the host -> challenges back onto the mesh for evaluate/quotient.
    from jax.experimental import multihost_utils

    from kateth_tpu import native
    from kateth_tpu.curves import compress
    from kateth_tpu.oracle.kzg import FS_DOMAIN

    @jax.jit
    def decode_step(blob_bytes):
        return protocol.decode_blobs(blob_bytes)

    @jax.jit
    def quotient_step(elements, z_plain, roots, inv_roots):
        em = protocol.fr_to_mont(elements)
        z = protocol.fr_to_mont(z_plain)
        y = protocol.evaluate(em, z, roots, N)
        q = protocol.quotient(em, z, y, roots, inv_roots)
        return protocol.fr_from_mont(q)

    commit_j = jax.jit(lambda s: sharded_commit(mesh, points, s, window=4))

    def fiat_shamir(commits):
        """Cross-process allgather of the batch-sharded commitments, then
        host-side batched SHA-256 -> sharded challenge planes."""
        full = tuple(multihost_utils.process_allgather(c, tiled=True) for c in commits)
        comp = compress.points_to_bytes(tuple(np.asarray(c) for c in full))
        digests = native.challenges(
            FS_DOMAIN + N.to_bytes(16, "big"), b"".join(blobs), 32 * N,
            b"".join(comp), B,
        )
        z_np = np.stack(
            [FR.from_int(int.from_bytes(d, "big") % of.R, mont=False) for d in digests]
        )
        z_sh = jax.make_array_from_callback(z_np.shape, bsh, lambda idx: z_np[idx])
        return comp, z_sh

    elements, ok = decode_step(blob_arr)
    commits = commit_j(elements)
    comp_bytes, z_sharded = fiat_shamir(commits)
    q_plain = quotient_step(elements, z_sharded, roots, inv_roots)
    proofs = commit_j(q_plain)
    jax.block_until_ready((commits, proofs))

    # ---- every rank checks its local commitment shards vs the oracle ----
    want = {i: osetup.blob_to_commitment(blobs[i]) for i in range(B)}

    def local_blocks(arr):
        """{batch_lo: (np_block, batch_hi)} over this rank's shards."""
        out = {}
        for sh in arr.addressable_shards:
            idx = sh.index[0]
            lo = idx.start or 0
            hi = idx.stop if idx.stop is not None else arr.shape[0]
            out[lo] = (np.asarray(sh.data), hi)
        return out

    xb, yb, zb = (local_blocks(c) for c in commits)
    checked = 0
    for lo, (xd, hi) in xb.items():
        yd, zd = yb[lo][0], zb[lo][0]
        for row, bi in enumerate(range(lo, hi)):
            pt = g1.to_oracle((xd[row][None], yd[row][None], zd[row][None]))[0]
            assert oc.g1_compress(pt) == want[bi], f"rank {pid}: blob {bi} mismatch"
            checked += 1
    assert checked > 0, f"rank {pid}: no addressable shards"

    # ---- per-rank PROOF shards vs the oracle: this closes the loop over
    # the whole FS round trip (oracle recomputes the challenge from the
    # blob + commitment bytes itself, so a domain-separator/endianness bug
    # in the device pipeline fails here)
    xp, yp, zp = (local_blocks(c) for c in proofs)
    for lo, (xd, hi) in xp.items():
        yd, zd = yp[lo][0], zp[lo][0]
        for row, bi in enumerate(range(lo, hi)):
            pt = g1.to_oracle((xd[row][None], yd[row][None], zd[row][None]))[0]
            want_proof = osetup.blob_proof(blobs[bi], want[bi])
            assert oc.g1_compress(pt) == want_proof, (
                f"rank {pid}: blob {bi} proof mismatch (Fiat-Shamir path)"
            )

    # ---- TP: point-sharded MSM of blob 0 across ALL processes ----
    el0_np = np.stack([FR.from_int(v, mont=False) for v in vals[0]])
    pt_np = tuple(np.asarray(c) for c in dsetup.g1_points)
    pts_sh = tuple(
        jax.make_array_from_callback(
            c.shape, NamedSharding(mesh, P(AXIS, *([None] * (c.ndim - 1)))),
            lambda idx, c=c: c[idx],
        )
        for c in pt_np
    )
    sc_sh = jax.make_array_from_callback(
        el0_np.shape, NamedSharding(mesh, P(AXIS, None)), lambda idx: el0_np[idx]
    )
    tp = sharded_msm(mesh, pts_sh, sc_sh, window=4)
    # output is replicated; this rank reads its local replica
    tp_np = tuple(np.asarray(c.addressable_shards[0].data) for c in tp)
    tp_pt = g1.to_oracle(tuple(c[None] for c in tp_np))[0]
    assert oc.g1_compress(tp_pt) == want[0], f"rank {pid}: TP MSM mismatch"

    # ---- timing (see module docstring caveat); the loop includes the
    # host Fiat-Shamir round trip, so pipeline_ms measures host<->device
    # overlap, not just device math ----
    reps = int(os.environ.get("KATETH_BENCH_REPS", "3"))
    t0 = time.time()
    for _ in range(reps):
        el, _ = decode_step(blob_arr)
        cm = commit_j(el)
        _, z_sh = fiat_shamir(cm)
        q = quotient_step(el, z_sh, roots, inv_roots)
        jax.block_until_ready(commit_j(q))
    dt = (time.time() - t0) / reps

    if pid == 0:
        print(json.dumps({
            "procs": args.procs,
            "devs_per_proc": args.devs,
            "global_devices": n_global,
            "batch": B,
            "n": N,
            "pipeline_ms": round(dt * 1000, 2),
            "blobs_per_s": round(B / dt, 2),
            "local_shards_checked": checked,
        }))
    else:
        print(f"# rank {pid}: {checked} local shards oracle-checked OK",
              file=sys.stderr)
    sys.stdout.flush()
    sys.stderr.flush()
    os._exit(0)  # skip teardown hangs (same rationale as __graft_entry__)


# ---------------------------------------------------------------------------
# parent: spawn + supervise
# ---------------------------------------------------------------------------

def parent(args) -> int:
    port = _free_port()
    env_base = dict(os.environ)
    procs = []
    for i in range(args.procs):
        env = dict(env_base)
        env["JAX_PLATFORMS"] = "cpu"
        env["XLA_FLAGS"] = (
            f"--xla_force_host_platform_device_count={args.devs} "
            "--xla_cpu_max_isa=AVX2"
        )
        procs.append(
            subprocess.Popen(
                [sys.executable, os.path.abspath(__file__), "--child",
                 "--proc-id", str(i), "--procs", str(args.procs),
                 "--devs", str(args.devs), "--n", str(args.n),
                 "--port", str(port)],
                env=env,
                stdout=subprocess.PIPE if i == 0 else sys.stderr,
                text=True,
            )
        )
    try:
        out0, _ = procs[0].communicate(timeout=args.timeout)
        rcs = [procs[0].returncode] + [
            p.wait(timeout=args.timeout) for p in procs[1:]
        ]
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        print("FAIL: multihost pipeline timed out", file=sys.stderr)
        return 1
    if any(rcs):
        print(f"FAIL: child rcs {rcs}", file=sys.stderr)
        return 1
    line = [ln for ln in out0.splitlines() if ln.startswith("{")][-1]
    result = json.loads(line)
    result["caveat"] = (
        "virtual CPU devices share one physical core; wall numbers measure "
        "collective/sharding overhead, not speedup — see module docstring"
    )
    with open(os.path.join(REPO, "MULTIHOST.json"), "w") as fh:
        json.dump(result, fh, indent=1)
    print(json.dumps(result))
    return 0


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--child", action="store_true")
    ap.add_argument("--proc-id", type=int, default=0)
    ap.add_argument("--procs", type=int, default=2)
    ap.add_argument("--devs", type=int, default=4)
    ap.add_argument("--n", type=int, default=64)
    ap.add_argument("--port", type=int, default=0)
    ap.add_argument("--timeout", type=int, default=3000)
    args = ap.parse_args()
    if args.child:
        child(args)
    else:
        sys.exit(parent(args))


if __name__ == "__main__":
    main()
