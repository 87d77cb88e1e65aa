"""Find the safe single-buffer size for row gathers on this TPU.

r5 evidence: jnp.take row gathers from a (4096*2^12, 24) u32 plane
(1.6 GB) return corrupted rows on v5e at byte offsets ~726 MB+ while the
identical graph is bit-exact on CPU — and the packed 3.2 GB table was
worse (15/16 rows bad).  This probes synthetic iota tables at the plane
size implied by each comb_h so the production comb_h can be chosen from
measurement, not guesswork.  Tiny compiles: no point math.

Writes GATHER_PROBE.json at the repo root.

Usage: python tools/tpu_gather_probe.py   (TPU)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
t0 = time.time()


def p(msg):
    print(f"[{time.time()-t0:7.1f}s] {msg}", file=sys.stderr, flush=True)


def main() -> None:
    import jax
    import jax.numpy as jnp

    out = {"platform": jax.devices()[0].platform, "rows_checked": 4096}
    N, D = 4096, 24  # points, digits per coordinate plane

    for h in (8, 9, 10, 11, 12):
        M = N << h
        mb = M * D * 4 / 2**20

        # Materialize the table as a device-RESIDENT array via its own jit
        # (block_until_ready), then gather in a SEPARATE jit — matching
        # production (build_table then commit).  A single fused jit lets
        # XLA compute gathered values straight from the iota without ever
        # materializing the buffer, which probes nothing.
        @jax.jit
        def build(M=M):
            # flat[r, c] = r * 24 + c  (mod 2^32): every element encodes
            # its own address, so any mis-addressing is visible
            return (
                jnp.arange(M, dtype=jnp.uint32)[:, None] * jnp.uint32(D)
                + jnp.arange(D, dtype=jnp.uint32)[None, :]
            )

        table = jax.block_until_ready(build())

        @jax.jit
        def probe(tab, idx):
            return jnp.take(tab, idx, axis=0)

        rng = np.random.default_rng(h)
        idx_np = rng.integers(0, M, size=4096).astype(np.int32)
        got = np.asarray(probe(table, jnp.asarray(idx_np)))
        del table
        want = (
            idx_np.astype(np.uint64)[:, None] * D + np.arange(D)[None, :]
        ).astype(np.uint32)
        bad = np.where((got != want).any(axis=1))[0]
        entry = {
            "plane_mb": round(mb, 1),
            "bad_rows": int(bad.size),
        }
        if bad.size:
            off = idx_np[bad].astype(np.int64) * D * 4
            entry["min_bad_offset_mb"] = round(float(off.min()) / 2**20, 1)
            entry["max_bad_offset_mb"] = round(float(off.max()) / 2**20, 1)
        out[f"h{h}"] = entry
        p(f"h={h} ({mb:.0f} MB/plane): {bad.size}/4096 bad rows"
          + (f", first bad offset {entry['min_bad_offset_mb']} MB" if bad.size else ""))

    with open(os.path.join(REPO, "GATHER_PROBE.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
