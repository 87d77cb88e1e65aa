"""Stage-by-stage TPU debug of the comb commit mismatch (round 5).

CPU-proven facts: padd_mixed_flag body matches ops.padd + the oracle;
the comb_chain_sum layout emulated in jnp matches _chain_sum_xla; the
whole comb commit matches the oracle with the XLA fallback.  So the TPU
mismatch lives in (a) the device table build, (b) the big gather, or
(c) the Mosaic-compiled kernel.  This script isolates each with minimal
compile surface and prints a verdict per stage.

Usage: python tools/tpu_comb_debug.py
"""

from __future__ import annotations

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

    jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".cache", "jax"))

    from kateth_tpu.curves import comb, ops, pallas_msm
    from kateth_tpu.fields.specs import FP, FR
    from kateth_tpu.kzg import Kzg
    from kateth_tpu.kzg.setup import DEFAULT_TRUSTED_SETUP
    from kateth_tpu.oracle import curve as oc
    from kateth_tpu.oracle import field as of

    import hashlib
    import pickle
    import random

    rng = random.Random(0xDB9)
    F = ops.FP_FIELD
    H = 12
    D_COLS = comb.comb_dims(H)
    N = 4096

    with open(DEFAULT_TRUSTED_SETUP, "rb") as f:
        key = hashlib.sha256(f.read()).hexdigest()[:16]
    with open(os.path.join(REPO, ".cache", f"oracle_setup_{key}.pkl"), "rb") as f:
        osetup = pickle.load(f)
    kzg = Kzg.load_json(DEFAULT_TRUSTED_SETUP)
    p("setup loaded")

    table = comb.build_table(F, kzg.setup.g1_points, H)
    jax.block_until_ready(table)
    table_x, table_y = table
    p(f"table built: {table_x.shape} x2")

    # --- stage A: spot-check table rows vs the oracle -------------------
    checks = [(rng.randrange(N), rng.randrange(1, 1 << H)) for _ in range(16)]
    idx = jnp.asarray(np.array([(i << H) + j for i, j in checks], dtype=np.int32))
    x_host = np.asarray(jnp.take(table_x, idx, axis=0))
    y_host = np.asarray(jnp.take(table_y, idx, axis=0))
    ok = True
    for (i, j), xr, yr in zip(checks, x_host, y_host):
        want = oc.g1_infinity()
        for k in range(H):
            if (j >> k) & 1:
                want = oc.g1_add(
                    want, oc.g1_mul(osetup.g1_lagrange_brp[i], 1 << (k * D_COLS))
                )
        x = FP.to_int(xr, mont=True)
        y = FP.to_int(yr, mont=True)
        wx, wy = oc.g1_to_affine(want)
        if (x, y) != (wx, wy):
            ok = False
            p(f"stage A MISMATCH at ({i},{j})")
    p(f"stage A (table build + split-plane gather): {'OK' if ok else 'FAIL'}")

    # --- stage B: one column, kernel vs XLA fallback on device ----------
    B = 8  # small batch: lanes = 8*128 = 1024 (two tiles)
    vals = [
        [rng.randrange(of.R) for _ in range(N)] for _ in range(B)
    ]
    sc = jnp.asarray(
        np.stack(
            [np.stack([FR.from_int(v, mont=False) for v in row]) for row in vals]
        )
    )
    cols = jax.jit(lambda s: comb.column_digits(s, H, D_COLS), static_argnums=())(sc)
    col = jnp.copy(cols[3])  # (B, N)
    base = (jnp.arange(N, dtype=jnp.uint32) << H)[None, :]
    gidx = (col + base).astype(jnp.int32)
    xg = jnp.take(table_x, gidx, axis=0)
    yg = jnp.take(table_y, gidx, axis=0)
    flags = (col != 0).astype(jnp.uint32)
    jax.block_until_ready((xg, yg))
    p("stage B inputs gathered")

    chains = pallas_msm.comb_chain_sum(xg, yg, flags)
    kern = comb._sum_halving(F, chains, axis=1)
    fall = comb._chain_sum_xla(F, xg, yg, flags)
    same = np.asarray(ops.peq(F, kern, fall))
    p(f"stage B (kernel vs fallback, one column): {'OK' if same.all() else 'FAIL'} "
      f"({int((~same).sum())}/{B} lanes differ)")

    if not same.all():
        # which chain differs? compare chain totals against per-chain
        # fallback sums
        g = pallas_msm.COMB_CHAIN
        nch = N // g
        r4 = tuple(
            np.asarray(c) for c in chains
        )  # (B, chains, D) kernel chain totals
        bad = []
        for b in range(B):
            for ch in range(nch):
                xseg = xg[b, ch * g : (ch + 1) * g][None]
                yseg = yg[b, ch * g : (ch + 1) * g][None]
                fseg = flags[b, ch * g : (ch + 1) * g][None]
                want = comb._chain_sum_xla(F, xseg, yseg, fseg)
                wt = tuple(np.asarray(c)[0] for c in want)
                gt = tuple(c[b, ch] for c in r4)
                eqm = np.asarray(
                    ops.peq(F, tuple(jnp.asarray(a)[None] for a in gt),
                            tuple(jnp.asarray(a)[None] for a in wt))
                )
                if not eqm.all():
                    bad.append((b, ch))
                    if len(bad) >= 4:
                        break
            if len(bad) >= 4:
                break
        p(f"stage B bad (batch, chain) samples: {bad}")
        if bad:
            b, ch = bad[0]
            p(f"flags of bad chain: {np.asarray(flags[b, ch*g:(ch+1)*g])}")

    # --- stage C: full single-blob commit via fallback vs oracle --------
    real_avail = pallas_msm.comb_available
    pallas_msm.comb_available = lambda *a, **k: False  # force XLA fallback
    try:
        got = jax.jit(lambda s: comb.commit(F, table, s, H, N))(sc[:1])
        from kateth_tpu.curves import g1 as g1mod

        gpt = g1mod.to_oracle(tuple(np.asarray(c) for c in got))[0]
        want = oc.g1_msm(osetup.g1_lagrange_brp, vals[0])
        p(f"stage C (fallback commit vs oracle): {'OK' if oc.g1_eq(gpt, want) else 'FAIL'}")
    finally:
        pallas_msm.comb_available = real_avail


if __name__ == "__main__":
    main()
