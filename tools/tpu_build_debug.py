"""Isolate WHICH stage of the comb table build miscompiles on XLA:TPU.

tpu_comb_debug.py stage A showed ~15/16 random table rows wrong on TPU
while the identical graph is bit-exact on CPU.  This runs each build
stage as its OWN small jit on a few points and cross-checks against the
host oracle:

  1. basis    D_k = 2^(k*d) * P_i         (the lax.scan of d pdoubles)
  2. combine  T[j | 2^b] = T[j] + D_b     (the subset-doubling loop)
  3. invert   tree-based batched inversion
  4. affine   x = X z^-1, y = Y z^-1

Usage: python tools/tpu_build_debug.py
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

    import hashlib
    import pickle
    import random

    from kateth_tpu.curves import comb, g1, ops
    from kateth_tpu.fields import limbs as L
    from kateth_tpu.fields.specs import FP
    from kateth_tpu.kzg.setup import DEFAULT_TRUSTED_SETUP
    from kateth_tpu.oracle import curve as oc
    from kateth_tpu.oracle import field as of

    rng = random.Random(0xB11D)
    F = ops.FP_FIELD
    H, C = 12, 8  # tiny chunk of 8 points
    D_COLS = comb.comb_dims(H)

    with open(DEFAULT_TRUSTED_SETUP, "rb") as f:
        key = hashlib.sha256(f.read()).hexdigest()[:16]
    with open(os.path.join(REPO, ".cache", f"oracle_setup_{key}.pkl"), "rb") as f:
        osetup = pickle.load(f)
    opts = osetup.g1_lagrange_brp[:C]
    pts = tuple(jnp.asarray(c) for c in g1.from_oracle(opts))
    p("setup ready")

    # --- stage 0: the 3.2 GB gather itself (no point math) ---------------
    # tpu_comb_debug stage A read table rows through jnp.take on a
    # (16.7M, 48) = 3.2 GB buffer; check that gather in isolation with a
    # synthetic pattern table[r, c] = (r * 48 + c) mod 2^32 built on device.
    M = 4096 << 12

    @jax.jit
    def gather_probe(idx):
        flat = (
            jnp.arange(M, dtype=jnp.uint32)[:, None] * jnp.uint32(48)
            + jnp.arange(48, dtype=jnp.uint32)[None, :]
        )
        return jnp.take(flat, idx, axis=0)

    idx_np = np.sort(
        np.random.default_rng(0).integers(0, M, size=256).astype(np.int32)
    )
    got0 = np.asarray(gather_probe(jnp.asarray(idx_np)))
    want0 = (
        idx_np.astype(np.uint64)[:, None] * 48 + np.arange(48)[None, :]
    ).astype(np.uint32)
    ok0 = (got0 == want0).all()
    if not ok0:
        badr = np.where((got0 != want0).any(axis=1))[0]
        p(f"stage 0 bad indices (first 8): {idx_np[badr[:8]].tolist()}")
    p(f"stage 0 (3.2 GB gather): {'OK' if ok0 else 'FAIL'}")

    # --- stage 1: basis ---------------------------------------------------
    def basis_fn(pts):
        def step(pp, _):
            rec = pp
            for _ in range(D_COLS):
                pp = ops.pdouble(F, pp)
            return pp, rec

        _, basis = jax.lax.scan(step, pts, None, length=H)
        return basis

    basis = jax.jit(basis_fn)(pts)
    basis_host = tuple(np.asarray(c) for c in basis)  # (H, C, 24) x3
    ok = True
    for k in range(H):
        for i in range(C):
            got = g1.to_oracle(tuple(c[k][i][None] for c in basis_host))[0]
            want = oc.g1_mul(opts[i], 1 << (k * D_COLS))
            if not oc.g1_eq(got, want):
                ok = False
                p(f"stage 1 MISMATCH basis k={k} i={i}")
    p(f"stage 1 (basis scan): {'OK' if ok else 'FAIL'}")

    # host-correct basis for downstream isolation
    basis_true = g1.from_oracle(
        [oc.g1_mul(opts[i], 1 << (k * D_COLS)) for k in range(H) for i in range(C)]
    )
    basis_true = tuple(
        jnp.asarray(c.reshape(H, C, 24)) for c in (np.asarray(a) for a in basis_true)
    )

    # --- stage 2: subset combination --------------------------------------
    def combine_fn(basis):
        tab = tuple(
            jnp.broadcast_to(i[None], (C, 1, FP.n_digits)) for i in ops.identity(F)
        )
        for b in range(H):
            db = tuple(c[b][:, None] for c in basis)
            new = ops.padd(F, tab, tuple(jnp.broadcast_to(c, tab[0].shape) for c in db))
            tab = tuple(jnp.concatenate([t, n], axis=1) for t, n in zip(tab, new))
        return tab

    tab = jax.jit(combine_fn)(basis_true)
    tab_host = tuple(np.asarray(c) for c in tab)
    ok = True
    for _ in range(24):
        i = rng.randrange(C)
        j = rng.randrange(1, 1 << H)
        got = g1.to_oracle(tuple(c[i, j][None] for c in tab_host))[0]
        want = oc.g1_infinity()
        for k in range(H):
            if (j >> k) & 1:
                want = oc.g1_add(want, oc.g1_mul(opts[i], 1 << (k * D_COLS)))
        if not oc.g1_eq(got, want):
            ok = False
            p(f"stage 2 MISMATCH ({i},{j})")
    p(f"stage 2 (subset combine): {'OK' if ok else 'FAIL'}")

    # --- stage 3: tree inversion ------------------------------------------
    vals = [rng.randrange(1, of.P) for _ in range(C * (1 << H))]
    x = jnp.asarray(
        np.stack([FP.from_int(v) for v in vals]).reshape(C, 1 << H, 24)
    )
    inv = jax.jit(lambda x: comb._tree_inv(FP, x))(x)
    prod = jax.jit(lambda a, b: L.mont_mul(FP, a, b))(x, inv)
    prod_host = np.asarray(prod).reshape(-1, 24)
    one = np.asarray(FP.one_mont, dtype=np.uint32)
    bad = int((prod_host != one).any(axis=-1).sum())
    p(f"stage 3 (tree inversion): {'OK' if bad == 0 else f'FAIL ({bad} wrong)'}")

    # --- stage 4: affine conversion on the stage-2 table -------------------
    Z = tab[2]
    z_zero = jax.jit(L.is_zero)(Z)
    onem = jnp.broadcast_to(jnp.asarray(FP.one_mont, dtype=jnp.uint32), Z.shape)
    zsafe = jnp.where(np.asarray(z_zero)[..., None], onem, Z)
    zinv = jax.jit(lambda z: comb._tree_inv(FP, z))(zsafe)
    xy = jax.jit(
        lambda X, zi: (L.mont_mul(FP, X, zi), L.mont_mul(FP, tab[1], zi))
    )(tab[0], zinv)
    xh, yh = (np.asarray(c) for c in xy)
    ok = True
    for _ in range(24):
        i = rng.randrange(C)
        j = rng.randrange(1, 1 << H)
        want = oc.g1_infinity()
        for k in range(H):
            if (j >> k) & 1:
                want = oc.g1_add(want, oc.g1_mul(opts[i], 1 << (k * D_COLS)))
        wx, wy = oc.g1_to_affine(want)
        if (FP.to_int(xh[i, j], mont=True), FP.to_int(yh[i, j], mont=True)) != (wx, wy):
            ok = False
            p(f"stage 4 MISMATCH ({i},{j})")
    p(f"stage 4 (affine conversion): {'OK' if ok else 'FAIL'}")

    # --- stage 5: the production _build_chunk on the same points ----------
    bx, by, z0 = comb._build_chunk(F, pts, H, D_COLS)
    bx_host, by_host = np.asarray(bx), np.asarray(by)
    ok = True
    for _ in range(24):
        i = rng.randrange(C)
        j = rng.randrange(1, 1 << H)
        want = oc.g1_infinity()
        for k in range(H):
            if (j >> k) & 1:
                want = oc.g1_add(want, oc.g1_mul(opts[i], 1 << (k * D_COLS)))
        wx, wy = oc.g1_to_affine(want)
        r = (i << H) + j
        if (
            FP.to_int(bx_host[r], mont=True),
            FP.to_int(by_host[r], mont=True),
        ) != (wx, wy):
            ok = False
            p(f"stage 5 MISMATCH ({i},{j})")
    p(f"stage 5 (production _build_chunk, C=8): {'OK' if ok else 'FAIL'}")


if __name__ == "__main__":
    main()
