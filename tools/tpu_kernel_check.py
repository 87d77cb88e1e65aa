"""Validate every whole-chain Pallas kernel against the pure-Python oracle
ON REAL TPU HARDWARE, smallest shapes first.

The CPU suite cannot execute these kernels (interpret-mode compiles of the
unrolled bodies take ~an hour and trip XLA:CPU's long-process failure
mode), so this script is the kernels' correctness gate: it drives each
one through its public wrapper and compares bit-for-bit with the oracle.

Checks, in dependency order (each prints PASS/FAIL and continues):
  1. pow_const         — Fermat inverse chain kernel (limbs.pow_const)
  2. g2_scalar_mul     — 256-step twist ladder kernel
  3. subgroup ladder   — g1 255-step ladder kernel via decompress.subgroup_check
  4. miller_loop       — 63-step Miller kernel vs oracle reduced pairing
  5. final_exp         — cyclotomic hard-part kernel, bit-exact vs oracle
  6. verify_pairings   — end-to-end bilinearity boolean
  7. msm prefix kernel — chunked-scan Pippenger at N=4096 vs oracle MSM

Usage: python tools/tpu_kernel_check.py [--skip-msm]
"""

from __future__ import annotations

import os
import random
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    # this tool IS the hardware gate for the opt-in pairing kernels
    os.environ.setdefault("KATETH_PALLAS_PAIRING", "1")
    import jax

    jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".cache", "jax"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    import jax.numpy as jnp

    from kateth_tpu.fields import limbs as L, fp12
    from kateth_tpu.fields.specs import FP, FR
    from kateth_tpu.curves import g1, g2, ops, msm as msm_mod, decompress
    from kateth_tpu.oracle import curve as oc
    from kateth_tpu.oracle import field as of
    from kateth_tpu.oracle import pairing as op
    from kateth_tpu import pairing

    print(f"# backend: {jax.default_backend()}", file=sys.stderr)
    rng = random.Random(0x7B31C)
    failures = []

    def check(name, fn):
        t0 = time.time()
        try:
            ok = fn()
        except Exception as e:  # noqa: BLE001 — report and continue
            print(f"{name}: ERROR {type(e).__name__}: {e}", flush=True)
            failures.append(name)
            return
        dt = time.time() - t0
        print(f"{name}: {'PASS' if ok else 'FAIL'} ({dt:.1f}s)", flush=True)
        if not ok:
            failures.append(name)

    only_pairing = "--only-pairing" in sys.argv

    # 1. pow kernel: Fermat inversion in Fp
    def chk_pow():
        vals = [rng.randrange(1, of.P) for _ in range(4)]
        a = jnp.asarray(np.stack([FP.from_int(v) for v in vals]))
        out = jax.jit(lambda x: L.pow_const(FP, x, of.P - 2))(a)
        return all(
            FP.to_int(np.asarray(out)[i]) == pow(v, of.P - 2, of.P)
            for i, v in enumerate(vals)
        )

    if not only_pairing:
        check("pow_const", chk_pow)

    # 2. G2 ladder kernel
    def chk_g2():
        from kateth_tpu import pallas_pairing

        k = rng.randrange(1, of.R)
        want = oc.g2_mul(oc.G2_GEN, k)
        sc = jnp.asarray(np.stack([FR.from_int(k, mont=False)]))
        base = tuple(jnp.asarray(c) for c in g2.GENERATOR)
        baseb = tuple(jnp.broadcast_to(c, (1, *c.shape)) for c in base)
        out = jax.jit(pallas_pairing.g2_scalar_mul)(baseb, sc)
        got = g2.to_oracle(tuple(np.asarray(c) for c in out))[0]
        return oc.g2_eq(got, want)

    if not only_pairing:
        check("g2_scalar_mul", chk_g2)

    # 3. G1 subgroup ladder (Pallas whole-chain)
    def chk_sub():
        pts = [oc.g1_mul(oc.G1_GEN, rng.randrange(1, of.R)) for _ in range(3)]
        dp = tuple(jnp.asarray(c) for c in g1.from_oracle(pts))
        ok = jax.jit(decompress.subgroup_check)(dp)
        return bool(np.asarray(ok).all())

    if not only_pairing:
        check("subgroup_ladder", chk_sub)

    # 4+5+6. pairing chain
    a = rng.randrange(1, of.R)
    p1 = oc.g1_mul(oc.G1_GEN, rng.randrange(1, of.R))
    q2 = oc.g2_mul(oc.G2_GEN, rng.randrange(1, of.R))
    ap1 = oc.g1_mul(p1, a)
    aq2 = oc.g2_mul(q2, a)

    def dev_g1(pts):
        return tuple(jnp.asarray(c) for c in g1.from_oracle(pts))

    def dev_g2(pts):
        return tuple(jnp.asarray(c) for c in g2.from_oracle(pts))

    def chk_full_pairing():
        """Reduced pairing (miller kernel + hard-part kernel) vs oracle,
        bit-exact — covers checks 4 and 5 jointly (single Miller values
        legitimately differ by final-exp-killed factors, so only the
        reduced value is comparable)."""
        f = jax.jit(pairing.miller_loop)(dev_g1([p1]), dev_g2([q2]))
        red = jax.jit(pairing.final_exponentiation)(f)
        want = op.final_exponentiation(op.miller_loop(p1, q2))
        return fp12.to_ints(np.asarray(red)[0]) == want

    check("miller+final_exp_bitexact", chk_full_pairing)

    def chk_verify():
        f = jax.jit(pairing.verify_pairings)
        good = f((dev_g1([ap1]), dev_g2([q2])), (dev_g1([p1]), dev_g2([aq2])))
        bad = f((dev_g1([ap1]), dev_g2([q2])), (dev_g1([p1]), dev_g2([q2])))
        return bool(np.asarray(good)[0]) and not bool(np.asarray(bad)[0])

    check("verify_pairings", chk_verify)

    # 7. chunked-prefix MSM kernel at the real size
    if "--skip-msm" not in sys.argv and not only_pairing:

        def chk_msm():
            n = 4096
            base = [oc.g1_mul(oc.G1_GEN, rng.randrange(1, of.R)) for _ in range(16)]
            base.append(oc.g1_infinity())
            pts_o = (base * 241)[:n]
            scal = [rng.randrange(of.R) for _ in range(n)]
            dp = tuple(jnp.asarray(c) for c in g1.from_oracle(pts_o))
            sc = jnp.asarray(np.stack([FR.from_int(s, mont=False) for s in scal]))
            out = jax.jit(lambda p, s: msm_mod.msm(ops.FP_FIELD, p, s))(dp, sc)
            got = g1.to_oracle(tuple(np.asarray(c)[None] for c in out))[0]
            want = oc.g1_msm(pts_o, scal)
            return oc.g1_eq(got, want)

        check("msm_4096_kernel", chk_msm)

    print(
        ("ALL KERNEL CHECKS PASSED" if not failures else f"FAILURES: {failures}"),
        flush=True,
    )
    sys.stdout.flush()
    os._exit(0 if not failures else 1)


if __name__ == "__main__":
    main()
