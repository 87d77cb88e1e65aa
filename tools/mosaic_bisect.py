"""Bisect the Mosaic layout.h:320 crash in the pairing kernel bodies.

HISTORICAL REPRO TOOL (kept as the one documented bisection harness; the
rounds-2..5 variants were collapsed into the findings below).  Conclusions
of the full bisection, now encoded as invariants in pallas_pairing.py /
pallas_mont.py and recorded in TPU_KERNEL_CHECK.json:
  - kernel refs must be rank <= 3;
  - every fori_loop carry must be initialized from CONSTANTS (jnp.zeros /
    broadcast of a literal), never from a value computed before the loop —
    a computed init makes Mosaic's VectorLayoutInferer join a rank-1
    layout with the loop body's rank-2 layout and abort at layout.h:320;
  - with both rules applied, all whole-chain kernels (ladder, pow, Miller,
    hard part) compile and PASS bit-exact on v5e.

The round-3 rank-2 refactor fixed the MSM/ladder kernels, but the Miller
and hard-part kernels still abort Mosaic's VectorLayoutInferer
(inferElementwise -> VectorLayout::join, arr.size()==1 vs layout_rank 2).
The tunnel's compile helper turns the SIGABRT into a catchable
JaxRuntimeError, so this script compiles one candidate construct at a
time on the real backend and reports PASS/CRASH for each.

Usage: python tools/mosaic_bisect.py [probe names...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from kateth_tpu.fields.pallas_mont import FieldVec
    from kateth_tpu.fields import pallas_tower as T
    from kateth_tpu.fields.specs import FP
    from kateth_tpu import pallas_pairing as PP

    D = FP.n_digits
    L = 128
    F = FieldVec(
        D, [int(x) for x in FP.mod_digits], [int(x) for x in FP.nprime_digits]
    )
    F2 = T.Fp2Vec(F)
    ONE = tuple(int(x) for x in FP.one_mont)

    def compile_fp12_kernel(name, body12):
        """body12(f) -> fp12; kernel reads one fp12, writes one."""

        def kernel(f_ref, o_ref):
            f = PP._read_fp12(f_ref, D)
            PP._write_fp12(o_ref, body12(f), D)

        return pl.pallas_call(
            kernel,
            grid=(1,),
            in_specs=[pl.BlockSpec((12 * D, L), lambda i: (0, 0), memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((12 * D, L), lambda i: (0, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((12 * D, L), jnp.uint32),
        )

    def compile_fp12_bits_kernel(name, body12):
        """body12(bits_ref, f) -> fp12 with an SMEM bit stream."""

        def kernel(b_ref, f_ref, o_ref):
            f = PP._read_fp12(f_ref, D)
            PP._write_fp12(o_ref, body12(b_ref, f), D)

        return pl.pallas_call(
            kernel,
            grid=(1,),
            in_specs=[
                pl.BlockSpec((4, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
                pl.BlockSpec((12 * D, L), lambda i: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((12 * D, L), lambda i: (0, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((12 * D, L), jnp.uint32),
        )

    f_in = jnp.zeros((12 * D, L), jnp.uint32)
    bits = jnp.asarray(np.array([[1], [0], [1], [1]], dtype=np.int32))

    probes = {}

    probes["fp12_mul"] = (
        compile_fp12_kernel("fp12_mul", lambda f: T.fp12_mul(F2, f, f)),
        (f_in,),
    )
    probes["fp12_sqr"] = (
        compile_fp12_kernel("fp12_sqr", lambda f: T.fp12_sqr(F2, f)),
        (f_in,),
    )
    probes["fp12_cyc_sqr"] = (
        compile_fp12_kernel("fp12_cyc_sqr", lambda f: T.fp12_cyc_sqr(F2, f)),
        (f_in,),
    )
    probes["fp12_conj"] = (
        compile_fp12_kernel("fp12_conj", lambda f: T.fp12_conj(F2, f)),
        (f_in,),
    )
    probes["fp12_frob"] = (
        compile_fp12_kernel("fp12_frob", lambda f: T.fp12_frob(F2, f, PP._GAMMAS)),
        (f_in,),
    )

    def select_body(b_ref, f):
        bit = b_ref[1, 0] > 0
        return T.fp12_select(F2, bit, T.fp12_cyc_sqr(F2, f), f)

    probes["cyc_sqr_select"] = (
        compile_fp12_bits_kernel("cyc_sqr_select", select_body),
        (bits, f_in),
    )

    def powx_loop_body(b_ref, g):
        def body(k, acc):
            acc = T.fp12_cyc_sqr(F2, acc)
            m = T.fp12_mul(F2, acc, g)
            bit = b_ref[k, 0] > 0
            return T.fp12_select(F2, bit, m, acc)

        acc = jax.lax.fori_loop(1, b_ref.shape[0], body, g)
        return T.fp12_conj(F2, acc)

    probes["powx_loop"] = (
        compile_fp12_bits_kernel("powx_loop", powx_loop_body),
        (bits, f_in),
    )

    # one Miller step (no loop): lines + merge + sparse mul
    def miller_step_kernel():
        def kernel(p_ref, q_ref, o_ref):
            one = T.dconst(ONE, p_ref[0, :])
            zero = [jnp.zeros_like(p_ref[0, :]) for _ in range(D)]
            xp = PP._fp_rows(p_ref, 0, D)
            yp = PP._fp_rows(p_ref, 1, D)
            xq = PP._read_fp2(q_ref, 0, D)
            yq = PP._read_fp2(q_ref, 1, D)
            one2 = (list(one), list(zero))
            zero2 = (list(zero), list(zero))
            zero6 = (zero2, zero2, zero2)
            f = ((one2, zero2, zero2), zero6)
            Tpt = (xq, yq, (list(one), list(zero)))
            a, b, c = PP._line_dbl(F2, Tpt)
            bxp, cyp = F2.scale_fp_many([(b, xp), (c, yp)])
            Tpt = PP._pdouble(F2, Tpt)
            a2, b2, c2 = PP._line_add(F2, Tpt, (xq, yq))
            bxp2, cyp2 = F2.scale_fp_many([(b2, xp), (c2, yp)])
            line = PP._merge_lines(F2, (a, bxp, cyp), (a2, bxp2, cyp2))
            out = T.fp12_mul(F2, T.fp12_sqr(F2, f), line)
            PP._write_fp12(o_ref, out, D)

        return pl.pallas_call(
            kernel,
            grid=(1,),
            in_specs=[
                pl.BlockSpec((2 * D, L), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((4 * D, L), lambda i: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((12 * D, L), lambda i: (0, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((12 * D, L), jnp.uint32),
        )

    probes["miller_step"] = (
        miller_step_kernel(),
        (jnp.zeros((2 * D, L), jnp.uint32), jnp.zeros((4 * D, L), jnp.uint32)),
    )

    names = sys.argv[1:] or list(probes)
    for name in names:
        fn, args = probes[name]
        t0 = time.time()
        try:
            jax.block_until_ready(jax.jit(fn)(*args))
            print(f"{name}: PASS ({time.time()-t0:.0f}s)", flush=True)
        except Exception as e:  # noqa: BLE001
            msg = str(e).splitlines()[0][:160]
            print(f"{name}: CRASH ({time.time()-t0:.0f}s) {msg}", flush=True)
    os._exit(0)


if __name__ == "__main__":
    main()
