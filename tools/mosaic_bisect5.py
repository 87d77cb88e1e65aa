"""Round 5 of the Mosaic layout.h:320 bisection — post const-init state.

Known from rounds 1-4 (tools/mosaic_bisect*.py, TPU_KERNEL_CHECK.json):
  - rank<=3 refs + CONSTANT fori_loop carry inits are necessary; with
    them the fp6-mul loop, both scalar ladders, the pow chains and the
    MSM kernel all PASS on hardware.
  - The Miller and hard-part kernels (already const-init, rank-2 refs)
    STILL crash VectorLayoutInferer.

Remaining structural suspects, isolated one per probe (all: fp12 carry,
constant init, 4-step fori_loop, L=128, grid=1):

  cyc_sqr_loop   — body = fp12_cyc_sqr only (18-row sqr codeblock)
  fp12_mul_loop  — body = fp12_mul(acc, g) only (54-row mul codeblock)
  fp12_mul_chunk — same, mul_many chunked to <= 6 pairs (18 rows) per
                   codeblock -> if _loop crashes and _chunk passes, the
                   fix is chunking Fp2Vec.mul_many
  smem_select    — body = cyc_sqr + fp12_select on an SMEM scalar bit
  powx_body      — the exact hard-part powx body (cyc_sqr + fp12_mul +
                   SMEM-bit select)
  powx_vmem      — powx body with VECTOR bits from VMEM (the pattern of
                   the hardware-proven ladders) instead of SMEM scalars

Run on TPU: python tools/mosaic_bisect5.py [probe ...]
Each probe prints PASS/CRASH and continues (the axon tunnel contains the
SIGABRT server-side and surfaces a JaxRuntimeError).
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

    D = FP.n_digits
    L = 128
    F = FieldVec(
        D, [int(x) for x in FP.mod_digits], [int(x) for x in FP.nprime_digits]
    )
    F2 = T.Fp2Vec(F)
    ONE = tuple(int(x) for x in FP.one_mont)

    bits_smem = jnp.asarray(np.array([[1], [0], [1], [1]], dtype=np.int32))
    bits_vmem = jnp.asarray(
        np.tile(np.array([[1], [0], [1], [1]], dtype=np.uint32), (1, L))
    )
    f12_in = jnp.zeros((12 * D, L), jnp.uint32)

    def const_fp12(like):
        one = T.dconst(ONE, like)
        zero = [jnp.zeros_like(like) for _ in range(D)]
        one2 = (list(one), list(zero))
        zero2 = (list(zero), list(zero))
        return ((one2, zero2, zero2), (zero2, zero2, zero2))

    def wrap(kernel, smem_bits: bool):
        bspec = (
            pl.BlockSpec((4, 1), lambda i: (0, 0), memory_space=pltpu.SMEM)
            if smem_bits
            else pl.BlockSpec((4, L), lambda i: (0, 0), memory_space=pltpu.VMEM)
        )
        fn = pl.pallas_call(
            kernel,
            grid=(1,),
            in_specs=[
                bspec,
                pl.BlockSpec((12 * D, L), lambda i: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (12 * D, L), lambda i: (0, 0), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((12 * D, L), jnp.uint32),
        )
        bits = bits_smem if smem_bits else bits_vmem
        return lambda: jax.block_until_ready(jax.jit(fn)(bits, f12_in))

    from kateth_tpu import pallas_pairing as PP

    def mk(body_fn, smem_bits=True):
        def kernel(b_ref, f_ref, o_ref):
            g = PP._read_fp12(f_ref, D)
            acc0 = const_fp12(f_ref[0, :])

            def body(k, acc):
                return body_fn(b_ref, k, acc, g)

            acc = jax.lax.fori_loop(0, 4, body, acc0)
            PP._write_fp12(o_ref, acc, D)

        return wrap(kernel, smem_bits)

    def chunked_mul_many(pairs, chunk=6):
        out = []
        for i in range(0, len(pairs), chunk):
            out += F2.mul_many(pairs[i : i + chunk])
        return out

    def fp12_mul_chunked(a, b):
        a0, a1 = a
        b0, b1 = b
        a01 = T.fp6_add(F2, a0, a1)
        b01 = T.fp6_add(F2, b0, b1)
        pairs = (
            T._fp6_mul_pairs(F2, a0, b0)
            + T._fp6_mul_pairs(F2, a1, b1)
            + T._fp6_mul_pairs(F2, a01, b01)
        )
        P = chunked_mul_many(pairs)
        t0 = T._fp6_mul_combine(F2, P[0:6])
        t1 = T._fp6_mul_combine(F2, P[6:12])
        s = T._fp6_mul_combine(F2, P[12:18])
        c0 = T.fp6_add(F2, t0, T.fp6_mul_by_v(F2, t1))
        c1 = T.fp6_sub(F2, s, T.fp6_add(F2, t0, t1))
        return (c0, c1)

    probes = {
        "cyc_sqr_loop": mk(lambda b, k, acc, g: T.fp12_cyc_sqr(F2, acc)),
        "fp12_mul_loop": mk(lambda b, k, acc, g: T.fp12_mul(F2, acc, g)),
        "fp12_mul_chunk": mk(lambda b, k, acc, g: fp12_mul_chunked(acc, g)),
        "smem_select": mk(
            lambda b, k, acc, g: T.fp12_select(
                F2, b[k, 0] > 0, T.fp12_cyc_sqr(F2, acc), acc
            )
        ),
        "powx_body": mk(
            lambda b, k, acc, g: T.fp12_select(
                F2,
                b[k, 0] > 0,
                T.fp12_mul(F2, T.fp12_cyc_sqr(F2, acc), g),
                T.fp12_cyc_sqr(F2, acc),
            )
        ),
        "powx_vmem": mk(
            lambda b, k, acc, g: T.fp12_select(
                F2,
                b[k, :] > 0,
                T.fp12_mul(F2, T.fp12_cyc_sqr(F2, acc), g),
                T.fp12_cyc_sqr(F2, acc),
            ),
            smem_bits=False,
        ),
    }

    names = sys.argv[1:] or list(probes)
    for name in names:
        fn = probes[name]
        t0 = time.time()
        try:
            fn()
            print(f"{name}: PASS ({time.time()-t0:.0f}s)", flush=True)
        except Exception as e:  # noqa: BLE001 — report and continue
            msg = str(e).splitlines()[0][:160]
            print(f"{name}: CRASH ({time.time()-t0:.0f}s) {msg}", flush=True)
    os._exit(0)


if __name__ == "__main__":
    main()
