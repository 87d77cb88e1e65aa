"""Round 2 of the Mosaic layout.h:320 bisection (see mosaic_bisect.py).

Round 1 result: every fp12 op alone PASSES (mul/sqr/cyc_sqr/conj/frob,
one full Miller step), but the powx fori_loop (fp12 carry, body =
cyc_sqr + mul + scalar-bit select, then conj) CRASHES.  These probes
split that loop apart.
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

    def loop_kernel(body12):
        """bits (SMEM) + fp12 in -> fori_loop(body12) -> fp12 out."""

        def kernel(b_ref, f_ref, o_ref):
            g = PP._read_fp12(f_ref, D)
            acc = jax.lax.fori_loop(1, b_ref.shape[0], lambda k, a: body12(b_ref, k, a, g), g)
            PP._write_fp12(o_ref, acc, D)

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

    def b_full(b_ref, k, acc, g):
        acc = T.fp12_cyc_sqr(F2, acc)
        m = T.fp12_mul(F2, acc, g)
        return T.fp12_select(F2, b_ref[k, 0] > 0, m, acc)

    def b_mul_only(b_ref, k, acc, g):
        m = T.fp12_mul(F2, acc, g)
        return T.fp12_select(F2, b_ref[k, 0] > 0, m, acc)

    def b_cyc_only(b_ref, k, acc, g):
        m = T.fp12_cyc_sqr(F2, acc)
        return T.fp12_select(F2, b_ref[k, 0] > 0, m, acc)

    def b_no_select(b_ref, k, acc, g):
        return T.fp12_mul(F2, T.fp12_cyc_sqr(F2, acc), g)

    def b_vec_mask(b_ref, k, acc, g):
        acc = T.fp12_cyc_sqr(F2, acc)
        m = T.fp12_mul(F2, acc, g)
        like = acc[0][0][0][0]
        mask = jnp.broadcast_to(b_ref[k, 0] > 0, like.shape)
        return T.fp12_select(F2, mask, m, acc)

    probes["loop_full"] = loop_kernel(b_full)           # expect CRASH (= powx)
    probes["loop_mul_only"] = loop_kernel(b_mul_only)
    probes["loop_cyc_only"] = loop_kernel(b_cyc_only)
    probes["loop_no_select"] = loop_kernel(b_no_select)
    probes["loop_vec_mask"] = loop_kernel(b_vec_mask)

    names = sys.argv[1:] or list(probes)
    for name in names:
        fn = probes[name]
        t0 = time.time()
        try:
            jax.block_until_ready(jax.jit(fn)(bits, f_in))
            print(f"{name}: PASS ({time.time()-t0:.0f}s)", flush=True)
        except Exception as e:  # noqa: BLE001
            msg = str(e).splitlines()[0][:160]
            print(f"{name}: CRASH ({time.time()-t0:.0f}s) {msg}", flush=True)
    os._exit(0)


if __name__ == "__main__":
    main()
