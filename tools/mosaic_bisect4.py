"""Round 4: isolate the carry-INIT layout as the layout.h:320 trigger.

Round 3: loop_adds_only PASSES; fp6-mul loop CRASHES even though its
carry size (144 vectors) and codeblock width (18 rows) equal the
hardware-proven G2 ladder's.  The last structural difference: the ladder
initializes its carry from broadcast CONSTANTS, the crashing loops from
REF-READ slices.  Hypothesis: VectorLayout::join(init, yield) dies when
init is a ref-slice layout and yield a mul-output layout (1-D values).

Probes:
  const_init — fp6-mul loop, carry init = broadcast constants
  mulone_init — same, init = ref reads passed through one multiply-by-
                Montgomery-ONE codeblock (bit-exact no-op that gives the
                init mul-output provenance)
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

    bits = jnp.asarray(np.array([[1], [0], [1], [1]], dtype=np.int32))
    f6_in = jnp.zeros((6 * D, L), jnp.uint32)

    def fp6_loop_kernel(make_init):
        def kernel(b_ref, f_ref, o_ref):
            g = tuple(PP._read_fp2(f_ref, v, D) for v in range(3))
            acc0 = make_init(g, f_ref)

            def body(k, acc):
                p = T._fp6_mul_pairs(F2, acc, g)
                return T._fp6_mul_combine(F2, F2.mul_many(p))

            acc = jax.lax.fori_loop(1, b_ref.shape[0], body, acc0)
            for v in range(3):
                for u in range(2):
                    for i in range(D):
                        o_ref[(v * 2 + u) * D + i, :] = acc[v][u][i]

        return pl.pallas_call(
            kernel,
            grid=(1,),
            in_specs=[
                pl.BlockSpec((4, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
                pl.BlockSpec((6 * D, L), lambda i: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((6 * D, L), lambda i: (0, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((6 * D, L), jnp.uint32),
        )

    def const_init(g, f_ref):
        like = f_ref[0, :]
        one = T.dconst(ONE, like)
        zero = [jnp.zeros_like(like) for _ in range(D)]
        return ((list(one), list(zero)),) + tuple(
            (list(zero), list(zero)) for _ in range(2)
        )

    def mulone_init(g, f_ref):
        like = f_ref[0, :]
        one = T.dconst(ONE, like)
        one2 = (list(one), [jnp.zeros_like(like) for _ in range(D)])
        return tuple(x for x in F2.mul_many([(c, one2) for c in g]))

    probes = {
        "const_init": fp6_loop_kernel(const_init),
        "mulone_init": fp6_loop_kernel(mulone_init),
    }

    names = sys.argv[1:] or list(probes)
    for name in names:
        fn = probes[name]
        t0 = time.time()
        try:
            jax.block_until_ready(jax.jit(fn)(bits, f6_in))
            print(f"{name}: PASS ({time.time()-t0:.0f}s)", flush=True)
        except Exception as e:  # noqa: BLE001
            msg = str(e).splitlines()[0][:160]
            print(f"{name}: CRASH ({time.time()-t0:.0f}s) {msg}", flush=True)
    os._exit(0)


if __name__ == "__main__":
    main()
