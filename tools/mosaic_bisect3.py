"""Round 3 of the Mosaic layout.h:320 bisection.

Round 2: EVERY fori_loop with an fp12 carry + tower muls crashes (select
irrelevant), while the G2 ladder loop (fp2-triple carry = 144 digit
vectors, mul_many codeblocks of 18 rows) passes.  Candidate triggers:
  (a) carry size (288 vectors vs 144)
  (b) stacked-mul codeblock width (fp12_mul = 54 rows; ladder max 18)
These probes separate them:
  loop_adds_only   — fp12 carry, body = fp12_add (no muls)  -> (a) alone
  loop_fp6_mul     — fp6 carry (144 vectors), body = one fp6 mul (18 rows)
  loop_fp12_chunked— fp12 carry, fp12_mul with mul_many CHUNKED to <= 18
                     rows per codeblock -> if PASS, fix = chunk mul_many
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

    class ChunkedFp2(T.Fp2Vec):
        """mul_many split into <= 6-pair (18-row) codeblocks — the widest
        stacked multiply the hardware-proven ladder kernel uses."""

        CHUNK = 6

        def mul_many(self, pairs):
            out = []
            for i in range(0, len(pairs), self.CHUNK):
                out += T.Fp2Vec.mul_many(self, pairs[i : i + self.CHUNK])
            return out

        def sqr_many(self, xs):
            out = []
            for i in range(0, len(xs), self.CHUNK):
                out += T.Fp2Vec.sqr_many(self, xs[i : i + self.CHUNK])
            return out

    F2C = ChunkedFp2(F)

    bits = jnp.asarray(np.array([[1], [0], [1], [1]], dtype=np.int32))
    f_in = jnp.zeros((12 * D, L), jnp.uint32)
    f6_in = jnp.zeros((6 * D, L), jnp.uint32)

    def fp12_loop_kernel(body12):
        def kernel(b_ref, f_ref, o_ref):
            g = PP._read_fp12(f_ref, D)
            acc = jax.lax.fori_loop(
                1, b_ref.shape[0], lambda k, a: body12(b_ref, k, a, g), g
            )
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

    def fp6_loop_kernel():
        def kernel(b_ref, f_ref, o_ref):
            g = tuple(PP._read_fp2(f_ref, v, D) for v in range(3))

            def body(k, acc):
                p = T._fp6_mul_pairs(F2, acc, g)
                return T._fp6_mul_combine(F2, F2.mul_many(p))

            acc = jax.lax.fori_loop(1, b_ref.shape[0], body, g)
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

    probes = {
        "loop_adds_only": (
            fp12_loop_kernel(lambda b, k, a, g: T.fp12_add(None, a, g)
                             if hasattr(T, "fp12_add")
                             else tuple(T.fp6_add(F2, x, y) for x, y in zip(a, g))),
            (bits, f_in),
        ),
        "loop_fp6_mul": (fp6_loop_kernel(), (bits, f6_in)),
        "loop_fp12_chunked": (
            fp12_loop_kernel(
                lambda b, k, a, g: T.fp12_mul(F2C, T.fp12_cyc_sqr(F2C, a), g)
            ),
            (bits, f_in),
        ),
    }

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
