"""Chunked-prefix MSM kernel (interpret mode) vs the XLA scan.

Projective representatives differ between the two scan orders, so lanes
are compared with projective equality, not bitwise.
"""

import os
import random

import numpy as np
import pytest
import jax.numpy as jnp

# Opt-in for the same reason as test_pallas_pairing.py: interpret-mode
# compiles of the chunked-scan kernel body are too heavy for the CPU box.
pytestmark = pytest.mark.skipif(
    os.environ.get("KATETH_INTERPRET_TESTS") != "1",
    reason="interpret-mode kernel tests are opt-in (KATETH_INTERPRET_TESTS=1)",
)

from kateth_tpu.curves import g1, msm, ops, pallas_msm
from kateth_tpu.oracle import curve as oc
from kateth_tpu.oracle import field as of

rng = random.Random(0x6D736D70)
F1 = ops.FP_FIELD


@pytest.fixture
def interpret_mode(monkeypatch):
    monkeypatch.setenv("KATETH_PALLAS_INTERPRET", "1")


def test_chunked_prefix_matches_xla(interpret_mode):
    base = [oc.g1_mul(oc.G1_GEN, rng.randrange(1, of.R)) for _ in range(8)]
    base.append(oc.g1_infinity())  # identity lanes exercise completeness
    pts = g1.from_oracle((base * 456)[:4096])
    pts = tuple(jnp.asarray(a) for a in pts)
    assert pallas_msm.available(F1, 4096)

    kern = pallas_msm.prefix_scan_kernel(F1, pts, axis=-2)
    xla = msm.prefix_scan(F1, pts, axis=0)
    same = np.asarray(ops.peq(F1, kern, xla))
    assert same.shape == (4096,)
    assert same.all()
