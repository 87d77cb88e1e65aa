"""Multi-process (jax.distributed) pipeline smoke test.

Spawns 2 coordinator-rendezvous'd python processes x 2 virtual CPU
devices each and runs tools/multihost_pipeline.py end-to-end: global
4-device mesh spanning both processes, DP pipeline + batch-sharded
commitment MSM, cross-process all_gather point reduction, per-rank
oracle checks of the local shards.

Opt-in (KATETH_MULTIHOST_TESTS=1): the children cannot share this
suite's process-level compile cache warmup and each brings up its own
XLA:CPU client, which is too heavy to run on every suite invocation on
this 1-core box.  CI's nightly full tier sets the flag.
"""

import os
import subprocess
import sys

import pytest

pytestmark = pytest.mark.skipif(
    os.environ.get("KATETH_MULTIHOST_TESTS") != "1",
    reason="multi-process test is opt-in (KATETH_MULTIHOST_TESTS=1)",
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_multihost_pipeline_2proc():
    env = dict(os.environ)
    # the parent re-pins JAX_PLATFORMS/XLA_FLAGS per child; drop this
    # test process's virtual-device forcing so children control it
    env.pop("XLA_FLAGS", None)
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "multihost_pipeline.py"),
         "--procs", "2", "--devs", "2", "--n", "64", "--timeout", "1500"],
        env=env,
        capture_output=True,
        text=True,
        timeout=1800,
    )
    assert proc.returncode == 0, f"stdout={proc.stdout}\nstderr={proc.stderr[-2000:]}"
    assert '"local_shards_checked"' in proc.stdout
