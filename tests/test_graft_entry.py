"""Run the driver entry points in-suite.

Purpose is double: (a) regression-test the distributed dryrun pipeline,
(b) compile the EXACT programs `dryrun_multichip` runs on the same
8-device virtual CPU mesh, so the driver's out-of-band dryrun hits a warm
persistent compile cache and finishes well inside its timeout.
"""

import sys
import os

import jax
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def test_dryrun_multichip_impl():
    import __graft_entry__ as ge

    assert len(jax.devices()) >= 8, "conftest must provide 8 virtual devices"
    ge._dryrun_multichip_impl(8)


def test_entry_compiles_and_runs():
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out, ok = jax.jit(fn)(*args)
    jax.block_until_ready(out)
    assert bool(ok.all())
