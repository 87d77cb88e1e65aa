"""Distributed MSM and commitments.

Two orthogonal sharding strategies (composable in principle, exposed
separately):

* **Point sharding** (tensor-parallel analog): the N points and scalars of
  ONE multiscalar multiplication are split across the mesh; every device
  runs the full windowed-Pippenger kernel on its N/D-point shard — an MSM
  is a plain sum, so shards combine with a single point-add reduction over
  ICI (all_gather of D projective points + a local log-depth tree; the
  payload is ~kB, so latency not bandwidth bound).  This is how the 2^12 —
  2^20 MSM sweep scales (BASELINE config 4); no reference counterpart
  exists (the reference's Pippenger is single-threaded, src/bls.rs:415-437).

* **Blob sharding** (data-parallel analog): a batch of independent
  commitments splits its batch axis across the mesh with the point table
  replicated; zero communication until the caller gathers the results
  (BASELINE config 5 pipeline).
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P
from jax import shard_map

from ..curves import ops, msm as msm_mod
from .mesh import AXIS

F1 = ops.FP_FIELD


def _allreduce_point(F, p, axis_name):
    """Point-add reduction across a mesh axis: all_gather + local tree."""
    gathered = tuple(jax.lax.all_gather(c, axis_name, axis=0) for c in p)
    return msm_mod.tree_sum(F, gathered, axis=0)


# The shard_map programs are memoized on (mesh, window): repeated calls —
# e.g. the commitment and proof passes of one pipeline step, which share
# shapes — hit the in-process jit cache instead of re-tracing a fresh
# closure (a measurable compile-surface win on the 1-core dryrun box).


@lru_cache(maxsize=None)
def _sharded_msm_prog(mesh, window: int):
    pspec = (P(AXIS), P(AXIS), P(AXIS))

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(pspec, P(AXIS)),
        out_specs=(P(), P(), P()),
        check_vma=False,  # the all_gather+tree reduction IS replicated,
        # but the checker cannot infer it through the point-add tree
    )
    def run(pts, scal):
        local = msm_mod.msm(F1, pts, scal, c=window)
        return _allreduce_point(F1, local, AXIS)

    return jax.jit(run)


def sharded_msm(mesh, points, scalars_plain, window: int = 8):
    """One MSM with points+scalars sharded over the mesh's AXIS.

    points: projective tuple, coords (N, ...); scalars (N, 16) plain.
    N must divide evenly by the mesh size.  Returns a replicated point.
    """
    return _sharded_msm_prog(mesh, window)(points, scalars_plain)


@lru_cache(maxsize=None)
def _sharded_commit_prog(mesh, window: int):
    pspec = (P(), P(), P())

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(pspec, P(AXIS)),
        out_specs=(P(AXIS), P(AXIS), P(AXIS)),
    )
    def run(pts, scal):
        return msm_mod.msm(F1, pts, scal, c=window)

    return jax.jit(run)


def sharded_commit(mesh, points, scalars_batch, window: int = 8):
    """Batched commitments, batch axis sharded, point table replicated.

    points: coords (N, ...); scalars_batch: (B, N, 16) plain, B divisible
    by mesh size.  Returns batched points, batch-sharded.
    """
    return _sharded_commit_prog(mesh, window)(points, scalars_batch)


@lru_cache(maxsize=None)
def _sharded_commit_comb_prog(mesh, h: int, n: int):
    @partial(
        shard_map,
        mesh=mesh,
        in_specs=((P(), P()), P(AXIS)),  # (x, y) table planes replicated
        out_specs=(P(AXIS), P(AXIS), P(AXIS)),
    )
    def run(table, scal):
        from ..curves import comb

        return comb.commit(F1, table, scal, h, n)

    return jax.jit(run, static_argnums=())


def sharded_commit_comb(mesh, table, scalars_batch, h: int):
    """Batched FIXED-BASE comb commitments (curves/comb.py), batch axis
    sharded with the comb row table replicated — the DP layout of the
    round-5 commit hot path.  scalars_batch: (B, N, 16) plain, B
    divisible by mesh size.  Returns batched points, batch-sharded."""
    n = scalars_batch.shape[-2]
    return _sharded_commit_comb_prog(mesh, h, n)(table, scalars_batch)
