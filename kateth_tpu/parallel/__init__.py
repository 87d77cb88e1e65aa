"""Multi-chip / multi-host scale-out.

The reference is single-threaded (an explicit `TODO: parallelize` sits at
reference src/kzg/poly.rs:43); this package is where the TPU build creates
the distributed dimension from scratch: device meshes, point-sharded MSM
with ICI reductions, and data-parallel blob batching.
"""

from .mesh import make_mesh, local_mesh
from .msm import sharded_msm, sharded_commit, sharded_commit_comb

__all__ = [
    "make_mesh",
    "local_mesh",
    "sharded_msm",
    "sharded_commit",
    "sharded_commit_comb",
]
