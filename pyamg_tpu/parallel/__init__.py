"""Distributed execution over a device Mesh.

The reference is strictly single-process (SURVEY.md §0, §2.3) — this layer
is new TPU-native design: every level's ELL arrays are 1-D row-partitioned
over a ``jax.sharding.Mesh`` axis ('rows'); vectors are sharded the same
way.  The jitted cycle/solve is compiled under GSPMD, which inserts the
collectives (all-gathers for the x[cols] gathers across row blocks, psums
for Krylov dot products) over ICI.  Coarse levels below a crossover are
replicated so the cycle tail runs redundantly and sync-free.
"""

from pyamg_tpu.parallel.partition import (
    make_row_mesh, pad_matrix_rows, shard_matrix, shard_hierarchy,
    replicate)
from pyamg_tpu.parallel.halo import HaloELL, build_halo
from pyamg_tpu.parallel.dist_setup import (
    distributed_sa_setup, distributed_classical_setup, dist_stencil_grid,
    dist_from_scipy, DistHierarchy, DistLevel)

__all__ = ["make_row_mesh", "pad_matrix_rows", "shard_matrix",
           "shard_hierarchy", "replicate", "HaloELL", "build_halo",
           "distributed_sa_setup", "distributed_classical_setup",
           "dist_stencil_grid", "dist_from_scipy", "DistHierarchy",
           "DistLevel"]
