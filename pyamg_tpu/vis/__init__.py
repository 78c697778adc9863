"""Visualization helpers (reference ``pyamg/vis``)."""

from pyamg_tpu.vis.vtk_writer import write_vtu, write_basic_mesh
from pyamg_tpu.vis.vis_coarse import vis_aggregate_groups, vis_splitting

__all__ = ["write_vtu", "write_basic_mesh", "vis_aggregate_groups",
           "vis_splitting"]
