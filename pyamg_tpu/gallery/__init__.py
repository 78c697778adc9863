"""Model problems for testing and benchmarking (reference ``pyamg/gallery``)."""

from pyamg_tpu.gallery.stencil import stencil_grid
from pyamg_tpu.gallery.laplacian import poisson, gauge_laplacian
from pyamg_tpu.gallery.diffusion import diffusion_stencil_2d, diffusion_stencil_3d
from pyamg_tpu.gallery.advection import advection_2d
from pyamg_tpu.gallery.elasticity import linear_elasticity, linear_elasticity_p1
from pyamg_tpu.gallery.mesh import regular_triangle_mesh
from pyamg_tpu.gallery.random_sparse import sprand
from pyamg_tpu.gallery.example import load_example
from pyamg_tpu.gallery.demo import demo

__all__ = [
    "stencil_grid", "poisson", "gauge_laplacian",
    "diffusion_stencil_2d", "diffusion_stencil_3d", "advection_2d",
    "linear_elasticity", "linear_elasticity_p1", "regular_triangle_mesh",
    "sprand", "load_example", "demo",
]
