"""Model problems for testing and benchmarking (reference ``pyamg/gallery``)."""

from pyamg_tpu.gallery.stencil import stencil_grid
from pyamg_tpu.gallery.laplacian import poisson, gauge_laplacian
from pyamg_tpu.gallery.diffusion import diffusion_stencil_2d, diffusion_stencil_3d

__all__ = [
    "stencil_grid", "poisson", "gauge_laplacian",
    "diffusion_stencil_2d", "diffusion_stencil_3d",
]
