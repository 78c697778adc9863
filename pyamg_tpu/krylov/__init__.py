"""Krylov accelerators (reference ``pyamg/krylov/__init__.py:32-42``)."""

from pyamg_tpu.krylov.methods import (
    cg, bicgstab, cgne, cgnr, cr, minimal_residual, steepest_descent)
from pyamg_tpu.krylov.gmres import (
    gmres, gmres_mgs, gmres_householder, fgmres)

__all__ = [
    "cg", "bicgstab", "cgne", "cgnr", "cr", "minimal_residual",
    "steepest_descent", "gmres", "gmres_mgs", "gmres_householder", "fgmres",
]
