"""Simple meshes (reference ``pyamg/gallery/mesh.py:7``)."""

from __future__ import annotations

import numpy as np


def regular_triangle_mesh(nx, ny):
    """Triangle mesh on a regular (nx, ny) grid of the unit square
    (reference ``mesh.py:7``).  Returns (vertices (n,2) float, elements
    (m,3) int)."""
    nx, ny = int(nx), int(ny)
    if nx < 2 or ny < 2:
        raise ValueError("minimum mesh dimension is 2: %s" % ((nx, ny),))
    Vert1 = np.tile(np.arange(0, nx - 1), ny - 1) + \
        np.repeat(np.arange(0, nx * (ny - 1), nx), nx - 1)
    Vert3 = np.tile(np.arange(0, nx - 1), ny - 1) + \
        np.repeat(np.arange(0, nx * (ny - 1), nx), nx - 1) + nx
    Vert2 = Vert3 + 1
    Vert4 = Vert1 + 1
    Verttmp = np.meshgrid(np.arange(0, nx, dtype=float) / (nx - 1),
                          np.arange(0, ny, dtype=float) / (ny - 1))
    Verttmp = (Verttmp[0].ravel(), Verttmp[1].ravel())
    Vert = np.vstack(Verttmp).transpose()
    E21 = np.vstack((Vert1, Vert2, Vert3)).transpose()
    E22 = np.vstack((Vert1, Vert4, Vert2)).transpose()
    E2 = np.vstack((E21, E22))
    Vert = Vert.astype(float)
    E2 = E2.astype(int)
    return Vert, E2
