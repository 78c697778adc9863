"""Random sparse matrices (reference ``pyamg/gallery/random_sparse.py:20``)."""

from __future__ import annotations

import numpy as np
import scipy.sparse as sp

from pyamg_tpu.sparse.matrix import from_scipy


def sprand(m, n, density, format=None, seed=None):
    """Random sparse matrix with standard-normal entries (reference
    ``random_sparse.py:20``).  Returns device ELL (scipy via ``format``)."""
    m, n = int(m), int(n)
    rng = np.random.default_rng(seed)
    nnz = max(min(int(m * n * density), m * n), 0)
    row = rng.integers(low=0, high=m, size=nnz)
    col = rng.integers(low=0, high=n, size=nnz)
    data = rng.standard_normal(nnz)
    A = sp.coo_matrix((data, (row, col)), shape=(m, n)).tocsr()
    if format is not None:
        return A.asformat(format)
    return from_scipy(A)
