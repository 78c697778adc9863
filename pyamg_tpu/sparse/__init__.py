"""Sparse containers (device-native ELL/BELL pytrees + scipy interop)."""

from pyamg_tpu.sparse.matrix import (
    ELL, BELL, from_scipy, bell_from_scipy, to_scipy, ell_from_csr_arrays,
    ell_from_coo, eye, asarray_or_ell,
)

__all__ = [
    "ELL", "BELL", "from_scipy", "bell_from_scipy", "to_scipy",
    "ell_from_csr_arrays", "ell_from_coo", "eye", "asarray_or_ell",
]
