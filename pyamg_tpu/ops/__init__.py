"""Compute kernels over ELL/BELL sparse containers."""

import jax
import jax.numpy as jnp

from pyamg_tpu.sparse.matrix import ELL, BELL
from pyamg_tpu.ops.spmv import (
    spmv, bspmv, matvec, rspmv, extract_diagonal, extract_block_diagonal,
    row_max_abs_offdiag,
)
from pyamg_tpu.ops.spgemm import spgemm, spgemm_bell, masked_spgemm
from pyamg_tpu.ops.transpose import transpose, btranspose
from pyamg_tpu.ops.arith import (
    scale, scale_rows, scale_cols, add, sub, add_scaled_identity,
    with_diagonal, remove_diagonal, filter_rows_by_mask,
)
from pyamg_tpu.ops.rowops import dedup_rows, ell_dedup, drop_explicit_zeros


def matmul(A, B):
    """Polymorphic product: sparse@sparse -> sparse, sparse@dense -> dense."""
    if isinstance(A, ELL):
        if isinstance(B, ELL):
            return spgemm(A, B)
        if isinstance(B, BELL):
            raise TypeError("ELL @ BELL not supported; convert first")
        return spmv(A, jnp.asarray(B))
    if isinstance(A, BELL):
        if isinstance(B, BELL):
            return spgemm_bell(A, B)
        if isinstance(B, ELL):
            raise TypeError("BELL @ ELL not supported; convert first")
        return bspmv(A, jnp.asarray(B))
    raise TypeError(type(A))


__all__ = [
    "spmv", "bspmv", "matvec", "rspmv", "extract_diagonal",
    "extract_block_diagonal", "row_max_abs_offdiag", "spgemm", "spgemm_bell",
    "masked_spgemm", "transpose", "btranspose", "scale", "scale_rows",
    "scale_cols", "add", "sub", "add_scaled_identity", "with_diagonal",
    "remove_diagonal", "filter_rows_by_mask", "dedup_rows", "ell_dedup",
    "drop_explicit_zeros", "matmul",
]
