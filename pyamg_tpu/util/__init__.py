"""Utilities (reference ``pyamg/util``)."""

from pyamg_tpu.util.params import set_tol
from pyamg_tpu.util.linalg import (norm, infinity_norm,
                                   approximate_spectral_radius, condest,
                                   ishermitian, pinv_array)
from pyamg_tpu.util.utils import (levelize, profile_solver, scale_rows,
                                  scale_columns, symmetric_rescaling,
                                  get_diagonal, get_block_diag, amalgamate,
                                  unamal, coord_to_rbm,
                                  eliminate_diag_dom_nodes,
                                  filter_matrix_rows, compute_BtBinv,
                                  filter_operator, scale_T, get_Cpt_params,
                                  truncate_rows, hierarchy_spectrum,
                                  filter_matrix_columns,
                                  scale_rows_by_largest_entry,
                                  symmetric_rescaling_sa)
from pyamg_tpu.util.bsr_utils import (bsr_getrow, bsr_row_setscalar,
                                      bsr_row_setvector)

__all__ = [
    "set_tol", "norm", "infinity_norm", "approximate_spectral_radius",
    "condest", "ishermitian", "pinv_array", "levelize", "profile_solver",
    "scale_rows", "scale_columns", "symmetric_rescaling", "get_diagonal",
    "get_block_diag", "amalgamate", "unamal", "coord_to_rbm",
    "eliminate_diag_dom_nodes", "filter_matrix_rows", "compute_BtBinv",
    "filter_operator", "scale_T", "get_Cpt_params", "truncate_rows",
    "hierarchy_spectrum", "bsr_getrow", "bsr_row_setscalar",
    "bsr_row_setvector", "filter_matrix_columns",
    "scale_rows_by_largest_entry", "symmetric_rescaling_sa",
]
