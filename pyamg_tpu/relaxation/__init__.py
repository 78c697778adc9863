"""Relaxation smoothers (reference ``pyamg/relaxation``)."""

from pyamg_tpu.relaxation import relaxation
from pyamg_tpu.relaxation.chebyshev import (
    chebyshev_polynomial_coefficients, mls_polynomial_coefficients)
from pyamg_tpu.relaxation.utils import relaxation_as_linear_operator

__all__ = ["relaxation", "chebyshev_polynomial_coefficients",
           "mls_polynomial_coefficients", "relaxation_as_linear_operator"]
