"""Dtype-based tolerance policy (reference ``pyamg/util/params.py:6``)."""

import numpy as np


def set_tol(dtype):
    """Return a smallish tolerance matched to ``dtype``'s precision.

    Handles real and complex dtypes (char-code lowered, like the
    reference).  f32-class -> 1e3*eps(single); f64-class -> 1e6*eps(double).
    """
    dtype = np.dtype(dtype)
    ch = dtype.char.lower()
    if ch == "e":                      # float16 / bfloat16-ish host repr
        return 1e2 * float(np.finfo(np.float16).eps)
    if ch == "f":
        return 1e3 * float(np.finfo(np.single).eps)
    if ch == "d":
        return 1e6 * float(np.finfo(np.double).eps)
    if ch == "g":
        return 1e6 * float(np.finfo(np.longdouble).eps)
    raise ValueError(
        "Attempting to set a tolerance for an unsupported precision.")
