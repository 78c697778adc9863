"""Relaxation-as-operator adapter (reference ``pyamg/relaxation/utils.py:9``).

Wraps a relaxation descriptor ``(name, {opts})`` as a linear-operator-like
object whose matvec applies the relaxation to ``A x = b`` starting from the
operand — the mechanism the SA constructors use to improve near-nullspace
candidates by relaxing on ``A B = 0``
(reference ``aggregation/aggregation.py:359-367``).
"""

from __future__ import annotations

import numpy as np

from pyamg_tpu.relaxation.smoothing import make_smoother, apply_smoother


class _RelaxationOperator:
    """Duck-typed LinearOperator: ``op @ v`` / ``op.matvec(v)`` returns the
    relaxed iterate (one application of the configured sweep)."""

    def __init__(self, method, A, b=None):
        fn, kwargs = method if isinstance(method, tuple) else (method, {})
        self.A = A
        self.shape = (A.shape[0], A.shape[0])
        self.dtype = np.asarray(A.vals).dtype
        self._kind, self._sopts, self._params = \
            make_smoother(None, A, (fn, kwargs))
        self._b = b

    def matvec(self, v):
        v = np.asarray(v)
        b = np.zeros_like(v) if self._b is None else \
            np.broadcast_to(np.asarray(self._b), v.shape)
        return apply_smoother(self._kind, self._sopts, self._params,
                              self.A, v, b)

    def __matmul__(self, v):
        return self.matvec(v)

    __mul__ = __matmul__


def relaxation_as_linear_operator(method, A, b=None):
    """Return an operator whose matvec runs one relaxation application on
    ``A x = b`` (default b = 0) from the operand as initial guess."""
    return _RelaxationOperator(method, A, b)
