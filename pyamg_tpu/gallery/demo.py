"""Demo solve (reference ``pyamg/gallery/demo.py:9``)."""

from __future__ import annotations

import numpy as np


def demo():
    """SA vs SA-preconditioned CG on a 100x100 Poisson problem
    (reference ``demo.py:9``)."""
    import jax.numpy as jnp
    from pyamg_tpu.gallery import poisson
    from pyamg_tpu.aggregation import smoothed_aggregation_solver

    A = poisson((100, 100))
    b = jnp.asarray(np.random.default_rng(0).random(A.shape[0]), A.dtype)

    ml = smoothed_aggregation_solver(A, max_coarse=10)
    print(ml)

    res1 = []
    x = ml.solve(b, tol=1e-8, residuals=res1)
    print(f"standalone: {len(res1) - 1} cycles, "
          f"rel res {res1[-1] / res1[0]:.2e}")

    res2 = []
    x = ml.solve(b, tol=1e-8, accel="cg", residuals=res2)
    print(f"SA-CG:      {len(res2) - 1} iterations, "
          f"rel res {res2[-1] / res2[0]:.2e}")
    return x
