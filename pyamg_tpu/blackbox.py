"""Blackbox solver: generic and robust settings for arbitrary Ax=b
(reference ``pyamg/blackbox.py``)."""

from __future__ import annotations

import warnings

import numpy as np
import jax.numpy as jnp

from pyamg_tpu.sparse.matrix import on_setup_device, ELL, BELL, asarray_or_ell


def make_operator(A):
    """Normalize user input to a device matrix (reference ``make_csr:12``)."""
    return asarray_or_ell(A)


@on_setup_device
def solver_configuration(A, B=None, verb=True):
    """Generate a dictionary of SA parameters for an arbitrary A
    (reference ``blackbox.py:52``)."""
    A = make_operator(A)
    from pyamg_tpu.util.linalg import ishermitian
    config = {}
    if ishermitian(A, fast_check=True):
        config["symmetry"] = "hermitian"
        if verb:
            print("  Detected a Hermitian matrix")
    else:
        config["symmetry"] = "nonsymmetric"
        if verb:
            print("  Detected a non-Hermitian matrix")

    if config["symmetry"] == "hermitian":
        config["smooth"] = ("energy", {"krylov": "cg", "maxiter": 3,
                                       "degree": 2, "weighting": "local"})
        config["presmoother"] = ("block_gauss_seidel",
                                 {"sweep": "symmetric", "iterations": 1})
        config["postsmoother"] = ("block_gauss_seidel",
                                  {"sweep": "symmetric", "iterations": 1})
    else:
        config["smooth"] = ("energy", {"krylov": "gmres", "maxiter": 3,
                                       "degree": 2, "weighting": "local"})
        config["presmoother"] = ("gauss_seidel_nr",
                                 {"sweep": "symmetric", "iterations": 2})
        config["postsmoother"] = ("gauss_seidel_nr",
                                  {"sweep": "symmetric", "iterations": 2})

    if B is None:
        if isinstance(A, BELL) and A.blocksize[0] > 1:
            bs = A.blocksize[0]
            config["B"] = np.kron(np.ones((A.shape[0] // bs, 1)),
                                  np.eye(bs))
        else:
            config["B"] = np.ones((A.shape[0], 1))
    else:
        B = np.asarray(B)
        if B.ndim == 1:
            B = B.reshape(-1, 1)
        if B.shape[0] != A.shape[0] or B.shape[1] == 0:
            raise TypeError("Invalid dimensions of B, B.shape[0] must "
                            "equal A.shape[0]")
        config["B"] = B
    config["BH"] = None if config["symmetry"] == "hermitian" \
        else config["B"].copy()

    config["strength"] = ("evolution", {"k": 2, "proj_type": "l2",
                                        "epsilon": 3.0})
    config["max_levels"] = 15
    config["max_coarse"] = 500
    config["coarse_solver"] = "pinv"
    config["aggregate"] = "standard"
    config["keep"] = False
    return config


@on_setup_device
def solver(A, config):
    """Build the SA solver from a config dict (reference
    ``blackbox.py:154``)."""
    from pyamg_tpu.aggregation import smoothed_aggregation_solver
    A = make_operator(A)
    try:
        return smoothed_aggregation_solver(
            A, B=config["B"], BH=config["BH"], smooth=config["smooth"],
            strength=config["strength"], max_levels=config["max_levels"],
            max_coarse=config["max_coarse"],
            coarse_solver=config["coarse_solver"],
            symmetry=config["symmetry"], aggregate=config["aggregate"],
            presmoother=config["presmoother"],
            postsmoother=config["postsmoother"], keep=config["keep"])
    except Exception as e:
        raise TypeError("Failed generating smoothed_aggregation_solver") \
            from e


def solve(A, b, x0=None, tol=1e-5, maxiter=400, return_solver=False,
          existing_solver=None, verb=True, residuals=None):
    """Solve Ax=b with the best out-of-the-box choice (reference
    ``blackbox.py:208``).

    Examples
    --------
    >>> import numpy as np
    >>> import pyamg_tpu
    >>> from pyamg_tpu.gallery import poisson
    >>> from pyamg_tpu.sparse.matrix import to_scipy
    >>> A = poisson((20, 20))
    >>> b = np.ones(400)
    >>> x = pyamg_tpu.solve(A, b, verb=False, tol=1e-8)
    >>> bool(np.linalg.norm(b - to_scipy(A) @ np.asarray(x))
    ...      < 1e-5 * np.linalg.norm(b))
    True
    """
    A = make_operator(A)
    b = jnp.asarray(b).reshape(-1)
    if x0 is None:
        x0 = jnp.asarray(np.random.default_rng(17).random(A.shape[0]),
                         A.dtype)

    if existing_solver is None:
        config = solver_configuration(A, verb=verb)
        ml = solver(A, config)
    else:
        ml = existing_solver
        if ml.levels[0].A.shape[0] != A.shape[0]:
            raise TypeError("Argument existing_solver must have level 0 "
                            "matrix of same size as A")

    accel = "cg" if ml.symmetric_smoothing and \
        getattr(ml.levels[0], "symmetry", "hermitian") == "hermitian" \
        else "gmres"
    if getattr(ml.levels[0], "symmetry", "hermitian") == "nonsymmetric":
        accel = "gmres"
    if verb:
        n = A.shape[0]
        print(f"  Using {accel} acceleration")
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        x = ml.solve(b, x0=x0, accel=accel, tol=tol, maxiter=maxiter,
                     residuals=residuals)
    if return_solver:
        return x, ml
    return x
