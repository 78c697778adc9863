"""Prolongation smoothers (reference ``pyamg/aggregation/smooth.py``).

``jacobi_prolongation_smoother``: P = (I - omega/rho(D^-1 A) D^-1 A)^deg T
(reference ``smooth.py:61``); ``richardson``: P = (I - omega/rho(A) A)^deg T
(``smooth.py:209``).  Energy minimization lives in ``energy.py``.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from pyamg_tpu.sparse.matrix import ELL, BELL
from pyamg_tpu.ops import spgemm, spgemm_bell, scale_rows, sub
from pyamg_tpu.ops.spmv import extract_diagonal, extract_block_diagonal


def _bell_scale_rows_blockdiag(A: BELL, Dinv):
    """blockdiag(Dinv) @ A for BELL (Dinv: (nb, br, br))."""
    vals = jnp.einsum("nij,nwjk->nwik", Dinv, A.vals)
    return BELL(A.cols, vals, A.row_nnz, A.shape, A.blocksize)


def _bell_sub(X: BELL, Y: BELL):
    """X - Y for conforming BELLs via candidate merge."""
    assert X.shape == Y.shape and X.blocksize == Y.blocksize
    from pyamg_tpu.ops.spgemm import _dedup_blocks
    cols = jnp.concatenate([X.cols, Y.cols], axis=1)
    vals = jnp.concatenate([X.vals, -Y.vals], axis=1)
    valid = jnp.concatenate([X.valid_mask(), Y.valid_mask()], axis=1)
    c, v, rn = _dedup_blocks(cols, vals, valid, X.n_block_cols)
    width = max(int(jnp.max(rn)) if rn.shape[0] else 0, 1)
    return BELL(c[:, :width], v[:, :width], rn, X.shape, X.blocksize)


def jacobi_prolongation_smoother(S, T, C, B, omega=4.0 / 3.0, degree=1,
                                 filter_entries=False, weighting="diagonal"):
    """Damped-Jacobi prolongation smoothing (reference ``smooth.py:61``)."""
    from pyamg_tpu.relaxation.smoothing import rho_D_inv_A
    if isinstance(T, BELL) and not isinstance(S, BELL):
        # scalar operator, multi-candidate T (node blocks (1, K2)): promote
        # S to unit blocks so the block SpGEMM path conforms (reference gets
        # this for free from scipy csr@bsr, ``smooth.py:61``)
        S = BELL(S.cols, S.vals[:, :, None, None], S.row_nnz, S.shape,
                 (1, 1))
    if isinstance(S, BELL) and isinstance(T, BELL):
        from pyamg_tpu.util.linalg import pinv_array
        Dinv = pinv_array(extract_block_diagonal(S))
        rho = rho_D_inv_A(S)
        w = omega / rho
        DinvS = _bell_scale_rows_blockdiag(S, Dinv * w)
        P = T
        for _ in range(degree):
            P = _bell_sub(P, spgemm_bell(DinvS, P))
        return P
    if isinstance(S, BELL):
        from pyamg_tpu.strength import _block_reduce
        S = _block_reduce(S, "abs")
    d = extract_diagonal(S)
    if weighting == "local":
        # Gershgorin-style local weight: D = |A| row sums
        d = jnp.sum(jnp.abs(S.vals), axis=1)
        rho = 1.0
    else:
        rho = rho_D_inv_A(S)
    dinv = jnp.where(d != 0, 1.0 / jnp.where(d == 0, 1, d), 0.0)
    w = omega / rho
    DinvS = scale_rows(S, dinv * w)
    P = T
    for _ in range(degree):
        P = sub(P, spgemm(DinvS, P))
    return P


def richardson_prolongation_smoother(S, T, omega=4.0 / 3.0, degree=1):
    """Richardson prolongation smoothing (reference ``smooth.py:209``)."""
    from pyamg_tpu.util.linalg import approximate_spectral_radius
    if isinstance(T, BELL) and not isinstance(S, BELL):
        S = BELL(S.cols, S.vals[:, :, None, None], S.row_nnz, S.shape,
                 (1, 1))
    if isinstance(S, BELL) and isinstance(T, BELL):
        rho = approximate_spectral_radius(S)
        w = omega / rho
        Sw = BELL(S.cols, S.vals * w, S.row_nnz, S.shape, S.blocksize)
        P = T
        for _ in range(degree):
            P = _bell_sub(P, spgemm_bell(Sw, P))
        return P
    rho = approximate_spectral_radius(S)
    w = omega / rho
    Sw = ELL(S.cols, S.vals * w, S.row_nnz, S.shape)
    P = T
    for _ in range(degree):
        P = sub(P, spgemm(Sw, P))
    return P


def smooth_prolongator(fn_spec, A, T, C, B):
    """Dispatch the ``smooth=`` option (reference ``aggregation.py:368``)."""
    from pyamg_tpu.relaxation.smoothing import unpack_arg
    fn, kwargs = unpack_arg(fn_spec)
    if fn == "jacobi":
        return jacobi_prolongation_smoother(A, T, C, B, **kwargs)
    if fn == "richardson":
        return richardson_prolongation_smoother(A, T, **kwargs)
    if fn == "energy":
        from pyamg_tpu.aggregation.energy import energy_prolongation_smoother
        return energy_prolongation_smoother(A, T, C, B, None, (False, {}),
                                            **kwargs)
    if fn is None:
        return T
    raise ValueError(f"unrecognized prolongation smoother {fn!r}")
