"""Strength-of-connection measures (reference ``pyamg/strength.py``).

All measures are single row-parallel filter passes over the ELL layout —
the reference's per-row C++ loops (``ruge_stuben.h:64``,
``smoothed_aggregation.h:56``) become vectorized masks.

Convention (matches reference): returned S has |values| scaled so each
row's largest entry is 1, diagonal always kept; S[i,j] != 0 means i is
strongly influenced by j.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from pyamg_tpu.sparse.matrix import ELL, BELL, is_concrete
from pyamg_tpu.ops.rowops import ell_dedup


def _xp(*arrays):
    """numpy on host (setup phase — no XLA compiles), jnp under trace."""
    return np if is_concrete(*arrays) else jnp


def _scale_rows_by_largest_entry(cols, vals, valid):
    xp = _xp(cols, vals, valid)
    mx = xp.max(xp.where(valid, xp.abs(vals), 0), axis=1, keepdims=True)
    return xp.where(mx > 0, vals / xp.where(mx == 0, 1, mx), vals)


def _block_reduce(A: BELL, norm="abs"):
    """Collapse a BELL into its node-level ELL condensation
    (reference ``strength.py:195-216``)."""
    xp = _xp(A.vals)
    if norm == "abs":
        data = xp.max(xp.abs(A.vals), axis=(2, 3))
    elif norm == "min":
        data = xp.min(A.vals, axis=(2, 3))
    elif norm == "fro":
        data = xp.sum(xp.abs(A.vals) ** 2, axis=(2, 3))
    else:
        raise ValueError("invalid norm")
    data = xp.where(xp.abs(data) < 1e-16, 0.0, data)
    nb = A.n_block_rows
    return ELL(A.cols, data, A.row_nnz, (nb, A.n_block_cols))


def classical_strength_of_connection(A, theta=0.1, block=True, norm="abs"):
    """|A_ij| >= theta * max_k!=i |A_ik| ('abs') or -A_ij >= theta*max(-A_ik)
    ('min'); diagonal always kept (reference ``strength.py:114`` /
    ``ruge_stuben.h:64``)."""
    if isinstance(A, BELL):
        A = _block_reduce(A, norm if norm in ("abs", "min", "fro") else "abs")
    n = A.shape[0]
    xp = _xp(A.vals)
    rows = xp.arange(n, dtype=xp.int32)[:, None]
    valid = A.valid_mask()
    offd = valid & (A.cols != rows)
    if norm in ("abs", "fro"):
        mag = xp.abs(A.vals)
        mx = xp.max(xp.where(offd, mag, 0), axis=1, keepdims=True)
        keep = offd & (mag >= theta * mx)
    elif norm == "min":
        neg = -xp.real(A.vals)
        mx = xp.max(xp.where(offd, neg, -xp.inf), axis=1, keepdims=True)
        keep = offd & (neg >= theta * mx) & (mx > 0)
    else:
        raise ValueError("unrecognized norm")
    keep = keep | (valid & (A.cols == rows))   # always keep diagonal
    vals = xp.abs(A.vals)
    vals = _scale_rows_by_largest_entry(A.cols, vals, keep)
    return ell_dedup(A.cols, xp.where(keep, vals, 0), keep, A.shape)


def symmetric_strength_of_connection(A, theta=0):
    """|A_ij| >= theta*sqrt(|A_ii A_jj|); diagonal kept (reference
    ``strength.py:248`` / ``smoothed_aggregation.h:56``)."""
    if theta < 0:
        raise ValueError("expected a positive theta")
    xp = _xp(A.vals)
    if isinstance(A, BELL):
        if theta == 0:
            nb = A.n_block_rows
            ones = xp.where(A.valid_mask(), 1.0, 0.0)
            return ELL(A.cols, ones, A.row_nnz, (nb, A.n_block_cols))
        A = _block_reduce(A, "fro")
    n = A.shape[0]
    rows = xp.arange(n, dtype=xp.int32)[:, None]
    valid = A.valid_mask()
    isdiag = A.cols == rows
    diag = xp.sum(xp.where(isdiag & valid, A.vals, 0), axis=1)
    dn = xp.abs(diag)
    magsq = xp.abs(A.vals) ** 2
    cols_idx = np.asarray(A.cols) if xp is np else A.cols
    thresh = (theta * theta) * dn[:, None] * dn[cols_idx]
    keep = valid & ((magsq >= thresh) | isdiag)
    vals = xp.abs(A.vals)
    vals = _scale_rows_by_largest_entry(A.cols, vals, keep)
    return ell_dedup(A.cols, xp.where(keep, vals, 0), keep, A.shape)


def distance_strength_of_connection(A, V, theta=2.0, relative_drop=True):
    """Strength from vertex coordinates: S_ij = distance(i, j), drop rows'
    entries beyond theta (relative to row min) (reference
    ``strength.py:24``)."""
    base = A
    if isinstance(A, BELL):
        base = _block_reduce(A, "abs")
    V = jnp.asarray(V)
    n = base.shape[0]
    rows = jnp.arange(n, dtype=jnp.int32)[:, None]
    valid = base.valid_mask()
    d = jnp.sqrt(jnp.sum((V[base.cols] - V[:, None, :]) ** 2, axis=-1))
    isdiag = base.cols == rows
    offd = valid & ~isdiag
    if relative_drop:
        mn = jnp.min(jnp.where(offd, d, jnp.inf), axis=1, keepdims=True)
        keep = offd & (d <= theta * mn)
    else:
        keep = offd & (d <= theta)
    keep = keep | (valid & isdiag)
    # "distance" -> invert to strength: larger = stronger (reference takes
    # amg-style magnitude then scales rows by largest entry)
    vals = jnp.where(d > 0, 1.0 / jnp.where(d == 0, 1, d), 1.0)
    vals = _scale_rows_by_largest_entry(base.cols, vals, keep)
    return ell_dedup(base.cols, jnp.where(keep, vals, 0), keep, base.shape)


def strength_measure(A, spec, default=("symmetric", {})):
    """Dispatch PyAMG's (name, opts) strength convention."""
    from pyamg_tpu.relaxation.smoothing import unpack_arg
    if spec is None:
        name, opts = None, {}
    else:
        name, opts = unpack_arg(spec)
    if name is None:
        # identity: strength = |A| pattern
        base = _block_reduce(A, "abs") if isinstance(A, BELL) else \
            ELL(A.cols, jnp.abs(A.vals), A.row_nnz, A.shape)
        return base
    if name == "symmetric":
        return symmetric_strength_of_connection(A, **opts)
    if name == "classical":
        return classical_strength_of_connection(A, **opts)
    if name == "distance":
        return distance_strength_of_connection(A, **opts)
    if name in ("evolution", "ode"):
        from pyamg_tpu.strength_evolution import (
            evolution_strength_of_connection)
        return evolution_strength_of_connection(A, **opts)
    if name == "energy_based":
        return energy_based_strength_of_connection(A, **opts)
    if name == "affinity":
        return affinity_distance(A, **opts)
    if name == "algebraic_distance":
        return algebraic_distance(A, **opts)
    raise ValueError(f"unrecognized strength of connection method {name!r}")


def energy_based_strength_of_connection(A, theta=0.0, k=2):
    """Energy-based SOC (reference ``strength.py:358``): measure how well
    a few Jacobi sweeps on Ae_j=0 keep locality; implemented with the same
    relaxation-on-identity construction, vectorized over columns of the
    sparsity neighborhood."""
    if isinstance(A, BELL):
        A = _block_reduce(A, "abs")
    n = A.shape[0]
    from pyamg_tpu.ops.spmv import extract_diagonal, matvec
    from pyamg_tpu.ops import spgemm, add_scaled_identity, scale_rows
    # S = (I - D^-1 A)^k restricted to growing pattern, dense-free:
    d = extract_diagonal(A)
    dinv = jnp.where(d != 0, 1.0 / jnp.where(d == 0, 1, d), 0.0)
    DinvA = scale_rows(A, dinv)
    S = add_scaled_identity(DinvA, alpha=-1.0, beta=1.0)   # I - D^-1 A
    M = S
    for _ in range(k - 1):
        M = spgemm(M, S)
    # strength value: |M_ij| row-scaled
    valid = M.valid_mask()
    rows = jnp.arange(M.shape[0], dtype=jnp.int32)[:, None]
    vals = jnp.abs(M.vals)
    keep = valid & (vals > theta) | (valid & (M.cols == rows))
    vals = _scale_rows_by_largest_entry(M.cols, vals, keep)
    return ell_dedup(M.cols, jnp.where(keep, vals, 0), keep, M.shape)


def _test_vector_distance(A, alpha, R, k, epsilon, seed=0):
    """Shared core of affinity/algebraic distance (reference
    ``strength.py:895-1070``): relax R random vectors on Ax=0, then derive
    pairwise distances over A's pattern."""
    if isinstance(A, BELL):
        A = _block_reduce(A, "abs")
    n = A.shape[0]
    rng = np.random.default_rng(seed)
    X = jnp.asarray(rng.random((n, R)) * 2 - 1, dtype=jnp.float64
                    if A.vals.dtype == jnp.float64 else A.vals.dtype)
    from pyamg_tpu.relaxation.relaxation import jacobi
    X = jacobi(A, X, jnp.zeros_like(X), iterations=k, omega=alpha)
    return A, X


def affinity_distance(A, alpha=0.5, R=5, k=20, epsilon=4.0, seed=0):
    """Affinity distance SOC (reference ``strength.py:953``)."""
    A2, X = _test_vector_distance(A, alpha, R, k, epsilon, seed)
    n = A2.shape[0]
    rows = jnp.arange(n, dtype=jnp.int32)[:, None]
    valid = A2.valid_mask()
    Xi = X[:, None, :]                      # (n, 1, R)
    Xj = X[A2.cols]                         # (n, W, R)
    num = jnp.abs(jnp.sum(Xi * Xj, axis=-1)) ** 2
    den = jnp.sum(Xi * Xi, axis=-1) * jnp.sum(Xj * Xj, axis=-1)
    aff = num / jnp.where(den == 0, 1, den)          # in [0, 1]
    d = 1.0 - aff + 1e-16                            # distance: small=strong
    return _distance_filter(A2, d, valid, rows, epsilon)


def algebraic_distance(A, alpha=0.5, R=5, k=20, p=2, epsilon=2.0, seed=0):
    """Algebraic distance SOC (reference ``strength.py:1019``)."""
    A2, X = _test_vector_distance(A, alpha, R, k, epsilon, seed)
    n = A2.shape[0]
    rows = jnp.arange(n, dtype=jnp.int32)[:, None]
    valid = A2.valid_mask()
    diff = jnp.abs(X[:, None, :] - X[A2.cols])       # (n, W, R)
    if p == np.inf:
        d = jnp.max(diff, axis=-1)
    else:
        d = (jnp.sum(diff ** p, axis=-1) / diff.shape[-1]) ** (1.0 / p)
    d = d + 1e-16
    return _distance_filter(A2, d, valid, rows, epsilon)


def _distance_filter(A, d, valid, rows, epsilon):
    """Keep entries within epsilon of the row min distance; invert to
    strengths; row-scale (reference drop + invert convention)."""
    isdiag = A.cols == rows
    offd = valid & ~isdiag
    mn = jnp.min(jnp.where(offd, d, jnp.inf), axis=1, keepdims=True)
    keep = offd & (d <= epsilon * mn)
    keep = keep | (valid & isdiag)
    vals = 1.0 / d
    vals = _scale_rows_by_largest_entry(A.cols, vals, keep)
    return ell_dedup(A.cols, jnp.where(keep, vals, 0), keep, A.shape)
