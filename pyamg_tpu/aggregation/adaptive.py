"""Adaptive smoothed aggregation (aSA) (reference
``pyamg/aggregation/adaptive.py:117``).

Bootstrap near-nullspace candidates from relaxation on ``A x = 0``
(initial stage), then improve/extend the candidate set by cycling with the
current solver on ``A x = 0`` (general stage) — re-designed as a compact
two-stage driver over the TPU-native SA constructor, with the same
observable contract: ``(MultilevelSolver, work)`` and convergence-factor
parity on the reference test problems.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from pyamg_tpu.sparse.matrix import on_setup_device, ELL, BELL, asarray_or_ell
from pyamg_tpu.relaxation.smoothing import make_smoother, apply_smoother
from pyamg_tpu.aggregation.aggregation import smoothed_aggregation_solver


def eliminate_local_candidates(x, AggOp, A, T, thresh=1.0, **kwargs):
    """Zero a new candidate on aggregates where it is locally unimportant.

    Behavioral twin of the reference's per-aggregate elimination tests
    (``pyamg/aggregation/adaptive.py:25``), reformulated on the one-hot
    aggregate-label matrix: per-aggregate inner products are bincounts
    (segment sums) over the node labels.  An aggregate is dropped when the
    candidate's local mass ``<x,x>_i`` is below the energy-scaled weight
    ``thresh * card_i * <Ax,x> / (n rho(A))`` (test 1) or when the part of
    x orthogonal to range(T) is (test 2: already captured by T).

    Returns the filtered copy (functional — no in-place mutation).
    """
    from pyamg_tpu.util.linalg import approximate_spectral_radius
    from pyamg_tpu.sparse.matrix import to_scipy

    x = np.asarray(x)
    nnodes, nagg = AggOp.shape
    ndof = x.shape[0]
    npde = ndof // nnodes
    labels = np.where(np.asarray(AggOp.row_nnz) > 0,
                      np.asarray(AggOp.cols[:, 0]), nagg)
    dof_labels = np.repeat(labels, npde)

    def agg_inner(z):
        return np.bincount(dof_labels, weights=np.abs(z) ** 2,
                           minlength=nagg + 1)[:nagg]

    As = to_scipy(A)
    rho = approximate_spectral_radius(A)
    zAz = float(np.real(np.vdot(x, As @ x)))
    card = npde * np.bincount(labels, minlength=nagg + 1)[:nagg]
    weights = thresh * card * zAz / (ndof * rho)

    Ts = to_scipy(T)
    projected = x - Ts @ (Ts.conj().T @ x)
    drop = (agg_inner(x) <= weights) | (agg_inner(projected) <= weights)

    kill_node = np.zeros(nnodes, dtype=bool)
    valid = labels < nagg
    kill_node[valid] = drop[labels[valid]]
    return np.where(np.repeat(kill_node, npde), 0.0, x)


def _relax_on_homogeneous(A, x, spec, iterations):
    """x <- relax(A, x, b=0) repeated (the aSA bootstrap primitive,
    reference ``adaptive.py:361`` initial_setup_stage)."""
    kind, sopts, params = make_smoother(None, A, spec)
    b = jnp.zeros_like(x)
    for _ in range(iterations):
        x = apply_smoother(kind, sopts, params, A, x, b)
    return x


@on_setup_device
def adaptive_sa_solver(A, initial_candidates=None, symmetry="hermitian",
                       pdef=True, num_candidates=1, candidate_iters=5,
                       improvement_iters=0, epsilon=0.1, max_levels=10,
                       max_coarse=10, aggregate="standard",
                       prepostsmoother=("gauss_seidel",
                                        {"sweep": "symmetric"}),
                       smooth=("jacobi", {}), strength="symmetric",
                       coarse_solver="pinv",
                       eliminate_local=(False, {}), keep=False, seed=0,
                       **kwargs):
    """Create an aSA solver; returns ``(ml, work)``
    (reference ``adaptive.py:117``)."""
    A = asarray_or_ell(A)
    n = A.shape[0]
    rng = np.random.default_rng(seed)
    work = np.zeros((1,))

    if isinstance(eliminate_local, tuple):
        do_elim, elim_opts = eliminate_local
    else:
        do_elim, elim_opts = bool(eliminate_local), {}

    def build(B):
        return smoothed_aggregation_solver(
            A, B=B, symmetry=symmetry, strength=strength,
            aggregate=aggregate, smooth=smooth,
            presmoother=prepostsmoother, postsmoother=prepostsmoother,
            max_levels=max_levels,
            max_coarse=max_coarse, coarse_solver=coarse_solver,
            keep=keep or do_elim, **kwargs)

    # --- initial stage: bootstrap the first candidate --------------------
    # Down-up pass over a trial hierarchy (reference initial_setup_stage,
    # ``adaptive.py:361``): relax on A x = 0 at every level going down,
    # then interpolate back up relaxing again, so the candidate is
    # algebraically smooth at all scales.
    if initial_candidates is None:
        x = jnp.asarray(rng.standard_normal(n), A.dtype)
        x = _relax_on_homogeneous(A, x, prepostsmoother, candidate_iters)
        work[0] += A.nnz * candidate_iters
        from pyamg_tpu.strength import strength_measure
        from pyamg_tpu.aggregation.aggregate import aggregate_dispatch
        from pyamg_tpu.aggregation.tentative import fit_candidates
        from pyamg_tpu.aggregation.smooth import smooth_prolongator
        from pyamg_tpu.aggregation.aggregation import _galerkin, _transpose
        trail = []
        A_l, x_l = A, x
        while A_l.shape[0] > max_coarse and len(trail) + 1 < max_levels:
            C = strength_measure(A_l, strength)
            AggOp, _ = aggregate_dispatch(C, aggregate, seed=seed)
            if AggOp.shape[1] == 0 or AggOp.shape[1] >= AggOp.shape[0]:
                break
            T, xc = fit_candidates(AggOp, x_l[:, None])
            P = smooth_prolongator(smooth, A_l, T, C, xc)
            R = _transpose(P, conjugate=True)
            Ac = _galerkin(R, A_l, P)
            trail.append((A_l, P))
            A_l = Ac
            x_l = xc[:, 0]
            x_l = _relax_on_homogeneous(A_l, x_l, prepostsmoother,
                                        candidate_iters)
            work[0] += A_l.nnz * candidate_iters
        for A_l, P in reversed(trail):
            from pyamg_tpu.ops.spmv import matvec
            x_l = matvec(P, x_l)
            x_l = _relax_on_homogeneous(A_l, x_l, prepostsmoother,
                                        candidate_iters)
            work[0] += A_l.nnz * candidate_iters
        x = x_l
        nrm = jnp.linalg.norm(x)
        B = (x / jnp.where(nrm == 0, 1, nrm))[:, None]
    else:
        B = jnp.asarray(initial_candidates, A.dtype)
        if B.ndim == 1:
            B = B[:, None]

    ml = build(B)
    work[0] += sum(l.A.nnz for l in ml.levels)

    # Self-improvement loop (general_setup_stage for the single-candidate
    # case): cycling on A x = 0 exposes the current solver's slowest mode;
    # it becomes the next candidate.  Each round also *measures* the
    # current solver's factor, and the best solver seen wins.
    if initial_candidates is None:
        b0 = jnp.zeros((n,), A.dtype)
        best_ml, best_rho = ml, np.inf
        for _ in range(3):
            x0v = jnp.asarray(rng.standard_normal(n), A.dtype)
            x = ml.solve(b0, x0=x0v, maxiter=candidate_iters, tol=1e-16,
                         cycle="V")
            work[0] += sum(l.A.nnz for l in ml.levels) * candidate_iters
            nrm = float(jnp.linalg.norm(x))
            rho = (nrm / float(jnp.linalg.norm(x0v))) ** \
                (1.0 / candidate_iters)
            if rho < best_rho:
                best_ml, best_rho = ml, rho
            if rho < 0.1 or nrm < 1e-12:
                break
            B = (x / nrm)[:, None]
            ml = build(B)
            work[0] += sum(l.A.nnz for l in ml.levels)
        if best_rho < np.inf:
            ml = best_ml
            B = ml.levels[0].B

    # --- general stage: grow the candidate set ---------------------------
    for _ in range(max(num_candidates - 1, 0)):
        x = jnp.asarray(rng.standard_normal(n), A.dtype)
        b = jnp.zeros((n,), A.dtype)
        x = ml.solve(b, x0=x, maxiter=candidate_iters, tol=1e-16,
                     cycle="V")
        work[0] += sum(l.A.nnz for l in ml.levels) * candidate_iters
        if do_elim and len(ml.levels) > 1:
            x = jnp.asarray(eliminate_local_candidates(
                x, ml.levels[0].AggOp, ml.levels[0].A, ml.levels[0].T,
                **elim_opts), A.dtype)
        nrm = jnp.linalg.norm(x)
        if float(nrm) == 0.0:
            break  # solver is exact; no new candidate needed
        x = x / nrm
        B = jnp.concatenate([B, x[:, None]], axis=1)
        ml = build(B)
        work[0] += sum(l.A.nnz for l in ml.levels)

    # --- improvement sweeps over existing candidates ---------------------
    for _ in range(max(improvement_iters, 0)):
        b = jnp.zeros((n,), A.dtype)
        newB = []
        for i in range(B.shape[1]):
            x = ml.solve(b, x0=B[:, i], maxiter=candidate_iters,
                         tol=1e-16, cycle="V")
            work[0] += sum(l.A.nnz for l in ml.levels) * candidate_iters
            if do_elim and len(ml.levels) > 1:
                # reference applies elimination inside the improvement
                # loop as well (adaptive.py:324)
                x = jnp.asarray(eliminate_local_candidates(
                    x, ml.levels[0].AggOp, ml.levels[0].A,
                    ml.levels[0].T, **elim_opts), A.dtype)
            nrm = jnp.linalg.norm(x)
            newB.append(x / jnp.where(nrm == 0, 1, nrm))
        B = jnp.stack(newB, axis=1)
        ml = build(B)
        work[0] += sum(l.A.nnz for l in ml.levels)

    if do_elim and not keep:
        # elimination forced keep=True on the working hierarchies; honor
        # the caller's keep flag on the returned solver
        for lvl in ml.levels:
            for attr in ("AggOp", "T", "C"):
                if hasattr(lvl, attr):
                    try:
                        delattr(lvl, attr)
                    except AttributeError:
                        pass

    return ml, float(work[0])
