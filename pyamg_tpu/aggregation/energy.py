"""Energy-minimization prolongation smoothing (reference
``pyamg/aggregation/smooth.py:875`` ``energy_prolongation_smoother`` and
``:275/:445/:648`` cg/cgnr/gmres variants; C++ masked SpGEMM
``smoothed_aggregation.h:970`` and constraint projection ``:722``).

TPU design: a prolongator-update lives entirely on the *static sparsity
pattern* computed up front (``pattern = Atilde^degree @ pattern(T)``), so
every Krylov iterate is a dense (n, W) value array over pattern slots:

  * ``masked A @ X``   -> ``ops.masked_spgemm`` (static shapes, jittable)
  * ``constrain``      -> batched row-local projection with precomputed
                          ``BtBinv[i] = pinv(B_i^H B_i)``
  * Frobenius dots     -> flat vdots

The whole minimization (CG/CGNR/GMRES) jits as one XLA program.  Block
(BSR) inputs run through the same scalar core after unamalgamation —
constraints are then enforced per fine row rather than per supernode,
which also yields ``update @ B = 0`` exactly.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from pyamg_tpu.sparse.matrix import ELL, BELL, to_scipy, from_scipy
from pyamg_tpu.ops import spgemm
from pyamg_tpu.ops.spgemm import masked_spgemm
from pyamg_tpu.ops.rowops import ell_dedup
from pyamg_tpu.ops.spmv import extract_diagonal


# ---------------------------------------------------------------------------
# building blocks
# ---------------------------------------------------------------------------

def compute_BtBinv(B, pat_cols, pat_valid):
    """BtBinv[i] = pinv(B_i^H B_i), B_i = B restricted to pattern row i
    (reference ``util/utils.py:1533``)."""
    from pyamg_tpu.util.linalg import pinv_array
    B = jnp.asarray(B)
    Bc = B[pat_cols]                                  # (n, W, k)
    Bc = jnp.where(pat_valid[:, :, None], Bc, 0)
    G = jnp.einsum("nwp,nwq->npq", jnp.conjugate(Bc), Bc)
    return pinv_array(G)


def satisfy_constraints(Uvals, B, BtBinv, pat_cols, pat_valid):
    """Project U (values on the pattern) so that U @ B = 0 row-wise
    (reference ``smooth.py:17-58`` / ``smoothed_aggregation.h:722``)."""
    B = jnp.asarray(B)
    Bc = B[pat_cols]                                  # (n, W, k)
    Bc = jnp.where(pat_valid[:, :, None], Bc, 0)
    UB = jnp.einsum("nw,nwk->nk", Uvals, Bc)          # (n, k)
    corr = jnp.einsum("np,npq,nwq->nw", UB, BtBinv, jnp.conjugate(Bc))
    return jnp.where(pat_valid, Uvals - corr, 0)


def _pattern_from(A: ELL, T: ELL, Atilde: ELL, degree, prefilter):
    """Sparsity pattern for P: Atilde^degree @ pattern(T), with optional
    theta/k row filters (reference ``smooth.py:1030-1106``)."""
    from pyamg_tpu.util.utils import filter_matrix_rows, truncate_rows
    from pyamg_tpu.ops.arith import add
    pattern = ELL(T.cols, jnp.where(T.valid_mask(), 1.0, 0.0)
                  .astype(T.dtype), T.row_nnz, T.shape)
    if degree > 0:
        S = ELL(Atilde.cols, jnp.where(Atilde.valid_mask(), 1.0, 0.0)
                .astype(T.dtype), Atilde.row_nnz, Atilde.shape)
        for _ in range(degree):
            pattern = spgemm(S, pattern)
    prefilter = dict(prefilter or {})
    if prefilter.get("theta") == 0:
        prefilter.pop("theta")
    if "theta" in prefilter and "k" in prefilter:
        p_theta = filter_matrix_rows(pattern, prefilter["theta"])
        pattern = truncate_rows(pattern, prefilter["k"])
        pattern = add(pattern, p_theta)
    elif "k" in prefilter:
        pattern = truncate_rows(pattern, prefilter["k"])
    elif "theta" in prefilter:
        pattern = filter_matrix_rows(pattern, prefilter["theta"])
    elif prefilter:
        raise ValueError("Unrecognized prefilter option")
    ones = jnp.where(pattern.valid_mask() & (pattern.vals != 0), 1.0, 0.0)
    return ell_dedup(pattern.cols, ones.astype(T.dtype),
                     ones != 0, pattern.shape)


def _weight_vector(A: ELL, weighting):
    """Row preconditioner 1/D (reference ``smooth.py:331-346``)."""
    if weighting == "diagonal" or weighting == "block":
        d = extract_diagonal(A)
        return jnp.where(d != 0, 1.0 / jnp.where(d == 0, 1, d), 0.0)
    if weighting == "local":
        D = jnp.sum(jnp.abs(A.vals), axis=1)
        return jnp.where(D != 0, 1.0 / jnp.where(D == 0, 1, D), 0.0)
    raise ValueError("weighting value is invalid")


def _lookup_on_pattern(T: ELL, pat_cols, pat_valid):
    """Values of T at the pattern slots (T's pattern must be a subset)."""
    from pyamg_tpu.ops.rowops import row_lookup
    return row_lookup(T, pat_cols, pat_valid)


# ---------------------------------------------------------------------------
# minimization variants (jitted; state = dense values on pattern slots)
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("maxiter", "tol"))
def _cg_min(A_cols, A_vals, A_rnnz, n_cols, Tv, B, BtBinv, pat_cols,
            pat_valid, Dinv, cfix, maxiter=4, tol=1e-8):
    """CG on A T = 0 within span/pattern constraints
    (reference ``smooth.py:275``)."""
    A = ELL(A_cols, A_vals, A_rnnz, (A_cols.shape[0], n_cols))

    def maskmul(Vv):
        V = ELL(pat_cols, Vv, pat_valid.sum(1).astype(jnp.int32),
                (pat_cols.shape[0], B.shape[0]))
        return masked_spgemm(A, V, pat_cols, pat_valid)

    def constrain(Uv):
        Uv = satisfy_constraints(Uv, B, BtBinv, pat_cols, pat_valid)
        return Uv * cfix[:, None]

    R = constrain(-maskmul(Tv))

    def body(carry, _):
        Tv, R, P, oldsum, first = carry
        Z = R * Dinv[:, None]
        newsum = jnp.real(jnp.vdot(R, Z))
        P = jnp.where(first, Z, Z + (newsum / jnp.where(oldsum == 0, 1,
                                                        oldsum)) * P)
        AP = constrain(maskmul(P))
        pap = jnp.vdot(P, AP)
        alpha = jnp.where(pap == 0, 0.0, newsum / jnp.where(pap == 0, 1,
                                                            pap))
        live = newsum > tol
        alpha = jnp.where(live, alpha, 0.0)
        Tv = Tv + alpha * P
        R = R - alpha * AP
        return (Tv, R, P, newsum, jnp.zeros((), bool)), None

    (Tv, _, _, _, _), _ = jax.lax.scan(
        body, (Tv, R, jnp.zeros_like(R), jnp.zeros((), jnp.float64),
               jnp.ones((), bool)), None, length=maxiter)
    return Tv


@partial(jax.jit, static_argnames=("maxiter", "tol"))
def _cgnr_min(A_cols, A_vals, A_rnnz, AH_cols, AH_vals, AH_rnnz, n_cols,
              Tv, B, BtBinv, pat_cols, pat_valid, Dinv, cfix,
              maxiter=4, tol=1e-8):
    """CGNR: CG on the normal equations A^H A T = 0
    (reference ``smooth.py:445``)."""
    n = A_cols.shape[0]
    A = ELL(A_cols, A_vals, A_rnnz, (n, n_cols))
    AH = ELL(AH_cols, AH_vals, AH_rnnz, (n_cols, n))

    rn = pat_valid.sum(1).astype(jnp.int32)

    def mask_nrml(Vv):
        # A^H (A V), both products restricted to the pattern
        V = ELL(pat_cols, Vv, rn, (n, B.shape[0]))
        AVv = masked_spgemm(A, V, pat_cols, pat_valid)
        AV = ELL(pat_cols, AVv, rn, (n, B.shape[0]))
        return masked_spgemm(AH, AV, pat_cols, pat_valid)

    def constrain(Uv):
        Uv = satisfy_constraints(Uv, B, BtBinv, pat_cols, pat_valid)
        return Uv * cfix[:, None]

    R = constrain(-mask_nrml(Tv))

    def body(carry, _):
        Tv, R, P, oldsum, first = carry
        Z = R * Dinv[:, None]
        newsum = jnp.real(jnp.vdot(R, Z))
        P = jnp.where(first, Z, Z + (newsum / jnp.where(oldsum == 0, 1,
                                                        oldsum)) * P)
        AP = constrain(mask_nrml(P))
        pap = jnp.vdot(P, AP)
        alpha = jnp.where((pap == 0) | (newsum <= tol), 0.0,
                          newsum / jnp.where(pap == 0, 1, pap))
        Tv = Tv + alpha * P
        R = R - alpha * AP
        return (Tv, R, P, newsum, jnp.zeros((), bool)), None

    (Tv, _, _, _, _), _ = jax.lax.scan(
        body, (Tv, R, jnp.zeros_like(R), jnp.zeros((), jnp.float64),
               jnp.ones((), bool)), None, length=maxiter)
    return Tv


def _gmres_min(A_cols, A_vals, A_rnnz, n_cols, Tv, B, BtBinv, pat_cols,
               pat_valid, Dinv, cfix, maxiter=4, tol=1e-8):
    """GMRES on the constrained masked operator (reference
    ``smooth.py:648``): the Krylov space lives in the flat pattern-value
    space with the Frobenius inner product."""
    n = A_cols.shape[0]
    A = ELL(A_cols, A_vals, A_rnnz, (n, n_cols))
    rn = pat_valid.sum(1).astype(jnp.int32)

    def op(Vv):
        V = ELL(pat_cols, Vv, rn, (n, B.shape[0]))
        Uv = masked_spgemm(A, V, pat_cols, pat_valid)
        Uv = Uv * Dinv[:, None]
        Uv = satisfy_constraints(Uv, B, BtBinv, pat_cols, pat_valid)
        return Uv * cfix[:, None]

    R = -masked_spgemm(A, ELL(pat_cols, Tv, rn, (n, B.shape[0])),
                       pat_cols, pat_valid)
    R = R * Dinv[:, None]
    R = satisfy_constraints(R, B, BtBinv, pat_cols, pat_valid)
    R = R * cfix[:, None]

    m = maxiter
    beta = float(jnp.sqrt(jnp.real(jnp.vdot(R, R))))
    if beta == 0 or not np.isfinite(beta):
        return Tv
    Vs = [R / beta]
    H = np.zeros((m + 1, m), complex if jnp.iscomplexobj(Tv) else float)
    k_eff = 0
    for j in range(m):
        W = op(Vs[j])
        for i in range(j + 1):
            H[i, j] = complex(jnp.vdot(Vs[i], W)) if H.dtype == complex \
                else float(jnp.real(jnp.vdot(Vs[i], W)))
            W = W - H[i, j] * Vs[i]
        H[j + 1, j] = float(jnp.sqrt(jnp.real(jnp.vdot(W, W))))
        k_eff = j + 1
        if H[j + 1, j] < 1e-14 * beta:
            break
        Vs.append(W / H[j + 1, j])
    e1 = np.zeros(k_eff + 1, H.dtype)
    e1[0] = beta
    y, *_ = np.linalg.lstsq(H[:k_eff + 1, :k_eff], e1, rcond=None)
    upd = jnp.zeros_like(Tv)
    for i in range(k_eff):
        upd = upd + y[i] * Vs[i]
    return Tv + upd


# ---------------------------------------------------------------------------
# driver
# ---------------------------------------------------------------------------

def energy_prolongation_smoother(A, T, Atilde, B, Bf=None,
                                 Cpt_params=(False, {}), krylov="cg",
                                 maxiter=4, tol=1e-8, degree=1,
                                 weighting="local", prefilter=None,
                                 postfilter=None):
    """Energy-minimizing prolongation smoother (reference
    ``smooth.py:875``).  Accepts ELL or BELL A/T; block inputs run through
    the scalar core after unamalgamation."""
    if maxiter < 0:
        raise ValueError("maxiter must be > 0")
    if tol > 1:
        raise ValueError("tol must be <= 1")

    # Block path: scalarize (pattern work happens at node level anyway)
    if isinstance(A, BELL) or isinstance(T, BELL):
        As = to_scipy(A).tocsr() if isinstance(A, BELL) else to_scipy(A)
        Ts = to_scipy(T).tocsr() if isinstance(T, BELL) else to_scipy(T)
        bs = T.blocksize if isinstance(T, BELL) else (1, 1)
        A_e = from_scipy(As)
        T_e = from_scipy(Ts)
        # node-level strength expanded to scalar rows
        if Atilde is not None and Atilde.shape[0] != A_e.shape[0]:
            from pyamg_tpu.util.utils import unamal
            Atilde = unamal(Atilde, A_e.shape[0] // Atilde.shape[0],
                            A_e.shape[1] // Atilde.shape[1])
        P_e = energy_prolongation_smoother(
            A_e, T_e, Atilde, B, Bf, Cpt_params, krylov, maxiter, tol,
            degree, weighting, prefilter, postfilter)
        Ps = to_scipy(P_e).tobsr(blocksize=bs)
        from pyamg_tpu.sparse.matrix import bell_from_scipy
        return bell_from_scipy(Ps)

    if B.shape[0] != T.shape[1]:
        raise ValueError("B is the candidates for the coarse grid; "
                         "num_rows(B) = num_cols(T)")
    if min(T.nnz, A.nnz) == 0:
        return T
    if Atilde is None:
        Atilde = ELL(A.cols, jnp.where(A.valid_mask(), 1.0, 0.0)
                     .astype(A.dtype), A.row_nnz, A.shape)

    pattern = _pattern_from(A, T, Atilde, degree, prefilter)
    if Cpt_params[0]:
        # enforce identity rows at C-points: pattern = P_I + I_F @ pattern
        Cpts = np.asarray(Cpt_params[1]["Cpts"])
        cmask = np.zeros(A.shape[0], bool)
        cmask[Cpts] = True
        # rows at C-points: single slot at their coarse column
        p_cols = np.asarray(pattern.cols).copy()
        p_rn = np.asarray(pattern.row_nnz).copy()
        coarse_id = np.asarray(Cpt_params[1]["coarse_id"])
        p_cols[cmask, 0] = coarse_id[cmask]
        p_cols[cmask, 1:] = 0
        p_rn[cmask] = 1
        pattern = ELL(jnp.asarray(p_cols),
                      jnp.where(jnp.arange(pattern.width)[None, :] <
                                jnp.asarray(p_rn)[:, None], 1.0, 0.0)
                      .astype(A.dtype),
                      jnp.asarray(p_rn), pattern.shape)

    pat_cols = pattern.cols
    pat_valid = pattern.valid_mask()
    B = jnp.asarray(B, A.dtype)
    if B.ndim == 1:
        B = B[:, None]
    BtBinv = compute_BtBinv(B, pat_cols, pat_valid)

    postfilter = dict(postfilter or {})
    if ((Cpt_params[0] and B.shape[1] > 1) or ("secondpass" in postfilter)):
        from pyamg_tpu.util.utils import filter_operator
        T = filter_operator(T, pattern, B, Bf, BtBinv)

    Tv = _lookup_on_pattern(T, pat_cols, pat_valid)
    Dinv = _weight_vector(A, weighting)
    # rows frozen by rootnode identity: updates there are zeroed
    if Cpt_params[0]:
        cfix = jnp.asarray(~np.isin(np.arange(A.shape[0]),
                                    np.asarray(Cpt_params[1]["Cpts"])),
                           A.dtype)
    else:
        cfix = jnp.ones((A.shape[0],), A.dtype)

    args = (A.cols, A.vals, A.row_nnz, A.shape[1], Tv, B, BtBinv,
            pat_cols, pat_valid, Dinv, cfix)
    if krylov == "cg":
        Tv = _cg_min(*args, maxiter=maxiter, tol=tol)
    elif krylov == "cgnr":
        from pyamg_tpu.ops.transpose import transpose
        AH = transpose(A, conjugate=True)
        Tv = _cgnr_min(A.cols, A.vals, A.row_nnz, AH.cols, AH.vals,
                       AH.row_nnz, A.shape[1], Tv, B, BtBinv, pat_cols,
                       pat_valid, Dinv, cfix, maxiter=maxiter, tol=tol)
    elif krylov == "gmres":
        Tv = _gmres_min(*args, maxiter=maxiter, tol=tol)
    else:
        raise ValueError(f"unknown krylov method {krylov!r}")

    if Cpt_params[0]:
        # re-impose exact identity rows at C-points
        Cpts = np.asarray(Cpt_params[1]["Cpts"])
        coarse_id = jnp.asarray(Cpt_params[1]["coarse_id"])
        rows = jnp.arange(A.shape[0])
        is_c = jnp.asarray(np.isin(np.arange(A.shape[0]), Cpts))
        ident = (pat_cols == coarse_id[rows][:, None]) & is_c[:, None]
        Tv = jnp.where(is_c[:, None], jnp.where(ident, 1.0, 0.0), Tv)

    P = ell_dedup(pat_cols, Tv, pat_valid & (Tv != 0), pattern.shape)

    # postfilter (rootnode only), with one re-smoothing second pass
    if (not postfilter) or ("secondpass" in postfilter) or \
            (Cpt_params[0] is False):
        return P
    from pyamg_tpu.util.utils import filter_matrix_rows, truncate_rows
    from pyamg_tpu.ops.arith import add
    if "theta" in postfilter and "k" in postfilter:
        T_theta = filter_matrix_rows(P, postfilter["theta"])
        T_k = truncate_rows(P, postfilter["k"])
        mask = add(ELL(T_theta.cols, jnp.where(T_theta.valid_mask(), 1.0,
                                               0.0), T_theta.row_nnz,
                       T_theta.shape),
                   ELL(T_k.cols, jnp.where(T_k.valid_mask(), 1.0, 0.0),
                       T_k.row_nnz, T_k.shape))
        from pyamg_tpu.ops.rowops import row_lookup
        vals = row_lookup(P, mask.cols, mask.valid_mask())
        T_filter = ell_dedup(mask.cols, vals, mask.valid_mask() &
                             (vals != 0), P.shape)
    elif "k" in postfilter:
        T_filter = truncate_rows(P, postfilter["k"])
    elif "theta" in postfilter:
        T_filter = filter_matrix_rows(P, postfilter["theta"])
    else:
        raise ValueError("Unrecognized postfilter option")
    return energy_prolongation_smoother(
        A, T_filter, Atilde, B, Bf, Cpt_params, krylov=krylov, maxiter=1,
        tol=1e-8, degree=0, weighting=weighting, prefilter={},
        postfilter={"secondpass": True})
