"""Classical AMG interpolation operators (reference
``pyamg/classical/interpolate.py`` + C++ ``ruge_stuben.h``, ``air.h``).

TPU design: the reference's two-pass CSR builders (count nnz, then fill)
become single vectorized passes over the ELL layout — every row computes
its candidate (column, value) slots in parallel, then ``ell_dedup``
left-compacts.  The 2-hop gathers of classical interpolation and the
per-C-point dense solves of lAIR become batched gathers / batched
``lstsq`` instead of nested scalar loops.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from pyamg_tpu.sparse.matrix import ELL, BELL, is_concrete


def _xp(*arrays):
    """numpy twin on the host/setup path (is_concrete), jnp under trace
    (SURVEY.md: setup is latency-bound host work; tiny eager XLA dispatches
    cost ~1s compile each on small hosts)."""
    return np if is_concrete(*arrays) else jnp
from pyamg_tpu.ops.rowops import ell_dedup, row_lookup
from pyamg_tpu.strength import classical_strength_of_connection


def _coarse_map(splitting):
    """coarse index of each C-point (exclusive prefix sum)."""
    xp = _xp(splitting)
    s = xp.asarray(splitting, xp.int32)
    return xp.cumsum(s).astype(xp.int32) - s, int(s.sum())


def _strength_pattern(A: ELL, C: ELL):
    """(scols, smask, svals): C's off-diagonal pattern carrying values of A
    (the reference copies A entries into C's sparsity:
    ``interpolate.py:66-68``)."""
    xp = _xp(A.vals, C.vals)
    n = A.shape[0]
    rows = xp.arange(n, dtype=xp.int32)[:, None]
    smask = C.valid_mask() & (C.cols != rows) & (C.vals != 0)
    svals = row_lookup(A, C.cols, smask)
    return C.cols, smask, svals


def _row_sums(A: ELL):
    xp = _xp(A.vals)
    n = A.shape[0]
    rows = xp.arange(n, dtype=xp.int32)[:, None]
    valid = A.valid_mask()
    isdiag = valid & (A.cols == rows)
    offd = valid & (A.cols != rows)
    diag = xp.sum(xp.where(isdiag, A.vals, 0), axis=1)
    pos = xp.sum(xp.where(offd & (xp.real(A.vals) > 0), A.vals, 0), axis=1)
    neg = xp.sum(xp.where(offd & (xp.real(A.vals) < 0), A.vals, 0), axis=1)
    return diag, pos, neg


def direct_interpolation(A: ELL, C: ELL, splitting, theta=None, norm="min"):
    """Direct interpolation (reference ``interpolate.py:12`` /
    ``ruge_stuben.h:777,832``): F-point weights
    ``w_ij = -(sum_neg/strong_neg)/a_ii * a_ij`` (sign-split), C-points
    injected as identity."""
    if theta is not None:
        C = classical_strength_of_connection(A, theta=theta, norm=norm)
    xp = _xp(A.vals, C.vals if C is not None else A.vals)
    split = xp.asarray(splitting, xp.int32)
    cmap, nc = _coarse_map(split)
    n = A.shape[0]

    scols, smask, svals = _strength_pattern(A, C)
    strongC = smask & (split[scols] == 1)
    ssp = xp.sum(xp.where(strongC & (xp.real(svals) > 0), svals, 0), axis=1)
    ssn = xp.sum(xp.where(strongC & (xp.real(svals) < 0), svals, 0), axis=1)
    diag, sap, san = _row_sums(A)

    no_pos = ssp == 0
    diag = xp.where(no_pos, diag + sap, diag)
    alpha = xp.where(ssn != 0, san / xp.where(ssn == 0, 1, ssn), 0.0)
    beta = xp.where(no_pos, 0.0, sap / xp.where(ssp == 0, 1, ssp))
    neg_c = -alpha / diag
    pos_c = -beta / diag

    pvals = xp.where(xp.real(svals) < 0, neg_c[:, None] * svals,
                      pos_c[:, None] * svals)
    return _assemble_p(scols, strongC, pvals, split, cmap, nc, n)


def _assemble_p(scols, strong_c_mask, pvals, split, cmap, nc, n):
    """Stack F-row entries (at strong-C slots) with C-row identity into P."""
    xp = _xp(scols, pvals)
    is_c = (split == 1)
    fmask = strong_c_mask & ~is_c[:, None]
    cand_cols = xp.concatenate(
        [cmap[scols], cmap[:, None]], axis=1)
    cand_vals = xp.concatenate(
        [xp.where(fmask, pvals, 0),
         xp.where(is_c, 1.0, 0.0).astype(pvals.dtype)[:, None]], axis=1)
    cand_valid = xp.concatenate([fmask, is_c[:, None]], axis=1)
    return ell_dedup(cand_cols, cand_vals, cand_valid, (n, nc))


def remove_strong_FF_connections(A: ELL, C: ELL, splitting):
    """Zero strong F-F connections lacking a common strong C neighbor
    (reference ``ruge_stuben.h:1133``).  Returns C with such values zeroed."""
    xp = _xp(A.vals, C.vals)
    split = xp.asarray(splitting, xp.int32)
    if xp is np and not np.iscomplexobj(np.asarray(C.vals)):
        # native O(nnz) scan — the vectorized twin below materializes an
        # (n, W, W, W) tensor (GBs at 250k rows)
        from pyamg_tpu import _native
        drop = _native.remove_strong_ff_ell(
            np.asarray(C.cols), np.asarray(C.vals),
            np.asarray(C.row_nnz), np.asarray(split))
        if drop is not None:
            return ELL(C.cols, np.where(drop, 0, np.asarray(C.vals)),
                       C.row_nnz, C.shape)
    n = A.shape[0]
    rows = xp.arange(n, dtype=xp.int32)[:, None]
    smask = C.valid_mask() & (C.cols != rows) & (C.vals != 0)
    is_f_row = (split == 0)[:, None]
    ff = smask & is_f_row & (split[C.cols] == 0)
    # common strong C: exists c with split[c]==1, c in S_row and c in S_j
    kcols = C.cols[C.cols]                    # (n, W, Wk) rows of neighbors
    kvalid = C.valid_mask()[C.cols] & (C.vals[C.cols] != 0)
    c_slot = smask & (split[C.cols] == 1)     # strong C slots of row
    eq = kcols[:, :, :, None] == C.cols[:, None, None, :]
    common = xp.any(eq & kvalid[:, :, :, None] & c_slot[:, None, None, :],
                     axis=(2, 3))
    drop = ff & ~common
    return ELL(C.cols, xp.where(drop, 0, C.vals), C.row_nnz, C.shape)


def classical_interpolation(A: ELL, C: ELL, splitting, theta=None,
                            norm="min", modified=True):
    """Distance-1 (modified) classical interpolation (reference
    ``interpolate.py:86`` / ``ruge_stuben.h:1239``)."""
    xp = _xp(A.vals)
    if theta is not None:
        C = classical_strength_of_connection(A, theta=theta, norm=norm)
    split = xp.asarray(splitting, xp.int32)
    if modified:
        C = remove_strong_FF_connections(A, C, split)
    cmap, nc = _coarse_map(split)
    n = A.shape[0]

    if xp is np and not np.iscomplexobj(np.asarray(A.vals)):
        # native O(nnz*W) two-hop pass (the vectorized twin's
        # (n, W, W, W) tensors dominate the whole RS setup otherwise)
        from pyamg_tpu import _native
        rows = np.arange(n, dtype=np.int32)[:, None]
        cvals = np.asarray(C.vals)
        ccols = np.asarray(C.cols)
        smask = (np.arange(C.width)[None, :] <
                 np.asarray(C.row_nnz)[:, None]) & \
            (ccols != rows) & (cvals != 0)
        nsc = ((smask & (np.asarray(split)[ccols] == 1))
               .sum(axis=1))
        out = _native.classical_interpolation_ell(
            np.asarray(A.cols), np.asarray(A.vals), np.asarray(A.row_nnz),
            ccols, cvals, np.asarray(C.row_nnz),
            np.asarray(split), np.asarray(cmap), modified,
            max(int(nsc.max(initial=0)), 1))
        if out is not None:
            p_cols, p_vals, p_nnz = out
            return ELL(p_cols, p_vals.astype(np.asarray(A.vals).dtype),
                       p_nnz, (n, nc))

    scols, smask, svals = _strength_pattern(A, C)
    strongC = smask & (split[scols] == 1)
    strongF = smask & (split[scols] == 0)

    # denominator: full row sum minus strong off-diagonal entries
    diag, sap, san = _row_sums(A)
    denom = (diag + sap + san) - xp.sum(xp.where(smask, svals, 0), axis=1)

    # 2-hop data: for each strong neighbor k of i, A's row of k
    d = A.diagonal()
    a_kk = d[scols]                                    # (n, W)
    kcols = A.cols[scols]                              # (n, W, WA)
    kvals = A.vals[scols]
    kvalid = A.valid_mask()[scols]
    # a_kj for every (k-slot, j-slot) pair over row i's strength slots
    eq = kcols[:, :, :, None] == scols[:, None, None, :]   # (n,Wk,WA,Wj)
    akj = xp.sum(xp.where(eq & kvalid[:, :, :, None], kvals[:, :, :, None],
                            0), axis=2)                     # (n, Wk, Wj)
    if modified:
        sign_match = xp.sign(xp.real(akj)) == \
            xp.sign(xp.real(a_kk))[:, :, None]
        akj_eff = xp.where(sign_match, 0, akj)
    else:
        akj_eff = akj

    # inner denominator per strong-F k-slot: sum over strong-C l-slots
    inner = xp.sum(xp.where(strongC[:, None, :], akj_eff, 0), axis=2)

    a_ik = svals                                        # (n, W)
    # contribution of k to numerator at j: a_ik * a_kj / inner
    use = (xp.abs(akj_eff) > 1e-15 * xp.abs(a_ik)[:, :, None]) & \
        strongF[:, :, None] & (inner[:, :, None] != 0)
    contrib = xp.where(
        use, a_ik[:, :, None] * akj_eff /
        xp.where(inner[:, :, None] == 0, 1, inner[:, :, None]), 0)
    numer = svals + xp.sum(contrib, axis=1)
    pvals = -numer / xp.where(denom == 0, 1, denom)[:, None]
    return _assemble_p(scols, strongC, pvals, split, cmap, nc, n)


def injection_interpolation(A, splitting):
    """Injection: C-points by value, F rows empty (reference
    ``interpolate.py:174``)."""
    xp = _xp(A.vals if not isinstance(A, BELL) else A.vals)
    split = xp.asarray(splitting, xp.int32)
    cmap, nc = _coarse_map(split)
    if isinstance(A, BELL):
        bs = A.blocksize[0]
        nb = A.n_block_rows
        cols = cmap[:, None]
        vals = xp.where((split == 1)[:, None, None, None],
                         xp.eye(bs, dtype=A.dtype)[None, None], 0)
        rn = (split == 1).astype(xp.int32)
        return BELL(xp.where((split == 1)[:, None], cols, 0), vals, rn,
                    (nb * bs, nc * bs), (bs, bs))
    n = A.shape[0]
    is_c = split == 1
    cols = xp.where(is_c, cmap, 0)[:, None]
    vals = xp.where(is_c, 1.0, 0.0).astype(A.dtype)[:, None]
    return ELL(cols, vals, is_c.astype(xp.int32), (n, nc))


def one_point_interpolation(A, C: ELL, splitting, by_val=False):
    """One-point interpolation: each F-point takes its most strongly
    connected C neighbor (reference ``interpolate.py:241`` / ``air.h:46``).
    ``by_val=True`` uses ``-A_fc`` values instead of 1."""
    xp = _xp(C.vals)
    split = xp.asarray(splitting, xp.int32)
    cmap, nc = _coarse_map(split)
    n = C.shape[0]
    rows = xp.arange(n, dtype=xp.int32)[:, None]
    M = A if (by_val and not isinstance(A, BELL)) else C
    smask = M.valid_mask() & (M.cols != rows)
    cand = smask & (split[M.cols] == 1)
    mag = xp.where(cand, xp.abs(M.vals), -1.0)
    best = xp.argmax(mag, axis=1)
    has = xp.take_along_axis(mag, best[:, None], axis=1)[:, 0] >= 0
    bcol = xp.take_along_axis(M.cols, best[:, None], axis=1)[:, 0]
    bval = xp.take_along_axis(M.vals, best[:, None], axis=1)[:, 0]
    is_c = split == 1

    if isinstance(A, BELL):
        bs = A.blocksize[0]
        eye = xp.eye(bs, dtype=A.dtype)
        cols = xp.where(is_c, cmap, cmap[bcol])[:, None]
        valid = (is_c | has)
        vals = xp.where(valid[:, None, None, None], eye[None, None], 0)
        return BELL(xp.where(valid[:, None], cols, 0), vals,
                    valid.astype(xp.int32),
                    (n * bs, nc * bs), (bs, bs))
    val = xp.where(is_c, 1.0,
                    (-bval if by_val else xp.ones_like(bval)))
    cols = xp.where(is_c, cmap, cmap[bcol])[:, None]
    valid = is_c | has
    return ELL(xp.where(valid[:, None], cols, 0),
               xp.where(valid, val, 0).astype(A.dtype)[:, None],
               valid.astype(xp.int32), (n, nc))


# ---------------------------------------------------------------------------
# lAIR — approximate ideal restriction via batched local solves
# ---------------------------------------------------------------------------

def _air_neighborhoods(C: ELL, splitting, Cpts, degree):
    """Padded per-C-point strong-F neighborhoods (host; sizes data-dep).

    Returns (nbrs (ncp, M) int32 node ids padded with -1)."""
    import scipy.sparse as sp
    from pyamg_tpu.sparse.matrix import to_scipy
    S = to_scipy(C).tocsr()
    S.sort_indices()
    split = np.asarray(splitting)
    indptr, indices = S.indptr, S.indices
    out = []
    for c in np.asarray(Cpts):
        n1 = [j for j in indices[indptr[c]:indptr[c + 1]]
              if split[j] == 0 and j != c]
        s = set(n1)
        if degree == 2:
            for j in n1:
                for k in indices[indptr[j]:indptr[j + 1]]:
                    if split[k] == 0 and k != j:
                        s.add(k)
        out.append(sorted(s))
    M = max((len(s) for s in out), default=0)
    M = max(M, 1)
    nb = np.full((len(out), M), -1, np.int64)
    for i, s in enumerate(out):
        nb[i, :len(s)] = s
    return jnp.asarray(nb)


def _dense_gmres_batch(Amat, b, m, precondition=True):
    """Batched dense GMRES(m) on small systems ``Amat r = b``.

    TPU twin of the reference's per-C-point ``dense_GMRES``
    (``/root/reference/pyamg/amg_core/krylov.h:214``, called from
    ``air.h:212-328`` when ``use_gmres``): one vmapped Arnoldi of m
    statically-unrolled steps, least-squares solve in the Krylov basis.
    Jacobi (row-scaling) preconditioning mirrors ``precondition=True``.
    """
    if precondition:
        d = jnp.diagonal(Amat, axis1=1, axis2=2)
        dinv = jnp.where(jnp.abs(d) > 1e-32, 1.0 / d, 1.0)
        Amat = Amat * dinv[:, :, None]
        b = b * dinv

    def single(A1, b1):
        mm = b1.shape[0]
        V = jnp.zeros((m + 1, mm), A1.dtype)
        H = jnp.zeros((m + 1, m), A1.dtype)
        beta = jnp.linalg.norm(b1)
        V = V.at[0].set(b1 / jnp.where(beta == 0, 1, beta))
        for j in range(m):
            w = A1 @ V[j]
            for i in range(j + 1):
                hij = jnp.vdot(V[i], w)
                H = H.at[i, j].set(hij)
                w = w - hij * V[i]
            hn = jnp.linalg.norm(w)
            H = H.at[j + 1, j].set(hn)
            V = V.at[j + 1].set(w / jnp.where(hn == 0, 1, hn))
        e1 = jnp.zeros((m + 1,), A1.dtype).at[0].set(beta)
        y, *_ = jnp.linalg.lstsq(H, e1)
        return V[:m].T @ y

    return jax.vmap(single)(Amat, b)


def _air_solve_host(Acols, Avals, Arow_nnz, n_cols, nbrs, cpts):
    """Numpy twin of :func:`_air_solve` (direct solves only).

    The per-C-point systems are tiny LAPACK batches; running them on the
    host avoids a fresh XLA compile of a batched ``linalg.solve`` for
    every level's distinct ``(ncp, M)`` shape (measured 6-22 s/level on
    TPU vs milliseconds here)."""
    nbrs = np.asarray(nbrs)
    cpts = np.asarray(cpts)
    ncp, M = nbrs.shape
    ok = nbrs >= 0
    nb = np.where(ok, nbrs, 0).astype(np.int64)
    Ac = np.asarray(Acols)
    Av = np.asarray(Avals)
    rn = np.asarray(Arow_nnz)
    qrows = nb.reshape(-1)
    sub = ELL(Ac[qrows], Av[qrows], rn[qrows], (ncp * M, n_cols))
    qc = np.broadcast_to(nb[:, None, :], (ncp, M, M)).reshape(ncp * M, M)
    A_loc = np.asarray(row_lookup(sub, qc)).reshape(ncp, M, M)
    subc = ELL(Ac[cpts], Av[cpts], rn[cpts], (ncp, n_cols))
    b = -np.asarray(row_lookup(subc, nb))
    okj = ok[:, :, None] & ok[:, None, :]
    pad_eye = np.where(~ok[:, :, None] & np.eye(M, dtype=bool)[None],
                       np.ones((), A_loc.dtype), 0)
    A_sys = np.where(okj, A_loc, 0) + pad_eye
    b = np.where(ok, b, 0)
    At = np.swapaxes(A_sys, 1, 2)
    # pre-detect exactly-singular local systems: one such system makes
    # the whole batched LAPACK solve raise, which would force a Python
    # lstsq loop over ALL ncp systems.  Substitute identity for the
    # singular ones, batch-solve, then lstsq only those rows.
    with np.errstate(all="ignore"):
        sing = ~np.isfinite(np.linalg.cond(At))
    A_solve = np.where(sing[:, None, None], np.eye(M, dtype=At.dtype), At)
    try:
        r = np.linalg.solve(A_solve, b[..., None])[..., 0]
    except np.linalg.LinAlgError:
        # cond() finiteness misses exactly-singular systems (SVD smallest
        # singular value rounds to ~1e-16, not 0) while LU still hits an
        # exact zero pivot; treat every system as suspect and lstsq below.
        sing = np.ones(ncp, dtype=bool)
        r = np.zeros_like(b)
    bad = sing | ~np.isfinite(r).all(axis=1)
    if bad.any():
        for i in np.where(bad)[0]:
            r[i] = np.linalg.lstsq(At[i], b[i], rcond=None)[0]
    return r, ok


@partial(jax.jit, static_argnums=(6, 7, 8))
def _air_solve(Acols, Avals, Arow_nnz, n_cols, nbrs, cpts,
               use_gmres=False, maxiter=10, precondition=True):
    """Batched local solves R_loc: A[N,N]^T r = -A[c,N]^T per C-point."""
    ncp, M = nbrs.shape
    ok = nbrs >= 0
    nb = jnp.where(ok, nbrs, 0).astype(jnp.int32)
    A = ELL(Acols, Avals, Arow_nnz, (Acols.shape[0], n_cols))
    # local matrix entries A[N_j, N_i]
    qrows = nb.reshape(-1)                            # (ncp*M,)
    # gather rows of A for each neighborhood member
    sub = ELL(Acols[qrows], Avals[qrows], Arow_nnz[qrows],
              (ncp * M, n_cols))
    # A_loc[b, j, i] = A[N_j, N_i]
    qc = jnp.broadcast_to(nb[:, None, :], (ncp, M, M)).reshape(ncp * M, M)
    vals = row_lookup(sub, qc)                         # (ncp*M, M)
    A_loc = vals.reshape(ncp, M, M)                    # [b, j, i]
    # rhs b_i = -A[c, N_i]
    subc = ELL(Acols[cpts], Avals[cpts], Arow_nnz[cpts], (ncp, n_cols))
    b = -row_lookup(subc, nb)                          # (ncp, M)
    # mask padding: identity rows/cols, zero rhs
    okj = ok[:, :, None] & ok[:, None, :]
    pad_eye = jnp.where(~ok[:, :, None] & jnp.eye(M, dtype=bool)[None],
                        jnp.ones((), A_loc.dtype), 0)
    A_sys = jnp.where(okj, A_loc, 0) + pad_eye
    b = jnp.where(ok, b, 0)
    # solve A_sys^T r = b  (A_sys[b,j,i] = A[N_j,N_i]; need sum_j r_j A[N_j,N_i] = b_i)
    At = jnp.swapaxes(A_sys, 1, 2)
    if use_gmres:
        # maxiter=0 means "use the full dimension" (reference
        # krylov.h:214 dense_GMRES semantics)
        m = M if int(maxiter) == 0 else min(int(maxiter), M)
        r = _dense_gmres_batch(At, b, m=m, precondition=precondition)
    else:
        r = jnp.linalg.solve(At, b[..., None])[..., 0]
    # singular local systems yield non-finite rows from the LU solve
    # (the host twin falls back to lstsq); zero them so the C-point's
    # restriction row degrades to plain injection instead of NaN
    r = jnp.where(jnp.isfinite(r).all(axis=1, keepdims=True), r, 0)
    return r, ok


def local_air(A: ELL, splitting, theta=0.1, norm="abs", degree=1,
              use_gmres=False, maxiter=10, precondition=True):
    """Local approximate-ideal-restriction (lAIR) operator (reference
    ``interpolate.py:324`` / ``air.h:124-328``): per C-point solve
    ``r^T A[N,N] = -A[c,N]`` over the strong-F neighborhood N, identity at
    the C-point.  Batched dense solves on device; with ``use_gmres`` the
    local systems are solved by batched dense GMRES(maxiter) as in the
    reference (``air.h:212-328`` + ``krylov.h:214``)."""
    if isinstance(A, BELL):
        if use_gmres:
            import warnings
            warnings.warn("block lAIR always uses the exact batched "
                          "direct solve; use_gmres/maxiter/precondition "
                          "are ignored for BSR operators (at least as "
                          "accurate as the reference's dense_GMRES "
                          "option, block_approx_ideal_restriction_pass2)")
        return _local_air_bsr(A, splitting, theta, norm, degree)
    C = classical_strength_of_connection(A, theta=theta, block=False,
                                         norm=norm)
    split = np.asarray(splitting)
    Cpts = np.where(split == 1)[0]
    ncp = len(Cpts)
    n = A.shape[0]
    if ncp == 0:
        return ELL(jnp.zeros((0, 1), jnp.int32),
                   jnp.zeros((0, 1), A.dtype),
                   jnp.zeros((0,), jnp.int32), (0, n))
    nbrs = _air_neighborhoods(C, split, Cpts, degree)
    cpts = jnp.asarray(Cpts, jnp.int32)
    if not use_gmres and is_concrete(A.cols, A.vals):
        r, ok = _air_solve_host(A.cols, A.vals, A.row_nnz, n, nbrs, cpts)
        r = jnp.asarray(r)
        ok = jnp.asarray(ok)
    else:
        r, ok = _air_solve(A.cols, A.vals, A.row_nnz, n, nbrs, cpts,
                           bool(use_gmres), int(maxiter),
                           bool(precondition))
    # assemble R rows: solution over neighborhood + identity at cpoint
    cand_cols = jnp.concatenate(
        [jnp.where(ok, nbrs, 0).astype(jnp.int32), cpts[:, None]], axis=1)
    cand_vals = jnp.concatenate(
        [jnp.where(ok, r, 0), jnp.ones((ncp, 1), A.dtype)], axis=1)
    cand_valid = jnp.concatenate(
        [ok & (r != 0), jnp.ones((ncp, 1), bool)], axis=1)
    return ell_dedup(cand_cols, cand_vals, cand_valid, (ncp, n))


def _local_air_bsr(A: BELL, splitting, theta, norm, degree):
    """Block lAIR (reference ``air.h:379``): same neighborhoods at the
    node level, dense solves blown up by blocksize."""
    bs = A.blocksize[0]
    C = classical_strength_of_connection(A, theta=theta, block=True,
                                         norm=norm)
    split = np.asarray(splitting)
    Cpts = np.where(split == 1)[0]
    ncp = len(Cpts)
    nb = A.n_block_rows
    if ncp == 0:
        return BELL(jnp.zeros((0, 1), jnp.int32),
                    jnp.zeros((0, 1, bs, bs), A.dtype),
                    jnp.zeros((0,), jnp.int32), (0, nb * bs), (bs, bs))
    nbrs = np.asarray(_air_neighborhoods(C, split, Cpts, degree))
    M = nbrs.shape[1]
    ok = nbrs >= 0
    # build dense local systems on host-side gathers (scalar level)
    from pyamg_tpu.sparse.matrix import to_scipy
    As = to_scipy(A).tocsr()
    rows_out = []
    for b_i, c in enumerate(np.asarray(Cpts)):
        N = nbrs[b_i][ok[b_i]]
        sN = np.concatenate([np.arange(bs) + j * bs for j in N]) \
            if len(N) else np.zeros((0,), np.int64)
        if len(sN):
            A0 = As[np.ix_(sN, sN)].toarray()
            brow = -As[np.arange(bs) + c * bs][:, sN].toarray()  # (bs, |sN|)
            try:
                r = np.linalg.solve(A0.T, brow.T).T        # (bs, |sN|)
            except np.linalg.LinAlgError:
                r = np.linalg.lstsq(A0.T, brow.T, rcond=None)[0].T
        else:
            r = np.zeros((bs, 0))
        rows_out.append((N, r))
    W = max(1, max(len(N) for N, _ in rows_out) + 1)
    cols = np.zeros((ncp, W), np.int32)
    vals = np.zeros((ncp, W, bs, bs), np.asarray(A.vals).dtype)
    rn = np.zeros((ncp,), np.int32)
    for i, ((N, r), c) in enumerate(zip(rows_out, np.asarray(Cpts))):
        k = 0
        for j_idx, j in enumerate(N):
            cols[i, k] = j
            vals[i, k] = r[:, j_idx * bs:(j_idx + 1) * bs]
            k += 1
        cols[i, k] = c
        vals[i, k] = np.eye(bs)
        rn[i] = k + 1
    return BELL(jnp.asarray(cols), jnp.asarray(vals), jnp.asarray(rn),
                (ncp * bs, nb * bs), (bs, bs))
