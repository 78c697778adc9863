"""General utilities (reference ``pyamg/util/utils.py``)."""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from pyamg_tpu.sparse.matrix import ELL, BELL


def levelize(spec, max_levels):
    """Per-level option list (reference ``levelize_strength_or_aggregation``
    and ``levelize_smooth_or_improve_candidates``,
    ``util/utils.py:1788,1869``): scalars broadcast; short lists extend
    with their last element."""
    if isinstance(spec, (list,)) or (
            isinstance(spec, tuple) and len(spec) and
            (isinstance(spec[0], (tuple, list)) or spec[0] is None or
             (isinstance(spec[0], str) and not (
                 len(spec) == 2 and isinstance(spec[1], dict))))):
        items = list(spec)
    else:
        items = [spec]
    k = max(max_levels - 1, 1)
    items = items + [items[-1]] * k
    return items[:k]


def profile_solver(ml, accel=None, **kwargs):
    """Residual history of a solve on a random RHS (reference
    ``utils.py:51``)."""
    A = ml.levels[0].A
    rng = np.random.default_rng(0)
    b = jnp.asarray(rng.random(A.shape[0]), dtype=A.dtype)
    residuals = []
    ml.solve(b, residuals=residuals, accel=accel, **kwargs)
    return np.asarray(residuals)


def scale_rows(A: ELL, v):
    from pyamg_tpu.ops.arith import scale_rows as _sr
    return _sr(A, jnp.asarray(v))


def scale_columns(A: ELL, v):
    from pyamg_tpu.ops.arith import scale_cols as _sc
    return _sc(A, jnp.asarray(v))


def symmetric_rescaling(A: ELL):
    """D^-1/2 A D^-1/2 (reference ``utils.py:296``).
    Returns (D_sqrt, D_sqrt_inv, DAD)."""
    from pyamg_tpu.ops.spmv import extract_diagonal
    d = extract_diagonal(A)
    mask = jnp.real(d) != 0
    d_sqrt = jnp.sqrt(jnp.abs(d))
    d_sqrt_inv = jnp.where(mask, 1.0 / jnp.where(d_sqrt == 0, 1, d_sqrt), 0)
    DAD = scale_rows(scale_columns(A, d_sqrt_inv), d_sqrt_inv)
    return d_sqrt, d_sqrt_inv, DAD


def get_diagonal(A, norm_eq=False, inv=False):
    """diag(A), or of the normal equations (reference ``utils.py:541``)."""
    from pyamg_tpu.ops.spmv import extract_diagonal
    if norm_eq == 1:      # diag(A^H A): column sums of |a|^2
        d = jnp.zeros((A.shape[1],), jnp.abs(A.vals).dtype)
        d = d.at[A.cols].add(jnp.abs(A.vals) ** 2)
    elif norm_eq == 2:    # diag(A A^H): row sums of |a|^2
        d = jnp.sum(jnp.abs(A.vals) ** 2, axis=1)
    else:
        d = extract_diagonal(A)
    if inv:
        return jnp.where(d != 0, 1.0 / jnp.where(d == 0, 1, d), 0.0)
    return d


def get_block_diag(A: BELL, blocksize=None, inv_flag=False):
    """(nb, bs, bs) diagonal blocks, optionally inverted
    (reference ``utils.py:603``)."""
    from pyamg_tpu.ops.spmv import extract_block_diagonal
    from pyamg_tpu.util.linalg import pinv_array
    D = extract_block_diagonal(A)
    return pinv_array(D) if inv_flag else D


def amalgamate(A: ELL, blocksize: int):
    """Collapse a CSR-like matrix to its node graph (reference
    ``utils.py:695``)."""
    from pyamg_tpu.sparse.matrix import to_scipy, from_scipy
    import scipy.sparse as sp
    As = to_scipy(A).tobsr(blocksize=(blocksize, blocksize))
    n = As.shape[0] // blocksize
    data = np.ones(len(As.indices))
    return from_scipy(sp.csr_matrix((data, As.indices, As.indptr),
                                    shape=(n, n)))


def unamal(A: ELL, RowsPerBlock: int, ColsPerBlock: int):
    """Expand a node graph to dof granularity with uniform blocks
    (reference ``utils.py:749``)."""
    from pyamg_tpu.sparse.matrix import to_scipy, from_scipy
    import scipy.sparse as sp
    As = to_scipy(A)
    data = np.ones((As.nnz, RowsPerBlock, ColsPerBlock), dtype=As.dtype)
    B = sp.bsr_matrix((data, As.indices, As.indptr),
                      shape=(As.shape[0] * RowsPerBlock,
                             As.shape[1] * ColsPerBlock))
    return from_scipy(B.tocsr())


def coord_to_rbm(V):
    """Rigid body modes from 2D/3D coordinates (reference
    ``utils.py:1002``): translations + rotations, the standard elasticity
    near-nullspace."""
    V = np.asarray(V)
    n, d = V.shape
    if d == 1:
        return np.ones((n, 1))
    if d == 2:
        B = np.zeros((2 * n, 3))
        B[0::2, 0] = 1
        B[1::2, 1] = 1
        B[0::2, 2] = -V[:, 1]
        B[1::2, 2] = V[:, 0]
        return B
    if d == 3:
        B = np.zeros((3 * n, 6))
        for k in range(3):
            B[k::3, k] = 1
        # rotations: about z, y, x
        B[0::3, 3] = -V[:, 1]
        B[1::3, 3] = V[:, 0]
        B[0::3, 4] = V[:, 2]
        B[2::3, 4] = -V[:, 0]
        B[1::3, 5] = -V[:, 2]
        B[2::3, 5] = V[:, 1]
        return B
    raise ValueError("coordinates must be 1D/2D/3D")


def eliminate_diag_dom_nodes(A, C: ELL, theta=1.02):
    """Drop strongly diagonally dominant rows/cols from the strength graph
    so they stay at the fine level (reference ``utils.py:1627``)."""
    from pyamg_tpu.ops.spmv import extract_diagonal
    base = A
    if isinstance(A, BELL):
        from pyamg_tpu.strength import _block_reduce
        base = _block_reduce(A, "abs")
    d = jnp.abs(extract_diagonal(base))
    offsum = jnp.sum(jnp.abs(base.vals), axis=1) - d
    dom = d > theta * offsum
    # dominant nodes become isolated in C (only the diagonal remains)
    rows = jnp.arange(C.shape[0], dtype=jnp.int32)[:, None]
    isdiag = C.cols == rows
    keep = C.valid_mask() & (~(dom[:, None] | dom[C.cols]) | isdiag)
    from pyamg_tpu.ops.rowops import ell_dedup
    return ell_dedup(C.cols, jnp.where(keep, C.vals, 0), keep, C.shape)


def filter_matrix_rows(A: ELL, theta, diagonal=False, lump=False):
    """Row-wise drop tolerance (reference ``utils.py:2012``,
    ``amg_core/linalg.h:1076``).

    ``diagonal=True``: drop off-diagonal ``|A_ij| < theta*|A_ii|`` (the
    diagonal itself is always kept); ``lump`` adds the dropped mass onto
    the diagonal, preserving row sums.  ``diagonal=False``: drop entries
    below ``theta * max_k |A_ik|`` (row max over all entries)."""
    rows = jnp.arange(A.shape[0], dtype=jnp.int32)[:, None]
    isdiag = A.cols == rows
    valid = A.valid_mask()
    absv = jnp.where(valid, jnp.abs(A.vals), 0)
    if diagonal:
        dmag = jnp.max(jnp.where(isdiag, absv, 0), axis=1, keepdims=True)
        keep = valid & (isdiag | (absv >= theta * dmag))
    else:
        mx = jnp.max(absv, axis=1, keepdims=True)
        keep = valid & (absv >= theta * mx)
        if lump:
            # the lumped correction lands on the diagonal slot, so it
            # must survive the filter even when |A_ii| < theta*rowmax —
            # otherwise ell_dedup discards the lumped mass and the
            # row-sum-preservation promise silently breaks
            keep = keep | (valid & isdiag)
    dropped = jnp.where(valid & ~keep, A.vals, 0).sum(axis=1)
    vals = jnp.where(keep, A.vals, 0)
    if lump:
        dcorr = jnp.where(isdiag, dropped[:, None], 0)
        vals = vals + dcorr
    from pyamg_tpu.ops.rowops import ell_dedup
    return ell_dedup(A.cols, vals, keep, A.shape)


def compute_BtBinv(B, C):
    """BtBinv[i] = pinv(B_i^H B_i) with B_i = B restricted to the pattern
    of row i of C (reference ``utils.py:1533``); C is a scalar ELL."""
    from pyamg_tpu.aggregation.energy import compute_BtBinv as _impl
    return _impl(B, C.cols, C.valid_mask())


def filter_operator(A: ELL, C: ELL, B, Bf, BtBinv=None):
    """Restrict A to the pattern of C while preserving A @ B = Bf
    (reference ``utils.py:1119``): per-row l2 projection adds the
    correction ``A_i <- A_i - diff_i BtBinv[i] B_i^H`` over C's slots."""
    from pyamg_tpu.ops.rowops import row_lookup, ell_dedup
    from pyamg_tpu.aggregation.energy import compute_BtBinv as _btb
    B = jnp.asarray(B)
    Bf = jnp.asarray(Bf)
    if B.ndim == 1:
        B = B[:, None]
    if Bf.ndim == 1:
        Bf = Bf[:, None]
    pat_cols = C.cols
    pat_valid = C.valid_mask()
    if BtBinv is None:
        BtBinv = _btb(B, pat_cols, pat_valid)
    Av = row_lookup(A, pat_cols, pat_valid)
    Bc = jnp.where(pat_valid[:, :, None], B[pat_cols], 0)
    diff = jnp.einsum("nw,nwk->nk", Av, Bc) - Bf
    corr = jnp.einsum("np,npq,nwq->nw", diff, BtBinv, jnp.conjugate(Bc))
    Av = jnp.where(pat_valid, Av - corr, 0)
    return ell_dedup(pat_cols, Av, pat_valid & (Av != 0), C.shape,
                     min_width=C.width)


def scale_T(T, Cnodes, pinv_tol=1e-10):
    """Right-scale T so its root-node (block-)rows become identity
    (reference ``utils.py:1275`` ``scale_T``: ``T <- I_F T (P_I^T T)^+
    + P_I``).  ``Cnodes`` are the node-level root indices, aggregate j
    rooted at Cnodes[j]."""
    Cnodes = np.asarray(Cnodes)
    nagg = len(Cnodes)
    if isinstance(T, BELL):
        bs = T.blocksize[0]
        # D_j = block of T at (Cnodes[j], j)  (host/setup: numpy)
        rootrows = np.asarray(Cnodes, np.int64)
        Tc = np.asarray(T.cols)
        Tv = np.asarray(T.vals)
        vmask = np.asarray(T.valid_mask())
        hit = (Tc[rootrows] == np.arange(nagg)[:, None]) & vmask[rootrows]
        D = np.einsum("jw,jwab->jab", hit.astype(Tv.dtype), Tv[rootrows])
        from pyamg_tpu.util.linalg import pinv_array
        Dinv = np.asarray(pinv_array(D))
        vals = np.einsum("nwab,nwbc->nwac", Tv, Dinv[Tc])
        # zero root rows then install identity blocks
        is_root = np.zeros(T.n_block_rows, bool)
        is_root[Cnodes] = True
        eye = np.eye(bs, dtype=Tv.dtype)
        cols = Tc.copy()
        cols[rootrows, 0] = np.arange(nagg, dtype=np.int32)
        vals = np.where(is_root[:, None, None, None], 0, vals)
        vals[rootrows, 0] = eye
        rn = np.where(is_root, 1, np.asarray(T.row_nnz)).astype(np.int32)
        return BELL(cols, vals, rn, T.shape, T.blocksize)
    # scalar: D_j = T[Cnodes[j], j]  (host/setup: numpy)
    rootrows = np.asarray(Cnodes, np.int64)
    Tc = np.asarray(T.cols)
    Tv = np.asarray(T.vals)
    vmask = np.asarray(T.valid_mask())
    hit = (Tc[rootrows] == np.arange(nagg)[:, None]) & vmask[rootrows]
    D = np.sum(np.where(hit, Tv[rootrows], 0), axis=1)
    Dinv = np.where(np.abs(D) > pinv_tol,
                    1.0 / np.where(D == 0, 1, D), 0.0)
    vals = Tv * Dinv[Tc]
    is_root = np.zeros(T.shape[0], bool)
    is_root[Cnodes] = True
    cols = Tc.copy()
    cols[rootrows, 0] = np.arange(nagg, dtype=np.int32)
    vals = np.where(is_root[:, None], 0, vals)
    vals[rootrows, 0] = 1.0
    rn = np.where(is_root, 1, np.asarray(T.row_nnz)).astype(np.int32)
    return ELL(cols, vals, rn, T.shape)


def get_Cpt_params(A, Cnodes, AggOp=None, T=None):
    """Root-node scaffolding (reference ``utils.py:1384``): scalar-level
    C-point indices, their coarse column ids, and F-point indices.

    Returns dict with 'Cpts' (scalar dof ids), 'Fpts', 'coarse_id'
    (coarse column of each scalar dof; arbitrary for non-Cpts)."""
    Cnodes = np.asarray(Cnodes)
    bs = A.blocksize[0] if isinstance(A, BELL) else 1
    n = A.shape[0]
    Cpts = (Cnodes[:, None] * bs + np.arange(bs)[None, :]).ravel()
    mask = np.zeros(n, bool)
    mask[Cpts] = True
    Fpts = np.where(~mask)[0]
    coarse_id = np.zeros(n, np.int32)
    coarse_id[Cpts] = np.arange(len(Cpts), dtype=np.int32)
    return {"Cpts": Cpts.astype(np.int32), "Fpts": Fpts.astype(np.int32),
            "coarse_id": coarse_id}


def truncate_rows(A: ELL, nz_per_row):
    """Keep the nz_per_row largest-magnitude entries per row (reference
    ``utils.py:2105``)."""
    valid = A.valid_mask()
    mag = jnp.where(valid, jnp.abs(A.vals), -1.0)
    order = jnp.argsort(-mag, axis=1)
    rank = jnp.argsort(order, axis=1)       # rank of each slot by magnitude
    keep = valid & (rank < nz_per_row)
    from pyamg_tpu.ops.rowops import ell_dedup
    return ell_dedup(A.cols, jnp.where(keep, A.vals, 0), keep, A.shape)


def hierarchy_spectrum(ml, filter_entries=True):
    """Eigenvalue table for every level of a hierarchy (reference
    ``utils.py:912``): returns a list of 1-D eigenvalue arrays and prints a
    per-level summary of real/imag ranges.

    Levels are densified — diagnostic use on small/medium hierarchies only.
    """
    from pyamg_tpu.sparse.matrix import to_scipy
    eigs = []
    for lvl in ml.levels:
        Ad = to_scipy(lvl.A).toarray()
        if filter_entries:
            keep = np.abs(Ad).sum(axis=1) != 0
            Ad = Ad[np.ix_(keep, keep)]
        eigs.append(np.linalg.eigvals(Ad))
    print("  lvl     n     min(re)      max(re)      min(im)      max(im)")
    for i, e in enumerate(eigs):
        print(f"{i:5d} {e.shape[0]:6d} {e.real.min():12.4e} "
              f"{e.real.max():12.4e} {e.imag.min():12.4e} "
              f"{e.imag.max():12.4e}")
    return eigs


def filter_matrix_columns(A: ELL, theta):
    """Drop |A_ij| < theta * max_k |A_kj| per COLUMN (reference
    ``utils.py:1932``): segment-max over columns, then an elementwise
    keep mask."""
    from pyamg_tpu.sparse.matrix import is_concrete
    from pyamg_tpu.ops.rowops import ell_dedup
    valid = A.valid_mask()
    if is_concrete(A.vals):
        colmax = np.zeros((A.shape[1],))
        np.maximum.at(colmax, np.asarray(A.cols),
                      np.where(np.asarray(valid),
                               np.abs(np.asarray(A.vals)), 0))
        keep = valid & (np.abs(np.asarray(A.vals))
                        >= theta * colmax[np.asarray(A.cols)])
        vals = np.where(keep, np.asarray(A.vals), 0)
        return ell_dedup(np.asarray(A.cols), vals, np.asarray(keep), A.shape)
    colmax = jnp.zeros((A.shape[1],), jnp.abs(A.vals).dtype)
    colmax = colmax.at[A.cols].max(jnp.where(valid, jnp.abs(A.vals), 0))
    keep = valid & (jnp.abs(A.vals) >= theta * colmax[A.cols])
    vals = jnp.where(keep, A.vals, 0)
    return ell_dedup(A.cols, vals, keep, A.shape)


def scale_rows_by_largest_entry(A: ELL) -> ELL:
    """Divide every row by its largest |entry| (reference ``utils.py:1746``)."""
    from pyamg_tpu.strength import _scale_rows_by_largest_entry
    valid = A.valid_mask()
    vals = _scale_rows_by_largest_entry(A.cols, A.vals, valid)
    return ELL(A.cols, vals, A.row_nnz, A.shape, A.grid, A.col_grid)


def symmetric_rescaling_sa(A, B, BH=None):
    """Symmetric diagonal rescaling that also rescales near-nullspace
    candidates (reference ``utils.py:371``): returns (DAD, DB, DBH) with
    DAD = D^-1/2 A D^-1/2 and DB = D^1/2 B so that spans are preserved."""
    from pyamg_tpu.sparse.matrix import is_concrete
    xp = jnp if not is_concrete(A.vals) else np
    d_sqrt, d_sqrt_inv, DAD = symmetric_rescaling(A)
    d_sqrt = xp.asarray(d_sqrt)
    DB = xp.asarray(B) * (d_sqrt[:, None] if xp.asarray(B).ndim == 2
                          else d_sqrt)
    DBH = None
    if BH is not None:
        DBH = xp.asarray(BH) * (d_sqrt[:, None]
                                if xp.asarray(BH).ndim == 2 else d_sqrt)
    return DAD, DB, DBH
