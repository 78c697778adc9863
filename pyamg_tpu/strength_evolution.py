"""Evolution (ODE) strength of connection (reference
``pyamg/strength.py:515`` + C++ ``evolution_strength.h``).

Measures strength by how well the near-nullspace locally approximates the
evolved delta functions of the weighted-Jacobi propagator
``S = ((I - 1/rho(D^-1 A) D^-1 A)^T)^k`` restricted to the pattern of A.

TPU design: the repeated squaring runs as full ELL SpGEMMs with a final
*masked* product on A's pattern (the ``incomplete_mat_mult_csr``
equivalent); the NullDim == 1 measure is pure row/column scaling
arithmetic on the ELL slots; NullDim > 1 solves the reference's per-row
constrained least-squares (``evolution_strength.h:330``) as a batched
dense solve over rows.
"""

from __future__ import annotations

import warnings

import numpy as np
import jax
import jax.numpy as jnp

from pyamg_tpu.sparse.matrix import ELL, BELL, is_concrete


def _xp(*arrays):
    """numpy on the host/setup path, jnp under trace (the setup phase must
    never issue eager jnp ops: each becomes a per-shape XLA compile, and on
    a remote-TPU default device a tunnel round-trip too)."""
    return np if is_concrete(*arrays) else jnp
from pyamg_tpu.ops import spgemm, scale_rows
from pyamg_tpu.ops.spgemm import masked_spgemm
from pyamg_tpu.ops.transpose import transpose
from pyamg_tpu.ops.rowops import ell_dedup
from pyamg_tpu.ops.spmv import extract_diagonal


def _apply_distance_filter(cols, vals, valid, epsilon):
    """Keep off-diagonal 'distances' within epsilon of the row minimum
    (reference ``evolution_strength.h:141``)."""
    xp = _xp(cols, vals)
    n = cols.shape[0]
    rows = xp.arange(n, dtype=xp.int32)[:, None]
    offd = valid & (cols != rows) & (vals != 0)
    mn = xp.min(xp.where(offd, vals, xp.inf), axis=1, keepdims=True)
    keep = offd & (vals <= epsilon * mn)
    keep = keep | (valid & (cols == rows))
    return xp.where(keep, vals, 0), keep


def _shiftv(v, o, n):
    """w[i] = v[i + o] with zero fill (host numpy)."""
    w = np.zeros_like(v)
    if o == 0:
        return v.copy()
    if o > 0:
        w[:n - o] = v[o:n]
    else:
        w[-o:n] = v[:n + o]
    return w


def _evolution_dia_fast(A, Bvec, epsilon, k, symmetrize_measure):
    """Banded fast path: for grid-stencil operators every step of the
    measure — the transposed propagator, its masked powers, the
    NullDim==1 measure, the distance filter, symmetrization and row
    scaling — is a shifted elementwise op on the (ndiag, n) DIA data.
    No SpGEMM, no per-row sorts (measured 2.2 s -> ~0.5 s at 512^2).
    Returns the strength ELL, or None when A isn't band-suitable."""
    from pyamg_tpu.sparse.matrix import dia_from_ell
    if 2 ** int(np.log2(k)) != k:
        return None
    Ad = dia_from_ell(A)
    if Ad is None:
        return None
    offs = [int(o) for o in Ad.offsets]
    if 0 not in offs or set(offs) != {-o for o in offs}:
        return None
    n = A.shape[0]
    data = np.asarray(Ad.data)[:, :n]
    nd = len(offs)
    d0 = offs.index(0)
    oidx = {o: d for d, o in enumerate(offs)}

    D = data[d0]
    Dinv = np.where(D != 0, 1.0 / np.where(D == 0, 1, D), 1.0)
    from pyamg_tpu.util.linalg import approximate_spectral_radius
    rho = approximate_spectral_radius(scale_rows(A, Dinv))

    # S = (I - 1/rho D^-1 A)^T in band form: T_o[i] = M_{-o}[i + o]
    M = -(1.0 / rho) * (data * Dinv[None, :])
    M[d0] += 1.0
    S = np.stack([_shiftv(M[oidx[-o]], o, n) for o in offs])
    Soffs = list(offs)

    def band_square(Bd, Bo, mask_offs):
        """C = Bd @ Bd restricted to offsets ``mask_offs`` (or full)."""
        outo = sorted({o1 + o2 for o1 in Bo for o2 in Bo}
                      if mask_offs is None else mask_offs)
        out = {o: np.zeros(n, Bd.dtype) for o in outo}
        bo = {o: d for d, o in enumerate(Bo)}
        for o1 in Bo:
            for o2 in Bo:
                o = o1 + o2
                if o not in out:
                    continue
                out[o] += Bd[bo[o1]] * _shiftv(Bd[bo[o2]], o1, n)
        return np.stack([out[o] for o in outo]), outo

    nsquare = int(np.log2(k))
    for s in range(nsquare):
        last = s == nsquare - 1
        S, Soffs = band_square(S, Soffs, offs if last else None)
    # (k == 1: S restricted to the band is S itself)
    At = S                                    # (nd, n) on offs

    # out-of-grid band positions (i + o outside [0, n)) are not entries
    inb = np.stack([(np.arange(n) + o >= 0) & (np.arange(n) + o < n)
                    for o in offs])
    At = np.where(inb, At, 0)

    # NullDim == 1 measure (same arithmetic as the general path)
    Bv = np.where(Bvec == 0, 1.0, Bvec)
    DAdivB = At[d0] / Bv
    vals = np.zeros_like(At)
    for d, o in enumerate(offs):
        z = At[d]
        approx = DAdivB * _shiftv(Bv, o, n)
        angle = (np.real(approx) * np.real(z) +
                 np.imag(approx) * np.imag(z)) < 0
        ratio = approx / np.where(z == 0, 1, z)
        weak = np.abs(ratio) < 1e-4
        v = np.abs(1.0 - ratio)
        v = np.where(weak | angle | (z == 0), 0.0, v)
        eps_floor = np.sqrt(np.finfo(float).eps)
        vals[d] = np.where((v < eps_floor) & (v != 0), 1e-4, v)
    vals = np.real(vals)

    # distance filter: off-diagonals within epsilon of the row minimum
    if epsilon != np.inf:
        offd = vals.copy()
        offd[d0] = 0
        mn = np.min(np.where(offd != 0, offd, np.inf), axis=0)
        keep = (offd != 0) & (offd <= epsilon * mn[None, :])
        out = np.where(keep, offd, 0)
        out[d0] = vals[d0]
        vals = out

    if symmetrize_measure:
        vals = 0.5 * (vals + np.stack(
            [_shiftv(vals[oidx[-o]], o, n) for o in offs]))
    vals[d0] = 1.0                            # unit diagonal
    vals = np.where(inb, vals, 0)

    iv = np.where(vals != 0, 1.0 / np.where(vals == 0, 1, vals), 0.0)
    rowmax = np.max(np.abs(iv), axis=0)
    iv = iv / np.where(rowmax == 0, 1, rowmax)[None, :]

    # band -> ELL on the nonzero pattern
    rows = np.arange(n, dtype=np.int32)
    cand_cols = np.stack([rows + o for o in offs], axis=1).astype(np.int32)
    cand_vals = iv.T
    cand_ok = inb.T & (cand_vals != 0)
    cand_cols = np.where(cand_ok, cand_cols, 0)
    return ell_dedup(cand_cols, np.where(cand_ok, cand_vals, 0),
                     cand_ok, A.shape)


def evolution_strength_of_connection(A, B=None, epsilon=4.0, k=2,
                                     proj_type="l2", block_flag=False,
                                     symmetrize_measure=True):
    """Evolution strength measure (reference ``strength.py:515``)."""
    if epsilon < 1.0:
        raise ValueError("expected epsilon > 1.0")
    if k <= 0:
        raise ValueError("number of time steps must be > 0")
    if proj_type not in ("l2", "D_A"):
        raise ValueError('proj_type must be "l2" or "D_A"')

    numPDEs = 1
    if isinstance(A, BELL):
        numPDEs = A.blocksize[0]
        from pyamg_tpu.sparse.matrix import to_scipy, from_scipy
        A = from_scipy(to_scipy(A).tocsr())

    xp = _xp(A.vals)
    n = A.shape[0]
    if B is None:
        Bmat = np.ones((n, 1))
    else:
        Bmat = np.asarray(B)
        if Bmat.ndim == 1:
            Bmat = Bmat[:, None]
    NullDim = Bmat.shape[1]

    if (numPDEs == 1 and NullDim == 1 and xp is np
            and proj_type in ("l2", "D_A")):
        # NullDim==1 never uses proj_type (reference strength.py:738
        # shortcut); banded operators take the DIA fast path
        fast = _evolution_dia_fast(A, np.asarray(Bmat[:, 0]), epsilon, k,
                                   symmetrize_measure)
        if fast is not None:
            return fast

    D = extract_diagonal(A)
    Dinv = xp.where(D != 0, 1.0 / xp.where(D == 0, 1, D), 1.0)
    DinvA = scale_rows(A, Dinv)
    from pyamg_tpu.util.linalg import approximate_spectral_radius
    rho = approximate_spectral_radius(DinvA)

    # S = (I - 1/rho DinvA)^T
    from pyamg_tpu.ops.arith import add_scaled_identity
    S = add_scaled_identity(scale_rows(DinvA, xp.full((n,), -1.0 / rho)),
                            alpha=1.0, beta=1.0)
    S = transpose(S)

    # mask = pattern of A (PDE-local couplings only for systems)
    rows = xp.arange(n, dtype=xp.int32)[:, None]
    mask_valid = A.valid_mask()
    if numPDEs > 1:
        same_pde = (A.cols % numPDEs) == (rows % numPDEs)
        mask_valid = mask_valid & same_pde
        mask = ell_dedup(A.cols, xp.where(mask_valid, 1.0, 0.0),
                         mask_valid, A.shape)
    else:
        # A's pattern is already coalesced (ELL invariant) — reuse it
        mask = ELL(A.cols, xp.where(mask_valid, 1.0, 0.0),
                   A.row_nnz, A.shape)

    nsquare = int(np.log2(k))
    ninc = k - 2 ** nsquare
    Atilde = S
    if ninc > 0:
        warnings.warn(
            "The most efficient time stepping for the Evolution Strength "
            f"Method is done in powers of two.\nYou have chosen {k} time "
            "steps.")
        for _ in range(nsquare):
            Atilde = spgemm(Atilde, Atilde)
        for _ in range(ninc):
            Atilde = spgemm(Atilde, S)
        from pyamg_tpu.ops.rowops import row_lookup
        vals = row_lookup(Atilde, mask.cols, mask.valid_mask())
        Atilde = ELL(mask.cols, vals, mask.row_nnz, mask.shape)
    elif nsquare == 0:
        if numPDEs > 1:
            from pyamg_tpu.ops.rowops import row_lookup
            vals = row_lookup(Atilde, mask.cols, mask.valid_mask())
            Atilde = ELL(mask.cols, vals, mask.row_nnz, mask.shape)
    else:
        for _ in range(nsquare - 1):
            Atilde = spgemm(Atilde, Atilde)
        vals = masked_spgemm(Atilde, Atilde, mask.cols, mask.valid_mask())
        Atilde = ELL(mask.cols, vals, mask.row_nnz, mask.shape)

    valid = Atilde.valid_mask()
    if NullDim == 1:
        Bvec = xp.asarray(np.where(Bmat[:, 0] == 0, 1.0, Bmat[:, 0]))
        data = Atilde.vals
        DAtilde = extract_diagonal(Atilde)
        DAdivB = DAtilde / Bvec
        # candidate approximation: row-scaled constant mode
        approx = DAdivB[:, None] * Bvec[Atilde.cols]
        angle = (xp.real(approx) * xp.real(data) +
                 xp.imag(approx) * xp.imag(data)) < 0
        ratio = approx / xp.where(data == 0, 1, data)
        weak = xp.abs(ratio) < 1e-4
        vals = xp.abs(1.0 - ratio)
        vals = xp.where(weak | angle | (data == 0), 0.0, vals)
        eps_floor = np.sqrt(np.finfo(float).eps)
        vals = xp.where((vals < eps_floor) & (vals != 0), 1e-4, vals)
    else:
        vals = _multi_candidate_measure(Atilde, Bmat, D, proj_type)

    vals = xp.real(vals)
    valid = valid & (vals != 0)

    if epsilon != np.inf:
        vals, valid = _apply_distance_filter(Atilde.cols, vals, valid,
                                             epsilon)

    S_out = ell_dedup(Atilde.cols, vals, valid, Atilde.shape)
    if symmetrize_measure:
        from pyamg_tpu.ops.arith import add
        St = transpose(S_out)
        S_out = add(ELL(S_out.cols, 0.5 * xp.asarray(S_out.vals),
                        S_out.row_nnz, S_out.shape),
                    ELL(St.cols, 0.5 * xp.asarray(St.vals), St.row_nnz,
                        St.shape))

    # set the diagonal to 1.0
    from pyamg_tpu.ops.arith import with_diagonal
    S_out = with_diagonal(S_out, xp.ones((n,)))

    if numPDEs > 1:
        # block-min reduction back to the node graph (min_blocks)
        from pyamg_tpu.sparse.matrix import to_scipy, from_scipy
        import scipy.sparse as sp
        Ss = to_scipy(S_out).tobsr(blocksize=(numPDEs, numPDEs))
        nb = Ss.shape[0] // numPDEs
        # min over each block of |entries|, excluding zeros like the
        # reference's min_blocks (it takes min over the dense block)
        dat = Ss.data.reshape(len(Ss.indices), -1)
        red = dat.min(axis=1)
        S_out = from_scipy(sp.csr_matrix((red, Ss.indices, Ss.indptr),
                                         shape=(nb, nb)))

    # invert values (distance -> strength) and row-scale
    iv = xp.where(S_out.vals != 0,
                  1.0 / xp.where(S_out.vals == 0, 1, S_out.vals), 0)
    from pyamg_tpu.strength import _scale_rows_by_largest_entry
    keep = S_out.valid_mask() & (iv != 0)
    iv = _scale_rows_by_largest_entry(S_out.cols, iv, keep)
    return ell_dedup(S_out.cols, xp.where(keep, iv, 0), keep, S_out.shape)


def _multi_candidate_measure(Atilde: ELL, Bmat, D, proj_type):
    """NullDim > 1 measure (reference ``evolution_strength.h:330``):
    per row i, fit the evolved delta over span(B) restricted to the
    pattern, and measure the pointwise approximation angle.

    Batched dense formulation: for each row i with pattern columns J and
    evolved values z = Atilde[i, J], solve
        min_c || diag(w)^(1/2) (B[J] c - z) ||
    and set strength[i, j] = |1 - (B[J] c)_j / z_j| (same weak/angle
    guards as NullDim == 1)."""
    xp = _xp(Atilde.vals)
    n, W = Atilde.cols.shape
    B = xp.asarray(Bmat)
    K = B.shape[1]
    valid = Atilde.valid_mask()
    z = Atilde.vals
    BJ = xp.where(valid[:, :, None], B[Atilde.cols], 0)   # (n, W, K)
    if proj_type == "D_A":
        w = xp.where(valid, xp.abs(xp.asarray(D))[Atilde.cols], 0)
    else:
        w = valid.astype(z.dtype)
    # normal equations (K x K per row)
    G = xp.einsum("nwp,nw,nwq->npq", xp.conjugate(BJ), w, BJ)
    rhs = xp.einsum("nwp,nw,nw->np", xp.conjugate(BJ), w, z)
    from pyamg_tpu.util.linalg import pinv_array
    Ginv = pinv_array(G)
    c = xp.einsum("npq,nq->np", xp.asarray(Ginv), rhs)
    approx = xp.einsum("nwp,np->nw", BJ, c)
    angle = (xp.real(approx) * xp.real(z) +
             xp.imag(approx) * xp.imag(z)) < 0
    ratio = approx / xp.where(z == 0, 1, z)
    weak = xp.abs(ratio) < 1e-4
    vals = xp.abs(1.0 - ratio)
    vals = xp.where(weak | angle | (z == 0), 0.0, vals)
    eps_floor = np.sqrt(np.finfo(float).eps)
    vals = xp.where((vals < eps_floor) & (vals != 0), 1e-4, vals)
    return vals
