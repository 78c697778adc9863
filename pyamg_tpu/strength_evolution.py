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
