"""Dense/eigen utilities (reference ``pyamg/util/linalg.py``).

``approximate_spectral_radius`` drives the damping of every Jacobi-type
smoother and prolongation smoother (reference ``util/linalg.py:255``).
Implemented as Arnoldi/Lanczos with device matvecs and a host-side small
Hessenberg eigensolve — setup-phase only.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from pyamg_tpu.sparse.matrix import ELL, BELL, is_concrete
from pyamg_tpu.ops.spmv import matvec as sp_matvec


def norm(x, pnorm="2"):
    """Vector norm (2-norm default); matches reference ``linalg.py:13``.

    Host inputs stay in numpy (setup phase — no XLA compiles)."""
    xp = np if is_concrete(x) else jnp
    x = xp.asarray(x)
    if pnorm == "2":
        return xp.sqrt(xp.real(xp.vdot(x, x)))
    if pnorm == "inf":
        return xp.max(xp.abs(x))
    raise ValueError(f"unsupported norm {pnorm!r}")


def infinity_norm(A) -> float:
    """max row sum of |A| (reference ``linalg.py:53``)."""
    if isinstance(A, (ELL, BELL)):
        if isinstance(A, BELL):
            from pyamg_tpu.sparse.matrix import to_scipy
            return float(abs(to_scipy(A)).sum(axis=1).max())
        vals = np.asarray(A.vals)
        return float(np.max(np.sum(np.abs(vals), axis=1)))
    return float(np.abs(np.asarray(A)).sum(axis=1).max())


def _as_matvec(A):
    if isinstance(A, (ELL, BELL)):
        return (lambda v: sp_matvec(A, v)), A.shape[0], A.dtype
    if callable(getattr(A, "matvec", None)):
        return A.matvec, A.shape[0], getattr(A, "dtype", jnp.float64)
    A = jnp.asarray(A)
    return (lambda v: A @ v), A.shape[0], A.dtype


def _arnoldi(mv, n, dtype, maxiter, v0):
    """Arnoldi orthogonalization; returns (H, V, breakdown).

    Host path: preallocated (maxiter+1, n) basis + BLAS CGS2 (two gemv
    pairs per step — same H as modified Gram-Schmidt in exact
    arithmetic, and the python-loop dot/axpy chain cost seconds per
    call at n = 10^7).  Traced inputs keep the sequential MGS chain.
    """
    xp = np if is_concrete(v0) else jnp
    if xp is np:
        v0 = np.asarray(v0)
        V = np.empty((maxiter + 1, n), dtype=v0.dtype)
        V[0] = v0 / float(norm(v0))
        H = np.zeros((maxiter + 1, maxiter),
                     dtype=np.complex128 if np.iscomplexobj(v0)
                     else np.float64)
        breakdown = False
        k = maxiter
        for j in range(maxiter):
            w = np.asarray(mv(V[j]))
            Vj = V[:j + 1]
            h1 = Vj.conj() @ w
            w = w - Vj.T @ h1
            h2 = Vj.conj() @ w
            w = w - Vj.T @ h2
            H[:j + 1, j] = h1 + h2
            beta = float(np.linalg.norm(w))
            H[j + 1, j] = beta
            if beta < 1e-14 * max(1.0, abs(H[j, j])):
                breakdown = True
                k = j + 1
                break
            V[j + 1] = w / beta
        return H[:k + 1, :k], V[:k + 1], breakdown
    V = []
    v = v0 / norm(v0)
    V.append(v)
    H = np.zeros((maxiter + 1, maxiter),
                 dtype=np.complex128 if np.iscomplexobj(np.asarray(v0))
                 else np.float64)
    breakdown = False
    k = maxiter
    for j in range(maxiter):
        w = mv(V[j])
        for i in range(j + 1):
            h = xp.vdot(V[i], w)
            w = w - h * V[i]
            H[i, j] = complex(h) if np.iscomplexobj(H) else float(xp.real(h))
        beta = float(norm(w))
        H[j + 1, j] = beta
        if beta < 1e-14 * max(1.0, abs(H[j, j])):
            breakdown = True
            k = j + 1
            break
        V.append(w / beta)
    return H[:k + 1, :k], V, breakdown


def approximate_spectral_radius(A, tol=0.01, maxiter=15, restart=5,
                                symmetric=None, initial_guess=None,
                                return_vector=False, seed=0):
    """Estimate rho(A) via (restarted) Arnoldi Ritz values.

    Behavioral parity with reference ``util/linalg.py:255``: restart from the
    dominant Ritz vector until the eigen-residual estimate
    ``H[k, k-1] * evect[-1]`` is below ``tol`` relative.
    """
    mv, n, dtype = _as_matvec(A)
    rng = np.random.default_rng(seed)
    if initial_guess is None:
        v0 = rng.random(n)
        if np.issubdtype(np.dtype(dtype), np.complexfloating):
            v0 = v0 + 1j * rng.random(n)
        v0 = np.asarray(v0, dtype=dtype)
    else:
        v0 = np.asarray(initial_guess, dtype=dtype).reshape(-1)

    ev_max = 0.0
    vec = v0
    for _ in range(restart + 1):
        H, V, breakdown = _arnoldi(mv, n, dtype, maxiter, vec)
        k = H.shape[1]
        if k == 0:
            break
        Hk = H[:k, :k]
        evals, evects = np.linalg.eig(Hk)
        mi = int(np.abs(evals).argmax())
        ev_max = float(np.abs(evals[mi]))
        err = abs(H[k, k - 1] * evects[-1, mi]) if H.shape[0] > k else 0.0
        if isinstance(V, np.ndarray):
            Vm = V[:k].T
        else:
            Vm = np.stack([np.asarray(v) for v in V[:k]], axis=1)
        vec = Vm @ np.asarray(evects[:, mi], dtype=Vm.dtype)
        if breakdown or (ev_max > 0 and err / ev_max < tol):
            break
    if return_vector:
        return ev_max, vec
    return ev_max


def condest(A, maxiter=25, symmetric=False, seed=0):
    """Rough 2-norm condition estimate via Arnoldi Ritz values
    (reference ``linalg.py:384``)."""
    mv, n, dtype = _as_matvec(A)
    rng = np.random.default_rng(seed)
    v0 = np.asarray(rng.random(n), dtype=dtype)
    H, V, _ = _arnoldi(mv, n, dtype, min(maxiter, n), v0)
    k = H.shape[1]
    ev = np.linalg.eigvals(H[:k, :k])
    return float(np.abs(ev).max() / np.abs(ev).min())


def ishermitian(A, fast_check=True, tol=1e-6, seed=0):
    """Hermitian test; fast random-vector probe like reference
    ``linalg.py:479``."""
    mv, n, dtype = _as_matvec(A)
    rng = np.random.default_rng(seed)
    if fast_check:
        x = np.asarray(rng.random(n), dtype=dtype)
        y = np.asarray(rng.random(n), dtype=dtype)
        lhs = complex(np.vdot(x, np.asarray(mv(y))))
        rhs = complex(np.vdot(np.asarray(mv(x)), y))
        scale = float(norm(np.asarray(mv(x))) * norm(y)) + 1e-300
        return bool(abs(lhs - rhs) / scale < tol)
    from pyamg_tpu.sparse.matrix import to_scipy
    M = to_scipy(A) if isinstance(A, (ELL, BELL)) else np.asarray(A)
    diff = abs(M - M.conj().T)
    mx = diff.max() if not hasattr(diff, "toarray") else diff.max()
    return bool(mx < tol)


def pinv_array(blocks, tol=None):
    """Batched pseudo-inverse of many small square blocks
    (reference ``linalg.py:931`` / C++ ``linalg.h:931``).

    blocks: (m, k, k) array -> (m, k, k) of pinv's; TPU-native batched op.
    """
    if is_concrete(blocks):
        blocks = np.asarray(blocks)
        if blocks.shape[-1] == 1:
            d = blocks[..., 0, 0]
            inv = np.where(np.abs(d) > 0, 1.0 / np.where(d == 0, 1, d), 0.0)
            return inv[..., None, None]
        return np.linalg.pinv(blocks)
    blocks = jnp.asarray(blocks)
    if blocks.shape[-1] == 1:
        d = blocks[..., 0, 0]
        inv = jnp.where(jnp.abs(d) > 0, 1.0 / jnp.where(d == 0, 1, d), 0.0)
        return inv[..., None, None]
    return jnp.linalg.pinv(blocks)
