"""Relaxation sweeps (solve-phase smoothers), functional and jittable.

Reference: ``pyamg/relaxation/relaxation.py`` + C++ ``relaxation.h``.  The
reference's Gauss-Seidel is an inherently sequential row loop
(``relaxation.h:49-76``); the TPU-native equivalent is *multicolor* GS:
nodes are grouped into independent sets (graph coloring at setup) and each
color is updated simultaneously — exact GS with respect to the colored
ordering, same smoothing quality class, fully data-parallel.

All smoothers take and return ``x`` (no in-place mutation — JAX functional
style) and take static iteration counts so they trace to fixed programs.
Vectors may be (n,) or (n, k) for multiple RHS.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from pyamg_tpu.sparse.matrix import ELL, BELL, DIA, is_concrete
from pyamg_tpu.ops.spmv import (
    matvec, extract_diagonal, extract_block_diagonal)


def _dinv_vec(A):
    d = extract_diagonal(A)
    xp = np if is_concrete(d) else jnp
    return xp.where(d != 0, 1.0 / xp.where(d == 0, 1, d), 0.0)


def _bcast(v, x):
    """Broadcast a per-node vector over trailing RHS axes of x."""
    return v[:, None] if x.ndim == 2 else v


# ---------------------------------------------------------------------------
# Jacobi family
# ---------------------------------------------------------------------------

def jacobi(A, x, b, iterations=1, omega=1.0, Dinv=None):
    """Damped Jacobi: x <- x + omega * D^-1 (b - A x)
    (reference ``relaxation.py:349`` / ``relaxation.h:310``).

    Host (setup/eager) inputs run the numpy twin — zero XLA compiles."""
    Dinv = _dinv_vec(A) if Dinv is None else Dinv
    if is_concrete(x, b, Dinv) and isinstance(A, (ELL, BELL)):
        x = np.asarray(x)
        b = np.asarray(b)
        Dv = _bcast(np.asarray(Dinv), x)
        for _ in range(iterations):
            x = x + omega * Dv * (b - matvec(A, x))
        return x
    Dinv = _bcast(Dinv, x)
    for _ in range(iterations):
        x = x + omega * Dinv * (b - matvec(A, x))
    return x


def jacobi_indexed(A, x, b, indices, iterations=1, omega=1.0, Dinv=None):
    """Jacobi restricted to an index set (reference ``relaxation.py:1081``).

    ``indices`` may be an int index array or a boolean mask of length n.
    """
    n = A.shape[0]
    host = is_concrete(x, b, indices) and isinstance(A, (ELL, BELL))
    xp = np if host else jnp
    if indices.dtype == bool:
        mask = np.asarray(indices) if host else indices
    elif host:
        mask = np.zeros((n,), bool)
        mask[np.asarray(indices)] = True
    else:
        mask = jnp.zeros((n,), bool).at[indices].set(True)
    Dinv = _dinv_vec(A) if Dinv is None else Dinv
    if host:
        x, b, Dinv = np.asarray(x), np.asarray(b), np.asarray(Dinv)
    Dinv = _bcast(Dinv, x)
    maskb = _bcast(mask, x)
    for _ in range(iterations):
        xn = x + omega * Dinv * (b - matvec(A, x))
        x = xp.where(maskb, xn, x)
    return x


def cf_jacobi(A, x, b, Cpts, Fpts, iterations=1, f_iterations=1,
              c_iterations=1, omega=1.0):
    """CF-Jacobi: relax C points, then F points
    (reference ``relaxation.py:1141``)."""
    for _ in range(iterations):
        x = jacobi_indexed(A, x, b, Cpts, c_iterations, omega)
        x = jacobi_indexed(A, x, b, Fpts, f_iterations, omega)
    return x


def fc_jacobi(A, x, b, Cpts, Fpts, iterations=1, f_iterations=1,
              c_iterations=1, omega=1.0):
    """FC-Jacobi: relax F points, then C points — the default AIR
    post-smoother (reference ``relaxation.py:1206``, ``classical/air.py``)."""
    for _ in range(iterations):
        x = jacobi_indexed(A, x, b, Fpts, f_iterations, omega)
        x = jacobi_indexed(A, x, b, Cpts, c_iterations, omega)
    return x


# ---------------------------------------------------------------------------
# Gauss-Seidel (multicolor) / SOR
# ---------------------------------------------------------------------------

def make_coloring(A, method="JP", seed=0):
    """Color the graph of A for multicolor GS.

    Returns (colors int32 (n,), ncolors int).  Setup-phase.  Any valid
    coloring works (fewer colors = fewer sweep steps), so the host path
    uses the native sequential first-fit (reference ``graph.h:248``,
    O(nnz) C++) rather than the JP fixed-point rounds.
    """
    from pyamg_tpu.graph import vertex_coloring
    if isinstance(A, ELL) and is_concrete(A.cols):
        from pyamg_tpu import _native
        n = A.shape[0]
        row_nnz = np.asarray(A.row_nnz)
        indptr = np.concatenate([[0], np.cumsum(row_nnz)]).astype(np.int32)
        mask = np.arange(A.width)[None, :] < row_nnz[:, None]
        indices = np.asarray(A.cols)[mask].astype(np.int32)
        r = _native.first_fit_coloring(n, indptr, indices)
        if r is not None:
            return jnp.asarray(r[0]), r[1]
    colors = vertex_coloring(A, method=method, seed=seed)
    return jnp.asarray(colors), int(colors.max()) + 1


def gauss_seidel(A, x, b, iterations=1, sweep="forward", colors=None,
                 ncolors=None, Dinv=None, omega=1.0):
    """Multicolor Gauss-Seidel/SOR sweep.

    Per color c (in order): x_i <- x_i + omega*(b_i - (A x)_i)/a_ii for all
    i with color c.  Within a color, nodes are independent, so this equals
    sequential GS under the colored ordering.  ``sweep``: 'forward',
    'backward' (reverse color order), or 'symmetric'.

    Reference semantics at the convergence-factor level:
    ``relaxation.py:265`` (the reference's lexicographic ordering is an
    implementation detail; its own tests assert factors, SURVEY.md §7.3).

    SELL operators take the fused single-kernel sweep (sequential
    1024-row tiles with x resident in VMEM — GS across tiles, Jacobi
    within a tile; see ``ops/sell_kernels.sell_gs_sweep``).
    """
    from pyamg_tpu.sparse.sell import SELL
    if isinstance(A, SELL) and getattr(x, "ndim", 1) == 1:
        from pyamg_tpu.ops.sell_kernels import sell_gs_sweep
        Dinv = _dinv_vec(A) if Dinv is None else jnp.asarray(Dinv)
        for _ in range(iterations):
            x = sell_gs_sweep(A, x, b, Dinv, omega=omega, sweep=sweep)
        return x
    if colors is None:
        colors, ncolors = make_coloring(A)
    fwd = list(range(int(ncolors)))
    if sweep == "forward":
        seq = fwd
    elif sweep == "backward":
        seq = fwd[::-1]
    elif sweep == "symmetric":
        seq = fwd + fwd[::-1]
    else:
        raise ValueError(f"unknown sweep {sweep!r}")
    order = seq * int(iterations)
    try:
        om_static = float(omega)          # traced omega -> no collapse
    except Exception:
        om_static = None
    if om_static == 1.0 and len(order) > 1:
        # with omega = 1 a color pass leaves its rows' residuals at
        # (f32-roundoff) zero, so an immediately repeated color is a
        # no-op: symmetric (0,1)+(1,0) collapses to (0,1,0) — the
        # classic shared-middle of symmetric GS, 25% fewer A passes
        order = [order[0]] + [c for i, c in enumerate(order[1:])
                              if c != order[i]]
    if isinstance(A, DIA) and getattr(x, "ndim", 1) == 1 \
            and colors is not None and not is_concrete(x, b):
        from pyamg_tpu.ops.pallas_kernels import (dia_gs_sweep,
                                                  pallas_available)
        if pallas_available():
            Dv = _dinv_vec(A) if Dinv is None else Dinv
            xn = dia_gs_sweep(A, x, b, Dv, colors, tuple(order),
                              omega=omega)
            if xn is not None:
                return xn
    Dinv = _dinv_vec(A) if Dinv is None else Dinv
    host = is_concrete(x, b, Dinv, colors) and isinstance(A, (ELL, BELL))
    if host:
        x = np.asarray(x)
        b = np.asarray(b)
        Dinv = np.asarray(Dinv)
        colors = np.asarray(colors)
    xp = np if host else jnp
    Dinvb = _bcast(Dinv, x)
    for c in order:
        r = b - matvec(A, x)
        upd = x + omega * Dinvb * r
        m = _bcast(colors == c, x)
        x = xp.where(m, upd, x)
    return x


def sor(A, x, b, omega, iterations=1, sweep="forward", colors=None,
        ncolors=None, Dinv=None):
    """SOR = omega-weighted multicolor GS (reference ``relaxation.py:100``)."""
    return gauss_seidel(A, x, b, iterations=iterations, sweep=sweep,
                        colors=colors, ncolors=ncolors, Dinv=Dinv,
                        omega=omega)


def gauss_seidel_indexed(A, x, b, indices, iterations=1, sweep="forward",
                         colors=None, ncolors=None):
    """GS over an index subset (reference ``relaxation.py:662``): multicolor
    over the subgraph; here approximated by masked multicolor sweeps."""
    n = A.shape[0]
    if indices.dtype == bool:
        mask = indices
    else:
        mask = jnp.zeros((n,), bool).at[jnp.asarray(indices)].set(True)
    if colors is None:
        colors, ncolors = make_coloring(A)
    Dinv = _dinv_vec(A)
    Dinvb = _bcast(Dinv, x)
    order = list(range(ncolors))
    if sweep == "backward":
        order = order[::-1]
    for _ in range(iterations):
        for c in order:
            r = b - matvec(A, x)
            upd = x + Dinvb * r
            m = _bcast((colors == c) & mask, x)
            x = jnp.where(m, upd, x)
    return x


# ---------------------------------------------------------------------------
# Polynomial / Chebyshev
# ---------------------------------------------------------------------------

def polynomial(A, x, b, coefficients, iterations=1):
    """x <- x + p(A)(b - A x), Horner with descending ``coefficients``
    (reference ``relaxation.py:585``)."""
    coefficients = list(np.asarray(coefficients))
    for _ in range(iterations):
        residual = b - matvec(A, x)
        h = coefficients[0] * residual
        for c in coefficients[1:]:
            h = c * residual + matvec(A, h)
        x = x + h
    return x


def chebyshev(A, x, b, rho=None, lower_fraction=1.0 / 30.0, degree=3,
              iterations=1, coefficients=None):
    """Chebyshev smoothing over [rho/30, 1.1*rho]
    (reference ``smoothing.py:627`` setup_chebyshev)."""
    if coefficients is None:
        from pyamg_tpu.util.linalg import approximate_spectral_radius
        from pyamg_tpu.relaxation.chebyshev import (
            chebyshev_polynomial_coefficients)
        if rho is None:
            rho = approximate_spectral_radius(A)
        a, bb = rho * lower_fraction, 1.1 * rho
        coefficients = -chebyshev_polynomial_coefficients(a, bb, degree)[:-1]
    return polynomial(A, x, b, coefficients, iterations)


# ---------------------------------------------------------------------------
# Block smoothers (BELL)
# ---------------------------------------------------------------------------

def block_jacobi(A, x, b, Dinv=None, iterations=1, omega=1.0):
    """Block Jacobi with blockwise diagonal inverse
    (reference ``relaxation.py:423`` / ``relaxation.h:1022``)."""
    from pyamg_tpu.util.linalg import pinv_array
    assert isinstance(A, BELL)
    br = A.blocksize[0]
    nb = A.n_block_rows
    if Dinv is None:
        Dinv = pinv_array(extract_block_diagonal(A))
    host = is_concrete(x, b, Dinv)
    xp = np if host else jnp
    if host:
        x, b, Dinv = np.asarray(x), np.asarray(b), np.asarray(Dinv)
    multi = x.ndim == 2
    for _ in range(iterations):
        r = (b - matvec(A, x))
        if multi:
            rb = r.reshape(nb, br, -1)
            dx = xp.einsum("nij,njk->nik", Dinv, rb).reshape(x.shape)
        else:
            rb = r.reshape(nb, br)
            dx = xp.einsum("nij,nj->ni", Dinv, rb).reshape(-1)
        x = x + omega * dx
    return x


def block_gauss_seidel(A, x, b, iterations=1, sweep="forward", Dinv=None,
                       colors=None, ncolors=None, omega=1.0):
    """Multicolor block GS (reference ``relaxation.py:502``)."""
    from pyamg_tpu.util.linalg import pinv_array
    assert isinstance(A, BELL)
    br = A.blocksize[0]
    nb = A.n_block_rows
    if Dinv is None:
        Dinv = pinv_array(extract_block_diagonal(A))
    if colors is None:
        # color the block graph
        from pyamg_tpu.graph import vertex_coloring
        patt = ELL(A.cols, jnp.ones(A.cols.shape, jnp.float32), A.row_nnz,
                   (nb, nb))
        cnp = vertex_coloring(patt)
        colors, ncolors = jnp.asarray(cnp), int(cnp.max()) + 1
    host = is_concrete(x, b, Dinv, colors)
    xp = np if host else jnp
    if host:
        x, b = np.asarray(x), np.asarray(b)
        Dinv, colors = np.asarray(Dinv), np.asarray(colors)
    multi = x.ndim == 2

    def color_update(x, c):
        r = b - matvec(A, x)
        if multi:
            rb = r.reshape(nb, br, -1)
            dx = xp.einsum("nij,njk->nik", Dinv, rb)
            m = (colors == c)[:, None, None]
            dx = xp.where(m, dx, 0).reshape(x.shape)
        else:
            rb = r.reshape(nb, br)
            dx = xp.einsum("nij,nj->ni", Dinv, rb)
            dx = xp.where((colors == c)[:, None], dx, 0).reshape(-1)
        return x + omega * dx

    order = list(range(ncolors))
    for _ in range(iterations):
        if sweep in ("forward", "symmetric"):
            for c in order:
                x = color_update(x, c)
        if sweep in ("backward", "symmetric"):
            for c in order[::-1]:
                x = color_update(x, c)
    return x


def block_jacobi_indexed(A, x, b, indices, Dinv=None, iterations=1,
                         omega=1.0):
    """Block Jacobi restricted to a set of block rows
    (reference ``relaxation.h:1130``).

    ``indices`` are block-row indices (supernodes) or a boolean mask over
    block rows; only those blocks are updated."""
    from pyamg_tpu.util.linalg import pinv_array
    assert isinstance(A, BELL)
    br = A.blocksize[0]
    nb = A.n_block_rows
    if Dinv is None:
        Dinv = pinv_array(extract_block_diagonal(A))
    host = is_concrete(x, b, Dinv, indices)
    xp = np if host else jnp
    if host:
        x, b, Dinv = np.asarray(x), np.asarray(b), np.asarray(Dinv)
        indices = np.asarray(indices)
    if indices.dtype == bool:
        mask = indices
    elif host:
        mask = np.zeros((nb,), bool)
        mask[indices] = True
    else:
        mask = jnp.zeros((nb,), bool).at[indices].set(True)
    multi = x.ndim == 2
    for _ in range(iterations):
        r = b - matvec(A, x)
        if multi:
            rb = r.reshape(nb, br, -1)
            dx = xp.einsum("nij,njk->nik", Dinv, rb)
            dx = xp.where(mask[:, None, None], dx, 0).reshape(x.shape)
        else:
            rb = r.reshape(nb, br)
            dx = xp.einsum("nij,nj->ni", Dinv, rb)
            dx = xp.where(mask[:, None], dx, 0).reshape(-1)
        x = x + omega * dx
    return x


def cf_block_jacobi(A, x, b, Cpts, Fpts, Dinv=None, iterations=1,
                    f_iterations=1, c_iterations=1, omega=1.0):
    """CF block Jacobi: relax C blocks, then F blocks
    (reference ``relaxation.py:1271``).  Cpts/Fpts are block-row indices."""
    from pyamg_tpu.util.linalg import pinv_array
    if Dinv is None:
        Dinv = pinv_array(extract_block_diagonal(A))
    for _ in range(iterations):
        x = block_jacobi_indexed(A, x, b, Cpts, Dinv, c_iterations, omega)
        x = block_jacobi_indexed(A, x, b, Fpts, Dinv, f_iterations, omega)
    return x


def fc_block_jacobi(A, x, b, Cpts, Fpts, Dinv=None, iterations=1,
                    f_iterations=1, c_iterations=1, omega=1.0):
    """FC block Jacobi: relax F blocks, then C blocks
    (reference ``relaxation.py:1342``)."""
    from pyamg_tpu.util.linalg import pinv_array
    if Dinv is None:
        Dinv = pinv_array(extract_block_diagonal(A))
    for _ in range(iterations):
        x = block_jacobi_indexed(A, x, b, Fpts, Dinv, f_iterations, omega)
        x = block_jacobi_indexed(A, x, b, Cpts, Dinv, c_iterations, omega)
    return x


# ---------------------------------------------------------------------------
# Kaczmarz / normal-equation smoothers
# ---------------------------------------------------------------------------

def jacobi_ne(A, x, b, iterations=1, omega=1.0):
    """Jacobi on the normal equations A A^H y = b (Kaczmarz/Cimmino flavor):
    x <- x + omega * A^H D^-1 (b - A x) with D = diag(A A^H) (row norms)
    (reference ``relaxation.py:734`` / ``relaxation.h:811``)."""
    from pyamg_tpu.ops.spmv import rspmv
    rownorm = jnp.sum(jnp.abs(A.vals) ** 2, axis=1)
    Dinv = jnp.where(rownorm != 0, 1.0 / jnp.where(rownorm == 0, 1, rownorm), 0)
    for _ in range(iterations):
        r = b - matvec(A, x)
        x = x + omega * rspmv(A, jnp.conj(Dinv) * r
                              if jnp.iscomplexobj(A.vals) else Dinv * r)
    return x


def gauss_seidel_ne(A, x, b, iterations=1, sweep="forward", omega=1.0,
                    colors=None, ncolors=None):
    """Multicolor Kaczmarz GS (NE) (reference ``relaxation.py:815``)."""
    from pyamg_tpu.ops.spmv import rspmv
    if colors is None:
        colors, ncolors = make_coloring(A)
    rownorm = jnp.sum(jnp.abs(A.vals) ** 2, axis=1)
    Dinv = jnp.where(rownorm != 0, 1.0 / jnp.where(rownorm == 0, 1, rownorm), 0)
    order = list(range(ncolors))
    if sweep == "backward":
        order = order[::-1]
    for _ in range(iterations):
        for c in order:
            r = b - matvec(A, x)
            delta = jnp.where(colors == c, omega * Dinv * r, 0)
            x = x + rspmv(A, delta)
    return x


def gauss_seidel_nr(A, x, b, iterations=1, sweep="forward", omega=1.0,
                    colors=None, ncolors=None):
    """Multicolor GS on the normal equations A^H A x = A^H b
    (reference ``relaxation.py:904``)."""
    from pyamg_tpu.ops.spmv import rspmv
    if colors is None:
        colors, ncolors = make_coloring(A)
    colnorm = jnp.zeros((A.shape[1],), jnp.abs(A.vals).dtype)
    colnorm = colnorm.at[A.cols].add(jnp.abs(A.vals) ** 2)
    Dinv = jnp.where(colnorm != 0, 1.0 / jnp.where(colnorm == 0, 1, colnorm), 0)
    order = list(range(ncolors))
    if sweep == "backward":
        order = order[::-1]
    for _ in range(iterations):
        for c in order:
            r = b - matvec(A, x)                       # (n,)
            g = rspmv(A, r)                            # A^H r, (m,)
            delta = jnp.where(colors[:A.shape[1]] == c
                              if colors.shape[0] >= A.shape[1]
                              else jnp.ones((A.shape[1],), bool),
                              omega * Dinv * g, 0)
            x = x + delta
    return x


def schwarz(A, x, b, subdomain, subdomain_ptr=None, iterations=1,
            max_size=None):
    """Overlapping Schwarz: batched dense subdomain solves
    (reference ``relaxation.py:157`` / ``relaxation.h:1446``).

    ``subdomain``: (ns, max_size) int32 padded member lists (pad = -1).
    Each subdomain solve: x[S] += A[S,S]^-1 r[S].  Batched on the MXU.
    """
    ns, ms = subdomain.shape
    pad = subdomain < 0
    idx = jnp.where(pad, 0, subdomain)
    # gather dense subblocks A[S,S]: for each subdomain, rows idx, need
    # A[idx_i, idx_j]; via ELL row gather + membership match
    cols = A.cols[idx]                 # (ns, ms, W)
    vals = A.vals[idx]
    member = cols[:, :, :, None] == idx[:, None, None, :]   # (ns,ms,W,ms)
    sub = jnp.einsum("smwt,smw->smt", member.astype(A.vals.dtype), vals)
    eye = jnp.eye(ms, dtype=A.vals.dtype)
    sub = jnp.where(pad[:, :, None] | pad[:, None, :], eye, sub)
    for _ in range(iterations):
        r = b - matvec(A, x)
        rs = r[idx]
        rs = jnp.where(pad, 0, rs)
        dx = jnp.linalg.solve(sub, rs[..., None])[..., 0]
        dx = jnp.where(pad, 0, dx)
        # additive overlapping update averaged by overlap count
        cnt = jnp.zeros((A.shape[0],), A.vals.dtype).at[idx].add(
            jnp.where(pad, 0, 1).astype(A.vals.dtype))
        upd = jnp.zeros_like(x).at[idx.reshape(-1)].add(dx.reshape(-1))
        x = x + upd / jnp.maximum(cnt, 1)
    return x
