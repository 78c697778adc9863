"""Smoother setup registry: binds per-level smoothers onto a hierarchy.

Reference: ``pyamg/relaxation/smoothing.py`` (``change_smoothers:75``,
per-method ``setup_*``).  Here a smoother is a triple

    (kind: str, sopts: dict of *static* options, params: pytree of arrays)

so that the multigrid cycle can be traced once with ``params`` as jit
arguments and ``kind``/``sopts`` baked in.  ``setup_<kind>`` functions
precompute device data (Dinv, colorings, Chebyshev coefficients), the
two-phase analogue of the reference's closure capture (SURVEY.md §A.10).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from pyamg_tpu.sparse.matrix import ELL, BELL, is_concrete
from pyamg_tpu.relaxation import relaxation as rx
from pyamg_tpu.ops.spmv import extract_diagonal, extract_block_diagonal

DEFAULT_SWEEP = "forward"


def rho_D_inv_A(A, seed=0):
    """Spectral radius of D^-1 A (reference ``smoothing.py:372``)."""
    from pyamg_tpu.util.linalg import approximate_spectral_radius
    Dinv = _dinv(A)

    class _Op:
        shape = A.shape
        dtype = A.dtype

        @staticmethod
        def matvec(v):
            from pyamg_tpu.ops.spmv import matvec
            return Dinv * matvec(A, v)

    return approximate_spectral_radius(_Op, seed=seed)


def _dinv(A):
    d = extract_diagonal(A)
    xp = np if is_concrete(d) else jnp
    return xp.where(d != 0, 1.0 / xp.where(d == 0, 1, d), 0.0)


# ---------------------------------------------------------------------------
# setup_* functions: (level, A, opts) -> (kind, sopts, params)
# ---------------------------------------------------------------------------

def setup_none(level, A, opts):
    return ("none", {}, {})


def setup_jacobi(level, A, opts):
    iterations = int(opts.get("iterations", 1))
    omega = float(opts.get("omega", 1.0))
    withrho = bool(opts.get("withrho", True))
    if withrho:
        omega = omega / rho_D_inv_A(A)
    return ("jacobi", {"iterations": iterations},
            {"omega": omega, "Dinv": _dinv(A)})


def setup_richardson(level, A, opts):
    from pyamg_tpu.util.linalg import approximate_spectral_radius
    iterations = int(opts.get("iterations", 1))
    omega = float(opts.get("omega", 1.0)) / approximate_spectral_radius(A)
    return ("richardson", {"iterations": iterations}, {"omega": omega})


def _coloring_params(A):
    colors, nc = rx.make_coloring(_scalar_pattern(A))
    return colors, nc


def _scalar_pattern(A):
    """ELL adjacency for coloring (block matrices use the block graph)."""
    if isinstance(A, BELL):
        return ELL(A.cols, np.ones(A.cols.shape, np.float32), A.row_nnz,
                   (A.n_block_rows, A.n_block_cols))
    return A


def setup_gauss_seidel(level, A, opts):
    iterations = int(opts.get("iterations", 1))
    sweep = opts.get("sweep", "forward")
    colors, nc = _coloring_params(A)
    if isinstance(A, BELL):
        from pyamg_tpu.util.linalg import pinv_array
        return ("block_gauss_seidel",
                {"iterations": iterations, "sweep": sweep, "ncolors": nc},
                {"colors": colors, "Dinv": pinv_array(
                    extract_block_diagonal(A)), "omega": 1.0})
    # omega is a STATIC hyperparameter (sopts, not params): keeping it
    # out of the traced pytree lets the sweep collapse consecutive
    # same-color passes when omega == 1
    return ("gauss_seidel",
            {"iterations": iterations, "sweep": sweep, "ncolors": nc,
             "omega": 1.0},
            {"colors": colors, "Dinv": _dinv(A)})


def setup_sor(level, A, opts):
    kind, sopts, params = setup_gauss_seidel(level, A, opts)
    if kind == "gauss_seidel":
        sopts = dict(sopts)
        sopts["omega"] = float(opts.get("omega", 1.0))
    else:
        params = dict(params)
        params["omega"] = float(opts.get("omega", 1.0))
    return (kind, sopts, params)


def setup_chebyshev(level, A, opts):
    """Chebyshev over [rho/30, 1.1 rho] (reference ``smoothing.py:627``)."""
    from pyamg_tpu.util.linalg import approximate_spectral_radius
    from pyamg_tpu.relaxation.chebyshev import (
        chebyshev_polynomial_coefficients)
    lower = float(opts.get("lower_bound", 1.0 / 30.0))
    upper = float(opts.get("upper_bound", 1.1))
    degree = int(opts.get("degree", 3))
    iterations = int(opts.get("iterations", 1))
    rho = approximate_spectral_radius(A)
    a, b = rho * lower, rho * upper
    coef = -chebyshev_polynomial_coefficients(a, b, degree)[:-1]
    return ("polynomial",
            {"iterations": iterations, "coefficients": tuple(coef.tolist())},
            {})


def setup_polynomial(level, A, opts):
    coef = np.asarray(opts["coefficients"], dtype=float)
    iterations = int(opts.get("iterations", 1))
    return ("polynomial",
            {"iterations": iterations, "coefficients": tuple(coef.tolist())},
            {})


def setup_jacobi_ne(level, A, opts):
    iterations = int(opts.get("iterations", 1))
    omega = float(opts.get("omega", 1.0))
    if bool(opts.get("withrho", True)):
        # damping by rho(D_ne^-1 A A^H) approximated via rho(D^-1 A)
        omega = omega / rho_D_inv_A(A)
    return ("jacobi_ne", {"iterations": iterations}, {"omega": omega})


def setup_gauss_seidel_ne(level, A, opts):
    iterations = int(opts.get("iterations", 1))
    sweep = opts.get("sweep", "forward")
    colors, nc = _coloring_params(A)
    return ("gauss_seidel_ne",
            {"iterations": iterations, "sweep": sweep, "ncolors": nc},
            {"colors": colors, "omega": float(opts.get("omega", 1.0))})


def setup_gauss_seidel_nr(level, A, opts):
    iterations = int(opts.get("iterations", 1))
    sweep = opts.get("sweep", "forward")
    colors, nc = _coloring_params(A)
    return ("gauss_seidel_nr",
            {"iterations": iterations, "sweep": sweep, "ncolors": nc},
            {"colors": colors, "omega": float(opts.get("omega", 1.0))})


def setup_block_jacobi(level, A, opts):
    from pyamg_tpu.util.linalg import pinv_array
    iterations = int(opts.get("iterations", 1))
    omega = float(opts.get("omega", 1.0))
    if isinstance(A, BELL):
        Dinv = pinv_array(extract_block_diagonal(A))
        if bool(opts.get("withrho", True)):
            omega = omega / rho_D_inv_A(A)
        return ("block_jacobi", {"iterations": iterations},
                {"omega": omega, "Dinv": Dinv})
    return setup_jacobi(level, A, opts)


def setup_block_gauss_seidel(level, A, opts):
    return setup_gauss_seidel(level, A, opts)


def setup_cf_jacobi(level, A, opts):
    sopts = {"iterations": int(opts.get("iterations", 1)),
             "f_iterations": int(opts.get("f_iterations", 1)),
             "c_iterations": int(opts.get("c_iterations", 1))}
    split = np.asarray(level.splitting)
    C = jnp.asarray(np.where(split == 1)[0])
    F = jnp.asarray(np.where(split == 0)[0])
    return ("cf_jacobi", sopts,
            {"Cmask": jnp.asarray(split == 1), "Fmask": jnp.asarray(split == 0),
             "omega": float(opts.get("omega", 1.0)), "Dinv": _dinv(A)})


def setup_fc_jacobi(level, A, opts):
    kind, sopts, params = setup_cf_jacobi(level, A, opts)
    return ("fc_jacobi", sopts, params)


def setup_cf_block_jacobi(level, A, opts):
    """CF block Jacobi (reference ``smoothing.py`` setup_cf_block_jacobi).

    Falls back to scalar cf_jacobi when A is not blocked."""
    from pyamg_tpu.util.linalg import pinv_array
    if not isinstance(A, BELL):
        return setup_cf_jacobi(level, A, opts)
    sopts = {"iterations": int(opts.get("iterations", 1)),
             "f_iterations": int(opts.get("f_iterations", 1)),
             "c_iterations": int(opts.get("c_iterations", 1))}
    split = np.asarray(level.splitting)
    nb = A.n_block_rows
    if split.shape[0] != nb:           # per-dof splitting -> per-block
        split = split.reshape(nb, -1)[:, 0]
    Dinv = pinv_array(extract_block_diagonal(A))
    return ("cf_block_jacobi", sopts,
            {"Cmask": jnp.asarray(split == 1),
             "Fmask": jnp.asarray(split == 0),
             "omega": float(opts.get("omega", 1.0)), "Dinv": Dinv})


def setup_fc_block_jacobi(level, A, opts):
    kind, sopts, params = setup_cf_block_jacobi(level, A, opts)
    return (kind.replace("cf_", "fc_") if kind.startswith("cf_block")
            else "fc_jacobi", sopts, params)


def setup_schwarz(level, A, opts):
    # Subdomains: default = each row's stencil neighborhood
    # (reference schwarz_parameters relaxation.py:1002)
    subdomain = opts.get("subdomain", None)
    iterations = int(opts.get("iterations", 1))
    if subdomain is None:
        Ae = _scalar_pattern(A)
        W = Ae.width
        n = Ae.shape[0]
        sub = np.asarray(Ae.cols).copy()
        valid = np.asarray(Ae.valid_mask())
        sub[~valid] = -1
        subdomain = jnp.asarray(sub, jnp.int32)
    return ("schwarz", {"iterations": iterations}, {"subdomain": subdomain})


def setup_strength_based_schwarz(level, A, opts):
    """Strength-based overlapping Schwarz (reference ``smoothing.py:531``):
    subdomains come from the rows of the level's strength-of-connection
    matrix ``C`` (kept with ``keep=True``); falls back to A's own
    pattern when no C was kept — the reference does the same."""
    C = getattr(level, "C", None)
    if C is None:
        return setup_schwarz(level, A, opts)
    Ce = _scalar_pattern(C)
    sub = np.asarray(Ce.cols).copy()
    valid = np.asarray(Ce.valid_mask())
    sub[~valid] = -1
    return ("schwarz", {"iterations": int(opts.get("iterations", 1))},
            {"subdomain": jnp.asarray(sub, jnp.int32)})


def setup_gmres(level, A, opts):
    return ("krylov_gmres", {"maxiter": int(opts.get("maxiter", 5))}, {})


def setup_cg(level, A, opts):
    return ("krylov_cg", {"maxiter": int(opts.get("maxiter", 5))}, {})


def _as_ell(A):
    from pyamg_tpu.sparse.matrix import ELL, to_scipy, from_scipy
    return A if isinstance(A, ELL) else from_scipy(to_scipy(A).tocsr())


def setup_cgne(level, A, opts):
    """Inner-CGNE smoother (reference ``smoothing.py:813``): A^H is
    precomputed here so the jitted cycle only runs matvecs."""
    from pyamg_tpu.ops.transpose import transpose
    return ("krylov_cgne", {"maxiter": int(opts.get("maxiter", 5))},
            {"AH": transpose(_as_ell(A), conjugate=True)})


def setup_cgnr(level, A, opts):
    """Inner-CGNR smoother (reference ``smoothing.py:823``)."""
    from pyamg_tpu.ops.transpose import transpose
    return ("krylov_cgnr", {"maxiter": int(opts.get("maxiter", 5))},
            {"AH": transpose(_as_ell(A), conjugate=True)})


_SETUPS = {
    None: setup_none, "none": setup_none,
    "jacobi": setup_jacobi,
    "richardson": setup_richardson,
    "gauss_seidel": setup_gauss_seidel,
    "sor": setup_sor,
    "chebyshev": setup_chebyshev,
    "polynomial": setup_polynomial,
    "jacobi_ne": setup_jacobi_ne,
    "gauss_seidel_ne": setup_gauss_seidel_ne,
    "gauss_seidel_nr": setup_gauss_seidel_nr,
    "block_jacobi": setup_block_jacobi,
    "block_gauss_seidel": setup_block_gauss_seidel,
    "cf_jacobi": setup_cf_jacobi,
    "fc_jacobi": setup_fc_jacobi,
    "cf_block_jacobi": setup_cf_block_jacobi,
    "fc_block_jacobi": setup_fc_block_jacobi,
    "schwarz": setup_schwarz,
    "strength_based_schwarz": setup_strength_based_schwarz,
    "gmres": setup_gmres,
    "cg": setup_cg,
    "cgne": setup_cgne,
    "cgnr": setup_cgnr,
}

# smoothers whose error propagator is symmetric (for CG-safety detection,
# reference smoothing.py change_smoothers symmetry bookkeeping)
SYMMETRIC_SMOOTHERS = {"jacobi", "richardson", "polynomial", "chebyshev",
                       "block_jacobi", "none", None}


def unpack_arg(v):
    """PyAMG's (name, {opts}) convention (reference ``classical.py:125``)."""
    if isinstance(v, tuple):
        return v[0], dict(v[1])
    return v, {}


def make_smoother(level, A, spec):
    name, opts = unpack_arg(spec)
    if callable(name):
        return ("custom", {}, {"fn": name})
    if name not in _SETUPS:
        raise ValueError(f"unknown smoother {name!r}")
    return _SETUPS[name](level, A, opts)


def change_smoothers(ml, presmoother, postsmoother):
    """Attach smoother descriptors to every level (reference
    ``smoothing.py:75``)."""
    npre = len(ml.levels) - 1
    if npre == 0:           # single-level hierarchy: nothing to smooth
        ml.symmetric_smoothing = True
        return
    pres = presmoother if isinstance(presmoother, list) else \
        [presmoother] * npre
    posts = postsmoother if isinstance(postsmoother, list) else \
        [postsmoother] * npre
    pres = (pres + [pres[-1]] * npre)[:npre]
    posts = (posts + [posts[-1]] * npre)[:npre]
    for lvl, pre, post in zip(ml.levels[:-1], pres, posts):
        lvl.pre = make_smoother(lvl, lvl.A, pre)
        lvl.post = make_smoother(lvl, lvl.A, post)
    ml.symmetric_smoothing = all(
        _is_symmetric_pair(l.pre, l.post) for l in ml.levels[:-1])


def _is_symmetric_pair(pre, post):
    pk, ps, _ = pre
    qk, qs, _ = post
    if pk in SYMMETRIC_SMOOTHERS and qk in SYMMETRIC_SMOOTHERS:
        return pk == qk and ps == qs
    # GS pair fwd/bwd (or symmetric/symmetric) is symmetric
    gs = ("gauss_seidel", "block_gauss_seidel", "sor")
    if pk in gs and qk in gs:
        s1 = ps.get("sweep"), qs.get("sweep")
        return s1 in (("forward", "backward"), ("symmetric", "symmetric"))
    return False


# ---------------------------------------------------------------------------
# apply dispatcher (traced inside the cycle jit)
# ---------------------------------------------------------------------------

def apply_smoother(kind, sopts, params, A, x, b):
    if kind == "none":
        return x
    if kind == "custom":
        return params["fn"](A, x, b)
    if kind == "jacobi":
        return rx.jacobi(A, x, b, iterations=sopts["iterations"],
                         omega=params["omega"], Dinv=params["Dinv"])
    if kind == "richardson":
        for _ in range(sopts["iterations"]):
            from pyamg_tpu.ops.spmv import matvec
            x = x + params["omega"] * (b - matvec(A, x))
        return x
    if kind == "gauss_seidel":
        return rx.gauss_seidel(A, x, b, iterations=sopts["iterations"],
                               sweep=sopts["sweep"], colors=params["colors"],
                               ncolors=sopts["ncolors"],
                               Dinv=params["Dinv"],
                               omega=sopts.get("omega",
                                               params.get("omega", 1.0)))
    if kind == "block_gauss_seidel":
        return rx.block_gauss_seidel(A, x, b, iterations=sopts["iterations"],
                                     sweep=sopts["sweep"],
                                     Dinv=params["Dinv"],
                                     colors=params["colors"],
                                     ncolors=sopts["ncolors"],
                                     omega=params["omega"])
    if kind == "polynomial":
        return rx.polynomial(A, x, b, coefficients=sopts["coefficients"],
                             iterations=sopts["iterations"])
    if kind == "jacobi_ne":
        return rx.jacobi_ne(A, x, b, iterations=sopts["iterations"],
                            omega=params["omega"])
    if kind == "gauss_seidel_ne":
        return rx.gauss_seidel_ne(A, x, b, iterations=sopts["iterations"],
                                  sweep=sopts["sweep"],
                                  colors=params["colors"],
                                  ncolors=sopts["ncolors"],
                                  omega=params["omega"])
    if kind == "gauss_seidel_nr":
        return rx.gauss_seidel_nr(A, x, b, iterations=sopts["iterations"],
                                  sweep=sopts["sweep"],
                                  colors=params["colors"],
                                  ncolors=sopts["ncolors"],
                                  omega=params["omega"])
    if kind == "block_jacobi":
        return rx.block_jacobi(A, x, b, Dinv=params["Dinv"],
                               iterations=sopts["iterations"],
                               omega=params["omega"])
    if kind == "cf_jacobi":
        return rx.cf_jacobi(A, x, b, params["Cmask"], params["Fmask"],
                            iterations=sopts["iterations"],
                            f_iterations=sopts["f_iterations"],
                            c_iterations=sopts["c_iterations"],
                            omega=params["omega"])
    if kind == "fc_jacobi":
        return rx.fc_jacobi(A, x, b, params["Cmask"], params["Fmask"],
                            iterations=sopts["iterations"],
                            f_iterations=sopts["f_iterations"],
                            c_iterations=sopts["c_iterations"],
                            omega=params["omega"])
    if kind == "cf_block_jacobi":
        return rx.cf_block_jacobi(A, x, b, params["Cmask"], params["Fmask"],
                                  Dinv=params["Dinv"],
                                  iterations=sopts["iterations"],
                                  f_iterations=sopts["f_iterations"],
                                  c_iterations=sopts["c_iterations"],
                                  omega=params["omega"])
    if kind == "fc_block_jacobi":
        return rx.fc_block_jacobi(A, x, b, params["Cmask"], params["Fmask"],
                                  Dinv=params["Dinv"],
                                  iterations=sopts["iterations"],
                                  f_iterations=sopts["f_iterations"],
                                  c_iterations=sopts["c_iterations"],
                                  omega=params["omega"])
    if kind == "schwarz":
        return rx.schwarz(A, x, b, params["subdomain"],
                          iterations=sopts["iterations"])
    if kind == "krylov_cg":
        from pyamg_tpu.krylov.inner import inner_cg
        return inner_cg(A, x, b, sopts["maxiter"])
    if kind == "krylov_gmres":
        from pyamg_tpu.krylov.inner import inner_gmres
        return inner_gmres(A, x, b, sopts["maxiter"])
    if kind == "krylov_cgne":
        from pyamg_tpu.krylov.inner import inner_cgne
        return inner_cgne(A, params["AH"], x, b, sopts["maxiter"])
    if kind == "krylov_cgnr":
        from pyamg_tpu.krylov.inner import inner_cgnr
        return inner_cgnr(A, params["AH"], x, b, sopts["maxiter"])
    raise ValueError(f"unknown smoother kind {kind!r}")
