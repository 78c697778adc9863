"""C/F splittings for classical AMG (reference ``pyamg/classical/split.py``).

TPU-first design: PMIS/PMISc/CLJP/CLJPc/MIS are *natively* data-parallel
(Luby-style fixed-point rounds over the ELL adjacency, each round one jitted
neighborhood reduction) — the reference implements the same algorithms as
serial C++ loops (``graph.h:140``, ``ruge_stuben.h:578``).  RS is the one
inherently sequential greedy algorithm (``ruge_stuben.h:285``); it runs in
the native host core (``pyamg_tpu/_native``) because the reference test
thresholds assume its coarse-grid quality, with CLJPc as fallback.

Convention (matches reference): ``S[i, j] != 0`` means node i strongly
depends on node j.  Returns int32 array, 1 = C-point, 0 = F-point.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from pyamg_tpu.sparse.matrix import ELL, to_scipy


def _csr(S: ELL):
    """Host CSR triplet of the off-diagonal pattern of S."""
    import scipy.sparse as sp
    A = to_scipy(S).tocsr()
    A.setdiag(0)
    A.eliminate_zeros()
    A.sort_indices()
    return A


def _pattern_no_diag(S: ELL):
    """(cols, mask) of S with the diagonal and padding masked out."""
    n = S.shape[0]
    rows = jnp.arange(n, dtype=jnp.int32)[:, None]
    mask = S.valid_mask() & (S.cols != rows) & (S.vals != 0)
    return S.cols, mask


def _col_degree(cols, mask, n):
    """in-degree over the strength graph: # nodes each node influences."""
    ones = mask.astype(jnp.int32)
    return jnp.zeros((n,), jnp.int32).at[cols].add(ones)


def _symmetrized(S: ELL):
    """(cols, mask) for G = S union S^T (pattern only), as two edge lists.

    Rather than materializing G, neighborhood reductions run over both the
    row pattern (out-edges) and a transposed pattern (in-edges).
    """
    from pyamg_tpu.ops.transpose import transpose
    cols, mask = _pattern_no_diag(S)
    T = transpose(ELL(S.cols, jnp.where(mask, 1.0, 0.0).astype(S.vals.dtype),
                      S.row_nnz, S.shape))
    tcols, tmask = _pattern_no_diag(T)
    return cols, mask, tcols, tmask


@jax.jit
def _mis_round2(cols, mask, tcols, tmask, state, keys):
    """Luby round over the union graph S + S^T.

    state: 0 active, 1 in MIS (C), -1 removed (F).
    """
    active = state == 0
    nk1 = jnp.where(active[cols] & mask, keys[cols], -jnp.inf)
    nk2 = jnp.where(active[tcols] & tmask, keys[tcols], -jnp.inf)
    nmax = jnp.maximum(jnp.max(nk1, axis=1), jnp.max(nk2, axis=1))
    winner = active & (keys > nmax)
    nwin = jnp.any(winner[cols] & mask, axis=1) | \
        jnp.any(winner[tcols] & tmask, axis=1)
    state = jnp.where(winner, 1, state)
    state = jnp.where((state == 0) & nwin, -1, state)
    return state


def _weights(S: ELL, coloring_method=None, seed=0):
    """PMIS/CLJP weights: in-degree + rand, optionally coloring-perturbed
    (reference ``split.py:388-448`` ``_preprocess``)."""
    n = S.shape[0]
    cols, mask = _pattern_no_diag(S)
    deg = _col_degree(cols, mask, n).astype(jnp.float64)
    rng = np.random.default_rng(seed)
    r = jnp.asarray(rng.random(n))
    if coloring_method is None:
        return deg + r, cols, mask
    from pyamg_tpu.graph import vertex_coloring
    from pyamg_tpu.ops.transpose import transpose
    from pyamg_tpu.ops.arith import add
    ones = ELL(S.cols, jnp.where(mask, 1.0, 0.0), S.row_nnz, S.shape)
    G = add(ones, transpose(ones))
    coloring = jnp.asarray(vertex_coloring(G, method=coloring_method,
                                           seed=seed))
    ncolors = int(jnp.max(coloring)) + 1
    return deg + (r + coloring) / ncolors, cols, mask


def _mis_split(S: ELL, keys, max_iters=None):
    """Run Luby MIS over S union S^T; MIS members are C-points."""
    n = S.shape[0]
    cols, mask, tcols, tmask = _symmetrized(S)
    state = jnp.zeros((n,), jnp.int8)
    it = 0
    while bool(jnp.any(state == 0)):
        state = _mis_round2(cols, mask, tcols, tmask, state, keys)
        it += 1
        if max_iters is not None and it >= max_iters:
            break
        if it > n + 2:
            raise RuntimeError("MIS splitting failed to converge")
    splitting = np.array((state == 1).astype(np.int32))
    # Dirichlet rows (no strong connections at all) are F
    iso = np.asarray(~(jnp.any(mask, axis=1) | jnp.any(tmask, axis=1)))
    splitting[iso] = 0
    return splitting


def MIS(G: ELL, weights, maxiter=None):
    """Maximal independent set of graph G given vertex weights
    (reference ``split.py:155`` helper / ``graph.h:140``)."""
    return _mis_split(G, jnp.asarray(weights, jnp.float64),
                      max_iters=maxiter)


def PMIS(S: ELL, seed=0):
    """Parallel Modified Independent Set splitting (reference
    ``split.py:155``): Luby MIS with (in-degree + rand) weights."""
    keys, _, _ = _weights(S, None, seed)
    return _mis_split(S, keys)


def PMISc(S: ELL, method="JP", seed=0):
    """PMIS in color (reference ``split.py:197``): weights perturbed by a
    parallel vertex coloring for structured-mesh scalability."""
    keys, _, _ = _weights(S, method, seed)
    return _mis_split(S, keys)


# ---------------------------------------------------------------------------
# CLJP — data-parallel formulation of reference ruge_stuben.h:578
# ---------------------------------------------------------------------------

@jax.jit
def _cljp_select(cols, mask, tcols, tmask, w, undecided):
    """D = {i undecided : w_i > w_j for all undecided j in S_i union T_i}."""
    nk1 = jnp.where(undecided[cols] & mask, w[cols], -jnp.inf)
    nk2 = jnp.where(undecided[tcols] & tmask, w[tcols], -jnp.inf)
    nmax = jnp.maximum(jnp.max(nk1, axis=1), jnp.max(nk2, axis=1))
    return undecided & (w > nmax)


@partial(jax.jit, static_argnums=())
def _cljp_update(cols, mask, tcols, tmask, edgemark, w, state, D):
    """Weight-update heuristics of one CLJP pass (ruge_stuben.h:683-746).

    state: 0 undecided, 1 C, -1 F.  edgemark: live flags on S's slots.
    P5: for new C point c, live in-edges from undecided j (slots of row c)
        are removed and w_j decremented.
    P6: for edge (j <- k) live with k undecided: if j and k share a common
        dependence on some new C point c (c in S_j and c in S_k), remove the
        edge and decrement w_k.  (The serial loop removes each edge at most
        once per pass; the parallel form decrements once iff any such c
        exists, which matches because edgemark guards re-removal.)
    """
    n = state.shape[0]
    state = jnp.where(D, 1, state)
    undecided = state == 0

    # --- P5: rows of C points --------------------------------------------
    c_rows = D[:, None]                                  # (n, 1) row is C?
    rem5 = c_rows & mask & edgemark & undecided[cols]
    dec5 = jnp.zeros((n,), w.dtype).at[cols].add(
        jnp.where(rem5, 1.0, 0.0))
    edgemark = edgemark & ~rem5

    # --- P6 ---------------------------------------------------------------
    # dep_D[i]: does i depend on any new C point? (c in S_i with D[c])
    dep_slot = mask & D[cols]                            # slots of row i
    # For edge (j, slot) with k = cols[j, slot]: need a common c in D with
    # c in S_j and c in S_k.  For each candidate slot cc of row j with
    # D[cols[j, cc]], test membership of that c in row k via comparing
    # against k's column list.
    kcols = cols[cols]                                   # (n, W, W)
    kmask = mask[cols]
    # common[j, ks] = any cc, kk: cols[j,cc]==kcols[j,ks,kk] & dep slots ok
    eq = kcols[:, :, :, None] == cols[:, None, None, :]  # (n, Wk, Wkrow, Wc)
    common = jnp.any(eq & kmask[:, :, :, None] & dep_slot[:, None, None, :],
                     axis=(2, 3))
    rem6 = mask & edgemark & undecided[cols] & dep_slot.any(
        axis=1)[:, None] & common
    # j itself must depend on a new C point c — encoded via dep_slot.any(j).
    dec6 = jnp.zeros((n,), w.dtype).at[cols].add(jnp.where(rem6, 1.0, 0.0))
    edgemark = edgemark & ~rem6

    w = w - dec5 - dec6
    state = jnp.where((state == 0) & (w < 1), -1, state)
    return edgemark, w, state


def CLJP(S: ELL, color=False, seed=0):
    """Cleary-Luby-Jones-Plassmann splitting (reference ``split.py:243`` /
    ``ruge_stuben.h:578``), as data-parallel fixed-point rounds."""
    n = S.shape[0]
    cols, mask = _pattern_no_diag(S)
    w, _, _ = _weights(S, "MIS" if color else None, seed)
    _, _, tcols, tmask = _symmetrized(S)
    state = jnp.zeros((n,), jnp.int8)
    edgemark = mask
    it = 0
    while bool(jnp.any(state == 0)):
        D = _cljp_select(cols, mask, tcols, tmask, w,
                         state == 0)
        if not bool(jnp.any(D)):
            # isolated remainder: no one can win (all -inf ties) -> F
            state = jnp.where(state == 0, -1, state)
            break
        edgemark, w, state = _cljp_update(cols, mask, tcols, tmask,
                                          edgemark, w, state, D)
        it += 1
        if it > n + 2:
            raise RuntimeError("CLJP failed to converge")
    return np.asarray((state == 1).astype(np.int32))


def CLJPc(S: ELL, seed=0):
    """CLJP in color (reference ``split.py:297``)."""
    return CLJP(S, color=True, seed=seed)


# ---------------------------------------------------------------------------
# RS — classic sequential greedy (native host core; quality reference)
# ---------------------------------------------------------------------------

def RS(S: ELL, second_pass=False):
    """Ruge-Stuben splitting (reference ``split.py:99`` /
    ``ruge_stuben.h:285``).  Sequential greedy in the native host core;
    falls back to CLJPc if the native library is unavailable."""
    from pyamg_tpu import _native
    A = _csr(S)
    n = A.shape[0]
    T = A.T.tocsr()
    T.sort_indices()
    out = _native.rs_cf_splitting(n, A.indptr, A.indices, T.indptr,
                                  T.indices, second_pass=second_pass)
    if out is None:
        return CLJPc(S)
    return np.asarray(out, np.int32)


def split_dispatch(S: ELL, spec, seed=0):
    """Dispatch PyAMG's (name, opts) CF convention."""
    from pyamg_tpu.relaxation.smoothing import unpack_arg
    name, opts = unpack_arg(spec)
    if callable(name):
        return np.asarray(name(S, **opts), np.int32)
    name = str(name)
    table = {"RS": RS, "PMIS": PMIS, "PMISc": PMISc, "CLJP": CLJP,
             "CLJPc": CLJPc, "MIS": _mis_name}
    if name not in table:
        raise ValueError(f"unknown C/F splitting method {name!r}")
    if name in ("PMIS", "PMISc", "CLJP", "CLJPc"):
        opts = dict(opts)
        opts.setdefault("seed", seed)
    return np.asarray(table[name](S, **opts), np.int32)


def _mis_name(S, seed=0, **opts):
    keys, _, _ = _weights(S, None, seed)
    return _mis_split(S, keys)
