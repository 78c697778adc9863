"""Distributed (sharded) setup-phase tests on the 8-device CPU mesh.

Validates SURVEY.md §2.3/§5.8: hierarchy construction under shard_map
with ghost-margin ring exchange, never materializing a global matrix on
one host, plus the sharded solve path.
"""

import numpy as np
import jax
import jax.numpy as jnp
import scipy.sparse as sp


def _tosp(cols, vals, ok, ncols):
    cn, vn, okn = np.asarray(cols), np.asarray(vals), np.asarray(ok)
    rows = np.repeat(np.arange(cn.shape[0]), cn.shape[1])
    return sp.csr_matrix((vn.ravel()[okn.ravel()],
                          (rows[okn.ravel()], cn.ravel()[okn.ravel()])),
                         shape=(cn.shape[0], ncols))


def _poisson_sharded(N, dtype=jnp.float64):
    from pyamg_tpu.parallel.dist_setup import dist_stencil_grid
    from pyamg_tpu.parallel.partition import make_row_mesh
    mesh = make_row_mesh(8)
    st = np.array([[0, -1, 0], [-1, 4, -1], [0, -1, 0]], np.float64)
    cols, vals, ok, n_loc = dist_stencil_grid(st, (N, N), mesh,
                                              dtype=dtype)
    return mesh, cols, vals, ok, n_loc


class TestDistGallery:
    def test_sharded_stencil_grid_matches_host(self):
        from pyamg_tpu.gallery import stencil_grid
        from pyamg_tpu.sparse.matrix import to_scipy
        mesh, cols, vals, ok, n_loc = _poisson_sharded(40)
        st = np.array([[0, -1, 0], [-1, 4, -1], [0, -1, 0]], np.float64)
        S = to_scipy(stencil_grid(st, (40, 40))).tocsr()
        n = S.shape[0]
        G = _tosp(cols, vals, ok, cols.shape[0])
        assert abs(G[:n, :n] - S).max() == 0
        # pad rows (if any) are identity
        npad = cols.shape[0] - n
        if npad:
            assert (G[n:, n:].diagonal() == 1).all()


class TestDistSetup:
    def test_galerkin_matches_scipy_rap_exactly(self):
        """Distributed Ac must equal R @ A @ P computed by scipy from the
        gathered operators, and R must equal P^T (SA symmetry)."""
        from pyamg_tpu.parallel.dist_setup import distributed_sa_setup
        mesh, cols, vals, ok, n_loc = _poisson_sharded(40)
        hier = distributed_sa_setup(cols, vals, ok, n_loc, mesh,
                                    coarsen_until=64)
        assert sum(hier.diagnostics["dropped"]) == 0
        L0, L1 = hier.levels[0], hier.levels[1]
        n, nc, c_cap, g = L0.n, L1.n, L1.n_loc, L0.gp
        A = _tosp(L0.cols, L0.vals, L0.ok, n)
        P = _tosp(L0.p_cols, L0.p_vals, L0.p_ok, nc)
        Ac = _tosp(L1.cols, L1.vals, L1.ok, nc)
        # R: extended-fine columns -> global fine columns per shard
        rc = np.asarray(L0.r_cols)
        rv = np.asarray(L0.r_vals)
        rok = np.asarray(L0.r_ok)
        rows_g, cols_g, vals_g = [], [], []
        for d in range(8):
            blk = slice(d * c_cap, (d + 1) * c_cap)
            glob = rc[blk] + d * n_loc - g
            m = rok[blk] & (glob >= 0) & (glob < n)
            ridx = np.repeat(np.arange(d * c_cap, (d + 1) * c_cap),
                             rc.shape[1]).reshape(c_cap, -1)
            rows_g.append(ridx[m])
            cols_g.append(glob[m])
            vals_g.append(rv[blk][m])
        R = sp.csr_matrix((np.concatenate(vals_g),
                           (np.concatenate(rows_g),
                            np.concatenate(cols_g))), shape=(nc, n))
        assert abs(R - P.T).max() == 0
        used = np.asarray(R.sum(axis=1)).ravel() != 0
        D = (Ac - (R @ A @ P)).tocsr()
        assert abs(D[used]).max() < 1e-13
        # unused coarse slots are identity rows
        assert abs(D[~used] - sp.eye(nc).tocsr()[~used]).max() < 1e-13
        assert abs(Ac - Ac.T).max() < 1e-13

    def test_setup_and_cg_solve_converges(self):
        from pyamg_tpu.parallel.dist_setup import distributed_sa_setup
        mesh, cols, vals, ok, n_loc = _poisson_sharded(40)
        hier = distributed_sa_setup(cols, vals, ok, n_loc, mesh,
                                    coarsen_until=64)
        n = 1600
        b = np.random.default_rng(0).standard_normal(cols.shape[0])
        b[n:] = 0.0
        x, relres, it = hier.solve_cg(jnp.asarray(b), tol=1e-8,
                                      maxiter=60)
        assert relres < 1e-8
        assert it <= 25
        L0 = hier.levels[0]
        S = _tosp(L0.cols, L0.vals, L0.ok, L0.n)[:n, :n]
        true = np.linalg.norm(b[:n] - S @ np.asarray(x)[:n]) \
            / np.linalg.norm(b)
        assert true < 1e-7

    def test_three_sharded_levels(self):
        """Larger case exercising the multi-level sharded recursion and
        multi-hop ghost margins on coarse levels."""
        from pyamg_tpu.parallel.dist_setup import distributed_sa_setup
        mesh, cols, vals, ok, n_loc = _poisson_sharded(96)
        hier = distributed_sa_setup(cols, vals, ok, n_loc, mesh,
                                    coarsen_until=300)
        assert len(hier.levels) >= 3
        b = np.random.default_rng(3).standard_normal(cols.shape[0])
        b[96 * 96:] = 0.0
        x, relres, it = hier.solve_cg(jnp.asarray(b), tol=1e-8,
                                      maxiter=60)
        assert relres < 1e-8, (relres, it)

    def test_dist_from_scipy_airfoil(self):
        """General-matrix ingestion (SURVEY §7.3): a gallery .mat
        (airfoil, unstructured mesh) row-partitions onto the 8-device
        mesh via RCM ordering and the distributed SA setup + PCG solve
        converge; the solution matches the operator to 1e-7."""
        from pyamg_tpu.parallel.dist_setup import (dist_from_scipy,
                                                   distributed_sa_setup)
        from pyamg_tpu.parallel.partition import make_row_mesh
        from pyamg_tpu.gallery import load_example
        from pyamg_tpu.sparse.matrix import to_scipy

        d = load_example("airfoil")
        A = to_scipy(d["A"] if isinstance(d, dict) else d).tocsr()
        n = A.shape[0]
        mesh = make_row_mesh(8)
        cols, vals, ok, n_loc, perm = dist_from_scipy(
            A, mesh, dtype=jnp.float64)
        hier = distributed_sa_setup(cols, vals, ok, n_loc, mesh,
                                    coarsen_until=48)
        b = np.zeros(cols.shape[0])
        rng = np.random.default_rng(5)
        b_orig = rng.standard_normal(n)
        b[:n] = b_orig[perm]            # internal ordering
        x, relres, it = hier.solve_cg(jnp.asarray(b), tol=1e-8,
                                      maxiter=80)
        assert relres < 1e-8, (relres, it)
        x_orig = np.empty(n)
        x_orig[perm] = np.asarray(x)[:n]
        true = np.linalg.norm(b_orig - A @ x_orig) / np.linalg.norm(b_orig)
        assert true < 1e-7, true

    def test_dist_from_scipy_anisotropic(self):
        """Second non-stencil-path operator: rotated anisotropic
        diffusion fed through the general CSR ingestion (no
        dist_stencil_grid), solved on the 8-device mesh."""
        from pyamg_tpu.parallel.dist_setup import (dist_from_scipy,
                                                   distributed_sa_setup)
        from pyamg_tpu.parallel.partition import make_row_mesh
        from pyamg_tpu.gallery import stencil_grid, diffusion_stencil_2d

        st = np.asarray(diffusion_stencil_2d(epsilon=1e-2,
                                             theta=np.pi / 6, type="FE"))
        A = stencil_grid(st, (48, 48), format="csr")
        n = A.shape[0]
        mesh = make_row_mesh(8)
        cols, vals, ok, n_loc, perm = dist_from_scipy(
            A, mesh, dtype=jnp.float64, rcm=False)
        hier = distributed_sa_setup(cols, vals, ok, n_loc, mesh,
                                    coarsen_until=100)
        b = np.zeros(cols.shape[0])
        rng = np.random.default_rng(6)
        b[:n] = rng.standard_normal(n)
        x, relres, it = hier.solve_cg(jnp.asarray(b), tol=1e-8,
                                      maxiter=80)
        assert relres < 1e-8, (relres, it)
        true = np.linalg.norm(b[:n] - A @ np.asarray(x)[:n]) \
            / np.linalg.norm(b[:n])
        assert true < 1e-7, true

    def test_dist_vs_host_convergence_quality(self):
        """Cross-shard aggregation vs the single-host hierarchy on the
        same operator with the same smoothing (damped-Jacobi nu=2, K=1
        candidate): iteration count within 1.4x, INCLUDING at depth
        (96^2 builds 3 sharded levels — where the round-4 shard-local
        aggregation degraded).

        Measured on 2D Poisson: 11 vs 9 host iters @ 40^2 (1.22x),
        12 vs 9 @ 96^2/3 levels (1.33x), 13 vs 10 @ 192^2 (1.3x) —
        flat with depth since aggregates cross shard boundaries (Luby
        MIS-2 + label propagation over the ghost margins) and identity
        pad rows stay unaggregated.  Pinned so regressions in the
        distributed setup are caught relative to the host hierarchy, not
        just against an absolute cap.
        """
        from pyamg_tpu.parallel.dist_setup import distributed_sa_setup
        from pyamg_tpu.gallery import poisson
        from pyamg_tpu.aggregation import smoothed_aggregation_solver

        for N, mc in [(40, 64), (96, 300)]:
            mesh, cols, vals, ok, n_loc = _poisson_sharded(N)
            hier = distributed_sa_setup(cols, vals, ok, n_loc, mesh,
                                        coarsen_until=mc)
            if N == 96:
                assert len(hier.levels) >= 3
            n = N * N
            b = np.random.default_rng(7).standard_normal(cols.shape[0])
            b[n:] = 0.0
            x, relres, it_dist = hier.solve_cg(jnp.asarray(b), tol=1e-8,
                                               maxiter=60)
            assert relres < 1e-8

            A = poisson((N, N))
            ml = smoothed_aggregation_solver(
                A, max_coarse=mc,
                presmoother=("jacobi", {"omega": 4.0 / 3.0,
                                        "iterations": 2}),
                postsmoother=("jacobi", {"omega": 4.0 / 3.0,
                                         "iterations": 2}))
            res = []
            ml.solve(b[:n], tol=1e-8, maxiter=60, accel="cg",
                     residuals=res)
            it_host = len(res) - 1
            assert it_dist <= 1.4 * it_host, (N, it_dist, it_host)


class TestDistClassical:
    def test_classical_pmis_direct_converges(self):
        """Distributed classical AMG (classical SOC -> global PMIS ->
        direct interpolation -> Galerkin): converges on 2D Poisson with
        iteration counts flat in depth (17 @ 40^2 / 2 sharded levels,
        18 @ 96^2 / 3) and no dropped entries."""
        from pyamg_tpu.parallel.dist_setup import \
            distributed_classical_setup
        for N, cu, cap in [(40, 64, 25), (96, 300, 25)]:
            mesh, cols, vals, ok, n_loc = _poisson_sharded(N)
            hier = distributed_classical_setup(cols, vals, ok, n_loc,
                                               mesh, coarsen_until=cu)
            assert sum(hier.diagnostics["dropped"]) == 0
            n = N * N
            b = np.random.default_rng(1).standard_normal(cols.shape[0])
            b[n:] = 0.0
            x, relres, it = hier.solve_cg(jnp.asarray(b), tol=1e-8,
                                          maxiter=60)
            assert relres < 1e-8, (N, relres, it)
            assert it <= cap, (N, it)
            L0 = hier.levels[0]
            S = _tosp(L0.cols, L0.vals, L0.ok, L0.n)[:n, :n]
            true = np.linalg.norm(b[:n] - S @ np.asarray(x)[:n]) \
                / np.linalg.norm(b)
            assert true < 1e-7

    def test_classical_r_equals_pt(self):
        """Classical hierarchy keeps R = P^T and C-point rows of P are
        identity columns (direct-interpolation invariant)."""
        from pyamg_tpu.parallel.dist_setup import \
            distributed_classical_setup
        mesh, cols, vals, ok, n_loc = _poisson_sharded(40)
        hier = distributed_classical_setup(cols, vals, ok, n_loc, mesh,
                                           coarsen_until=64)
        L0, L1 = hier.levels[0], hier.levels[1]
        n, nc, c_cap, gp = L0.n, L1.n, L1.n_loc, L0.gp
        P = _tosp(L0.p_cols, L0.p_vals, L0.p_ok, nc)
        rc = np.asarray(L0.r_cols)
        rv = np.asarray(L0.r_vals)
        rok = np.asarray(L0.r_ok)
        rows_g, cols_g, vals_g = [], [], []
        for d in range(8):
            blk = slice(d * c_cap, (d + 1) * c_cap)
            glob = rc[blk] + d * n_loc - gp
            m = rok[blk] & (glob >= 0) & (glob < n)
            ridx = np.repeat(np.arange(d * c_cap, (d + 1) * c_cap),
                             rc.shape[1]).reshape(c_cap, -1)
            rows_g.append(ridx[m])
            cols_g.append(glob[m])
            vals_g.append(rv[blk][m])
        R = sp.csr_matrix((np.concatenate(vals_g),
                           (np.concatenate(rows_g),
                            np.concatenate(cols_g))), shape=(nc, n))
        assert abs(R - P.T).max() == 0
        # every C point interpolates itself with weight exactly 1
        colsum = np.asarray(abs(P).sum(axis=0)).ravel()
        used = colsum != 0
        ones = (P.toarray() == 1.0).sum(axis=0)
        assert (ones[used] >= 1).all()


class TestScaleModel:
    def test_model_matches_built_hierarchy_shapes(self):
        """The 10^8 memory model (parallel/scale_model.py) replays
        distributed_sa_setup's static shape laws; pin it against the
        ACTUAL array shapes/bytes of a built hierarchy so the
        SCALE_MODEL.json projection stays honest."""
        from pyamg_tpu.parallel.dist_setup import (distributed_sa_setup,
                                                   _transfer_margin)
        from pyamg_tpu.parallel.scale_model import (LevelModel, _caps,
                                                    _SLOT)

        mesh, cols, vals, ok, n_loc = _poisson_sharded(
            192, dtype=jnp.float32)
        hier = distributed_sa_setup(cols, vals, ok, n_loc, mesh,
                                    coarsen_until=300)
        ndev = 8
        for i, L in enumerate(hier.levels[:-1]):
            Lc = hier.levels[i + 1]
            wp, wr, wac = _caps(L.cols.shape[1])
            m = LevelModel(n_loc=L.n_loc, W=L.cols.shape[1], wp=wp,
                           wr=wr, c_cap=Lc.n_loc, g=L.g,
                           gP=_transfer_margin(L.g, L.n_loc, ndev))
            # shape laws
            assert L.p_cols.shape == (ndev * L.n_loc, wp), i
            assert L.r_cols.shape == (ndev * Lc.n_loc, wr), i
            assert Lc.cols.shape[1] == wac, i
            assert L.gp == m.gP, i
            # steady-state bytes: model == sum of actual array sizes
            actual = (L.cols.nbytes + L.vals.nbytes + L.ok.nbytes +
                      L.Dinv.nbytes +
                      L.p_cols.nbytes + L.p_vals.nbytes + L.p_ok.nbytes +
                      (L.r_cols.nbytes + L.r_vals.nbytes +
                       L.r_ok.nbytes)) // ndev
            assert actual == m.operator_bytes(), (i, actual,
                                                  m.operator_bytes())


class TestDistChebyshev:
    def test_chebyshev_smoother_beats_jacobi(self):
        """smoother='chebyshev' (reference setup_chebyshev semantics on
        the sharded operator): converges at least as fast as the damped-
        Jacobi default and within 1.25x of the single-host hierarchy."""
        from pyamg_tpu.parallel.dist_setup import distributed_sa_setup
        mesh, cols, vals, ok, n_loc = _poisson_sharded(96)
        b = np.random.default_rng(0).standard_normal(cols.shape[0])
        b[96 * 96:] = 0.0
        its = {}
        for sm in ("jacobi", "chebyshev"):
            hier = distributed_sa_setup(cols, vals, ok, n_loc, mesh,
                                        coarsen_until=300, smoother=sm)
            x, relres, it = hier.solve_cg(jnp.asarray(b), tol=1e-8,
                                          maxiter=60)
            assert relres < 1e-8, (sm, relres)
            its[sm] = int(it)
        assert its["chebyshev"] <= its["jacobi"], its
        assert its["chebyshev"] <= 12, its


class TestDistFGMRES:
    def test_advection_classical_fgmres(self):
        """BASELINE config-5 shape at test scale: nonsymmetric
        advection-diffusion ingested from a host CSR, distributed
        classical AMG hierarchy, V-cycle-preconditioned FGMRES with
        psum Arnoldi dots — converges to 1e-8 within two restart
        cycles."""
        from pyamg_tpu.gallery import advection_2d
        from pyamg_tpu.parallel import (dist_from_scipy,
                                        distributed_classical_setup,
                                        make_row_mesh)
        from pyamg_tpu.sparse.matrix import to_scipy
        A, rhs = advection_2d((64, 64))
        As = to_scipy(A).tocsr()
        n = As.shape[0]
        mesh = make_row_mesh(8)
        cols, vals, ok, n_loc, perm = dist_from_scipy(
            As, mesh, dtype=jnp.float64, rcm=False)
        b = np.zeros(cols.shape[0])
        b[:n] = np.asarray(rhs)
        hier = distributed_classical_setup(cols, vals, ok, n_loc, mesh,
                                           coarsen_until=120)
        x, relres, it = hier.solve_fgmres(jnp.asarray(b), tol=1e-8,
                                          restart=20, max_outer=8)
        assert relres < 1e-8, (relres, it)
        assert it <= 60, it
        true = np.linalg.norm(b[:n] - As @ np.asarray(x)[:n]) \
            / np.linalg.norm(b[:n])
        assert true < 1e-7, true
