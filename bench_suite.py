"""Multi-config benchmark suite: the BASELINE.json problem configs on the
real TPU chip.  bench.py stays the single-headline driver entry; this
script records the broader matrix (one JSON line per config) to stdout and
benchmarks/RESULTS.json.

Configs (BASELINE.json "configs"):
  1. 2-D Poisson 500x500 via ruge_stuben_solver to 1e-10
  2. 3-D Poisson 64^3 via SA-preconditioned CG
  3. Rotated anisotropic diffusion (eps=1e-3) — strength/semicoarsening
  4. 2-D linear elasticity (BSR) with rigid-body-mode candidates
  5. Nonsymmetric advection — AMG(AIR)-preconditioned GMRES
     (multi-host 10^8-unknown variant needs N>=2 hosts; the sharded
      solve path is validated on the virtual mesh in tests/test_halo.py)
"""

import json
import os
import time

import numpy as np
import jax
# persistent compile cache: axon remote compiles are expensive (20-100 s
# per fused kernel); warm re-runs of the bench must not pay them again
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
import jax.numpy as jnp


def _solve_refined_time(ml, A64_scipy, b, tol=1e-10, accel="cg", **kw):
    """(warm seconds, true relres, outer iters) for ml.solve_refined."""
    ml.solve_refined(b, A_fine=A64_scipy, tol=tol, accel=accel, **kw)  # warm
    t0 = time.perf_counter()
    res = []
    x = ml.solve_refined(b, A_fine=A64_scipy, tol=tol, accel=accel,
                         residuals=res, **kw)
    dt = time.perf_counter() - t0
    true = np.linalg.norm(b - A64_scipy @ np.asarray(x, np.float64)) \
        / np.linalg.norm(b)
    return dt, float(true), len(res) - 1


def _brk(ml):
    """Per-phase setup breakdown (seconds) recorded by the constructors."""
    return {k: round(v, 3) for k, v in ml.setup_timings().items()}


def bench_rs_poisson_500():
    from pyamg_tpu.gallery import poisson
    from pyamg_tpu.classical import ruge_stuben_solver
    from pyamg_tpu.sparse.matrix import to_scipy
    A64 = poisson((500, 500))
    S = to_scipy(A64)
    t0 = time.perf_counter()
    ml = ruge_stuben_solver(A64.astype(jnp.float32))
    setup = time.perf_counter() - t0
    ml.compress_stencils()
    ml.to_device(jax.devices()[0])
    b = np.random.default_rng(0).standard_normal(A64.shape[0])
    dt, true, it = _solve_refined_time(ml, S, b)
    return {"config": "rs_poisson_500x500", "solve_s": dt, "setup_s": setup, "setup_breakdown": _brk(ml),
            "true_rel_residual": true, "outer_iters": it,
            "operator_complexity": float(ml.operator_complexity())}


def bench_sa_poisson_3d_64():
    from pyamg_tpu.gallery import poisson
    from pyamg_tpu.aggregation import smoothed_aggregation_solver
    from pyamg_tpu.sparse.matrix import to_scipy
    A64 = poisson((64, 64, 64))
    S = to_scipy(A64)
    t0 = time.perf_counter()
    ml = smoothed_aggregation_solver(A64.astype(jnp.float32), max_coarse=50)
    setup = time.perf_counter() - t0
    ml.compress_stencils()
    ml.to_device(jax.devices()[0])
    b = np.random.default_rng(0).standard_normal(A64.shape[0])
    dt, true, it = _solve_refined_time(ml, S, b)
    return {"config": "sa_poisson_64cubed", "solve_s": dt, "setup_s": setup, "setup_breakdown": _brk(ml),
            "true_rel_residual": true, "outer_iters": it,
            "operator_complexity": float(ml.operator_complexity())}


def bench_anisotropic_512():
    from pyamg_tpu.gallery import stencil_grid, diffusion_stencil_2d
    from pyamg_tpu.aggregation import smoothed_aggregation_solver
    from pyamg_tpu.sparse.matrix import to_scipy
    st = np.asarray(diffusion_stencil_2d(epsilon=1e-3, theta=np.pi / 8,
                                         type="FE"))
    A64 = stencil_grid(st, (512, 512))
    S = to_scipy(A64)
    # grid (box) aggregation keeps every level grid-tagged, so
    # compress_stencils yields an all-DIA/PhaseStencil gather-free cycle;
    # measured quality matches standard aggregation on this problem
    # (V factor ~0.84 vs 0.79) at 1.12 operator complexity vs 1.37.
    # Two runs: the first faults ~1 GB of fresh heap at this host's
    # ~400 MB/s page-fault rate; the warm run is the algorithm's cost.
    t0 = time.perf_counter()
    ml = smoothed_aggregation_solver(A64.astype(jnp.float32),
                                     strength=("evolution", {}),
                                     aggregate=("grid", {}),
                                     max_coarse=20)
    setup_cold = time.perf_counter() - t0
    t0 = time.perf_counter()
    ml = smoothed_aggregation_solver(A64.astype(jnp.float32),
                                     strength=("evolution", {}),
                                     aggregate=("grid", {}),
                                     max_coarse=20)
    setup = time.perf_counter() - t0
    ml.compress_stencils()
    ml.to_device(jax.devices()[0])
    b = np.random.default_rng(0).standard_normal(A64.shape[0])
    dt, true, it = _solve_refined_time(ml, S, b, inner_maxiter=60,
                                       max_outer=20)
    return {"config": "anisotropic_rotated_eps1e-3_512", "solve_s": dt,
            "setup_s": setup, "setup_cold_s": setup_cold,
            "setup_breakdown": _brk(ml), "true_rel_residual": true,
            "outer_iters": it,
            "operator_complexity": float(ml.operator_complexity())}


def bench_elasticity_100():
    from pyamg_tpu.gallery import linear_elasticity
    from pyamg_tpu.aggregation import smoothed_aggregation_solver
    from pyamg_tpu.sparse.matrix import to_scipy
    A64, B = linear_elasticity((100, 100))
    S = to_scipy(A64).tocsr()
    t0 = time.perf_counter()
    ml = smoothed_aggregation_solver(A64.astype(jnp.float32),
                                     B=np.asarray(B), max_coarse=50)
    setup = time.perf_counter() - t0
    ml.compress_stencils()
    ml.to_device(jax.devices()[0])
    b = np.random.default_rng(0).standard_normal(A64.shape[0])
    dt, true, it = _solve_refined_time(ml, S, b, inner_maxiter=60,
                                       max_outer=20)
    return {"config": "elasticity_bsr_rbm_100x100", "solve_s": dt,
            "setup_s": setup, "setup_breakdown": _brk(ml), "true_rel_residual": true, "outer_iters": it,
            "operator_complexity": float(ml.operator_complexity())}


def bench_advection_gmres():
    from pyamg_tpu.gallery import advection_2d
    from pyamg_tpu.classical import air_solver
    from pyamg_tpu.sparse.matrix import to_scipy
    A64, rhs = advection_2d((256, 256))
    S = to_scipy(A64)
    t0 = time.perf_counter()
    # PMIS coarsening + per-level operator filtering keep the lAIR
    # operator complexity bounded (1.96 vs 3.39 with the RS default,
    # unchanged outer-iteration count; reference filtering knob:
    # /root/reference/pyamg/classical/air.py:100-133)
    ml = air_solver(A64.astype(jnp.float32), CF="PMIS",
                    filter_operator=(False, 0.1))
    setup = time.perf_counter() - t0
    ml.compress_stencils()
    ml.to_device(jax.devices()[0])
    b = np.asarray(rhs, np.float64)
    dt, true, it = _solve_refined_time(ml, S, b, accel="gmres",
                                       inner_maxiter=40, max_outer=20)
    return {"config": "advection_air_gmres_256", "solve_s": dt,
            "setup_s": setup, "setup_breakdown": _brk(ml), "true_rel_residual": true, "outer_iters": it,
            "operator_complexity": float(ml.operator_complexity())}


def main():
    # process warm-up (untimed): first-touch costs — imports, native-lib
    # load, XLA backend init, compile-cache reads — otherwise land on the
    # first config's setup_s (measured as tens of seconds of noise)
    from pyamg_tpu.gallery import poisson
    from pyamg_tpu.classical import ruge_stuben_solver
    from pyamg_tpu.aggregation import smoothed_aggregation_solver
    Aw = poisson((40, 40))
    ruge_stuben_solver(Aw.astype(jnp.float32))
    smoothed_aggregation_solver(Aw.astype(jnp.float32), max_coarse=10)

    results = []
    for fn in (bench_rs_poisson_500, bench_sa_poisson_3d_64,
               bench_anisotropic_512, bench_elasticity_100,
               bench_advection_gmres):
        try:
            r = fn()
        except Exception as e:  # keep the suite robust; record the failure
            r = {"config": fn.__name__, "error": f"{type(e).__name__}: {e}"}
        results.append(r)
        print(json.dumps(r), flush=True)
    os.makedirs("benchmarks", exist_ok=True)
    with open("benchmarks/RESULTS.json", "w") as f:
        json.dump({"device": str(jax.devices()[0]), "results": results}, f,
                  indent=1)


if __name__ == "__main__":
    main()
