"""Benchmark: SA-AMG preconditioned CG on 2D Poisson (BASELINE.json config).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...extras}

Headline metric: time to solve 2D Poisson 500x500 to rel-res 1e-10 with
SA-AMG-CG on one chip.  Extras: SpMV and SpGEMM throughput (nnz/s), V-cycle
time, iteration count (PyAMG paper artifact: 21 standalone V-cycles /
~10 CG iters on this problem class), baseline = scipy CSR SpMV on this
host (the reference's compute substrate).

All timed loops run **inside one jit** (the axon tunnel costs ~10 ms per
eager dispatch; see .claude/skills/verify/SKILL.md).
"""

import json
import time

import numpy as np

import jax
import jax.numpy as jnp


def timed(f, *args, warmup=1, iters=5):
    for _ in range(warmup):
        jax.block_until_ready(f(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = jax.block_until_ready(f(*args))
    return (time.perf_counter() - t0) / iters, out


def main():
    # TPU path; fall back gracefully to CPU if no accelerator.
    try:
        dev = jax.devices()[0]
    except Exception:
        import os
        os.environ["JAX_PLATFORMS"] = "cpu"
        dev = jax.devices()[0]

    # f64 on TPU is emulated; use f64 where supported for the 1e-10 target,
    # else f32 storage with f64 accumulation disabled -> relax tol.
    try:
        jax.config.update("jax_enable_x64", True)
        _ = (jnp.zeros((8,), jnp.float64) + 1.0).block_until_ready()
        dtype = jnp.float64
        tol = 1e-10
    except Exception:
        dtype = jnp.float32
        tol = 1e-6

    from pyamg_tpu.gallery import poisson
    from pyamg_tpu.aggregation import smoothed_aggregation_solver
    from pyamg_tpu import ops
    from pyamg_tpu.sparse import to_scipy

    N = 500
    A = poisson((N, N))
    A = A.astype(dtype)
    n = A.shape[0]
    nnz = A.nnz
    rng = np.random.default_rng(2022)
    b = jnp.asarray(rng.standard_normal(n), dtype)

    # --- SpMV throughput (loop inside one jit) ---
    K = 50

    @jax.jit
    def spmv_loop(A, x):
        def body(i, x):
            return ops.spmv(A, x) * 0.999
        return jax.lax.fori_loop(0, K, body, x)

    t_spmv, _ = timed(spmv_loop, A, b, warmup=1, iters=3)
    spmv_nnz_s = nnz * K / t_spmv

    # --- SpGEMM throughput: Galerkin A @ P with SA tentative-smoothed P ---
    t_setup0 = time.perf_counter()
    ml = smoothed_aggregation_solver(A, max_coarse=10)
    setup_time = time.perf_counter() - t_setup0
    P = ml.levels[0].P
    R = ml.levels[0].R

    def rap(A, P, R):
        return ops.spgemm(R, ops.spgemm(A, P, width=ml.levels[0].P.width * 3),
                          width=ml.levels[1].A.width)

    t_rap0 = time.perf_counter()
    Ac = rap(A, P, R)
    jax.block_until_ready(Ac.vals)
    t_rap = time.perf_counter() - t_rap0
    # flops proxy: every (A nnz) x (P row width) multiply-add, twice
    spgemm_nnz_s = (nnz * P.width + Ac.nnz * R.width) / t_rap

    # --- V-cycle time ---
    cyc = ml._get_cycle("V")
    dyn = ml._dyn()

    @jax.jit
    def vcycle(dyn, x, b):
        return cyc(dyn, x, b)

    t_cycle, _ = timed(vcycle, dyn, jnp.zeros_like(b), b, warmup=1, iters=5)

    # --- full solve to tol with CG acceleration ---
    res = []
    t0 = time.perf_counter()
    x = ml.solve(b, tol=tol, maxiter=100, accel="cg", residuals=res)
    jax.block_until_ready(x)
    t_solve = time.perf_counter() - t0
    iters = len(res) - 1
    rel = res[-1] / res[0]

    # --- baseline: scipy CSR SpMV on this host (reference substrate) ---
    As = to_scipy(A)
    xs = np.asarray(b)
    for _ in range(2):
        ys = As @ xs
    t0 = time.perf_counter()
    reps = 20
    for _ in range(reps):
        ys = As @ xs
    t_scipy = (time.perf_counter() - t0) / reps
    scipy_nnz_s = nnz / t_scipy

    out = {
        "metric": "sa_amg_cg_solve_2d_poisson_500x500",
        "value": t_solve,
        "unit": "seconds_to_rel_1e-10" if tol <= 1e-10 else
                f"seconds_to_rel_{tol:g}",
        "vs_baseline": spmv_nnz_s / scipy_nnz_s,
        "iterations": iters,
        "rel_residual": rel,
        "spmv_gnnz_per_s": spmv_nnz_s / 1e9,
        "spgemm_gflop_proxy_per_s": spgemm_nnz_s / 1e9,
        "scipy_spmv_gnnz_per_s": scipy_nnz_s / 1e9,
        "vcycle_ms": t_cycle * 1e3,
        "setup_s": setup_time,
        "levels": len(ml.levels),
        "operator_complexity": ml.operator_complexity(),
        "dtype": str(dtype.__name__ if hasattr(dtype, "__name__")
                     else dtype),
        "device": str(dev),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
