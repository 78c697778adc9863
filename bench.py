"""Benchmark: SA-AMG preconditioned CG on 2D Poisson (BASELINE.json config).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...extras}

Headline metric: time to solve 2D Poisson 500x500 to rel-res 1e-10 with
SA-AMG-CG on one chip.  Extras: SpMV and SpGEMM throughput (nnz/s), V-cycle
time, iteration count (PyAMG paper artifact: 21 standalone V-cycles /
~10 CG iters on this problem class), baseline = scipy CSR SpMV on this
host (the reference's compute substrate).

Flow: setup runs on host CPU (latency-bound graph algorithms), then the
hierarchy ships to the accelerator via ``ml.to_device`` and all timed
loops run **inside one jit** (the axon tunnel costs ~10 ms per eager
dispatch; see .claude/skills/verify/SKILL.md).
"""

import json
import time

import numpy as np

import jax

jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp


def timed(f, *args, warmup=1, iters=5):
    for _ in range(warmup):
        jax.block_until_ready(f(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = jax.block_until_ready(f(*args))
    return (time.perf_counter() - t0) / iters, out


def main():
    dev = jax.devices()[0]
    try:
        cpu = jax.local_devices(backend="cpu")[0]
    except Exception:
        cpu = dev

    # f64 on TPU is emulated; probe it for the 1e-10 target.
    try:
        _ = jax.block_until_ready(
            jax.device_put(jnp.zeros((8,), jnp.float64), dev) + 1.0)
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
    with jax.default_device(cpu):
        A = poisson((N, N)).astype(dtype)
        n = A.shape[0]
        nnz = A.nnz
        t_setup0 = time.perf_counter()
        ml = smoothed_aggregation_solver(A, max_coarse=10)
        setup_time = time.perf_counter() - t_setup0
        # SpGEMM throughput measured on host (setup-phase op)
        P = ml.levels[0].P
        R = ml.levels[0].R
        t_rap0 = time.perf_counter()
        Ac = ops.spgemm(R, ops.spgemm(A, P))
        jax.block_until_ready(Ac.vals)
        t_rap = time.perf_counter() - t_rap0
        spgemm_nnz_s = (nnz * P.width + Ac.nnz * R.width) / t_rap

    levels = len(ml.levels)
    opc = ml.operator_complexity()
    ml.compress_stencils()       # banded fast path for stencil operators
    ml.to_device(dev)
    A_dev = ml.levels[0].A
    rng = np.random.default_rng(2022)
    b = jax.device_put(jnp.asarray(rng.standard_normal(n), dtype), dev)

    # --- SpMV throughput (loop inside one jit) ---
    K = 50

    from pyamg_tpu.ops.spmv import matvec as _mv

    @jax.jit
    def spmv_loop(A, x):
        def body(i, x):
            return _mv(A, x) * 0.999
        return jax.lax.fori_loop(0, K, body, x)

    t_spmv, _ = timed(spmv_loop, A_dev, b, warmup=1, iters=3)
    spmv_nnz_s = nnz * K / t_spmv

    # --- V-cycle time ---
    cyc = ml._get_cycle("V")
    dyn = ml._dyn()

    @jax.jit
    def vcycle(dyn, x, b):
        return cyc(dyn, x, b)

    t_cycle, _ = timed(vcycle, dyn, jnp.zeros_like(b), b, warmup=1,
                       iters=5)

    # --- full solve to tol with CG acceleration ---
    res = []
    ml.solve(b, tol=tol, maxiter=100, accel="cg", residuals=res)  # warm
    res = []
    t0 = time.perf_counter()
    x = ml.solve(b, tol=tol, maxiter=100, accel="cg", residuals=res)
    jax.block_until_ready(x)
    t_solve = time.perf_counter() - t0
    iters = len(res) - 1
    rel = res[-1] / res[0]

    # --- baseline: scipy CSR SpMV on this host (reference substrate) ---
    As = to_scipy(A)
    xs = np.asarray(rng.standard_normal(n))
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
        "levels": levels,
        "operator_complexity": opc,
        "dtype": str(np.dtype(dtype).name),
        "device": str(dev),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
