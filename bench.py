"""Benchmark: SA-AMG preconditioned CG on 2D Poisson (BASELINE.json config).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...extras}

Headline: wall seconds to solve 2D Poisson 500x500 (250k unknowns) to
TRUE relative residual 1e-10 on one TPU chip, warm (post-compile) —
mixed-precision flow: f32 grid-structured SA hierarchy on device
(DIA operators + PhaseStencil transfers, gather-free), f64 defect
correction on host (reference target: 1e-10, PyAMG paper artifact
docs/paper/example.res.txt).

Extras: SpMV throughput (nnz/s, DIA f32 on chip), V-cycle time, inner CG
iterations, setup time, operator complexity; baseline = scipy CSR SpMV
nnz/s on this host (the reference's compute substrate).

All timed loops run inside one jit (the axon tunnel costs ~10 ms per
eager dispatch; see .claude/skills/verify/SKILL.md).
"""

import json
import time

import numpy as np
import jax
# persistent compile cache: axon remote compiles are expensive (20-100 s
# per fused kernel); warm re-runs of the bench must not pay them again
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
import jax.numpy as jnp


def main():
    dev = jax.devices()[0]

    from pyamg_tpu.gallery import poisson
    from pyamg_tpu.aggregation import smoothed_aggregation_solver
    from pyamg_tpu.sparse.matrix import to_scipy
    from pyamg_tpu.ops.spmv import matvec as _mv
    from pyamg_tpu.ops import spgemm

    N = 500
    A64 = poisson((N, N))                      # f64, host-backed ELL
    n = A64.shape[0]
    nnz = A64.nnz
    As = to_scipy(A64)

    t0 = time.perf_counter()
    ml = smoothed_aggregation_solver(A64.astype(jnp.float32),
                                     aggregate=("grid", {}), max_coarse=10)
    setup_time = time.perf_counter() - t0
    levels = len(ml.levels)
    opc = float(ml.operator_complexity())

    # SpGEMM throughput (setup-phase op, host scipy path by design)
    P = ml.levels[0].P
    R = ml.levels[0].R
    t0 = time.perf_counter()
    Ac = spgemm(R, spgemm(A64.astype(jnp.float32), P))
    t_rap = time.perf_counter() - t0
    spgemm_nnz_s = (nnz * P.width + Ac.nnz * R.width) / t_rap

    ml.compress_stencils()                     # DIA + PhaseStencil layouts
    ml.to_device(dev)

    rng = np.random.default_rng(2022)
    b = rng.standard_normal(n)
    b32 = jax.device_put(jnp.asarray(b, jnp.float32), dev)

    # --- SpMV throughput: banded (DIA) f32 fine operator, loop in one jit
    A_dev = ml.levels[0].A
    K = 100

    @jax.jit
    def spmv_loop(A, x):
        def body(i, y):
            return _mv(A, y) / jnp.float32(1.0001)
        return jax.lax.fori_loop(0, K, body, x)

    jax.block_until_ready(spmv_loop(A_dev, b32))
    t0 = time.perf_counter()
    jax.block_until_ready(spmv_loop(A_dev, b32))
    t_spmv = (time.perf_counter() - t0) / K
    spmv_nnz_s = nnz / t_spmv

    # --- V-cycle time (one jit application)
    cyc = ml._get_cycle("V")
    dyn = ml._dyn()
    vcycle = jax.jit(lambda dyn, x, b: cyc(dyn, x, b))
    z = jnp.zeros_like(b32)
    jax.block_until_ready(vcycle(dyn, z, b32))
    t0 = time.perf_counter()
    for _ in range(10):
        out = vcycle(dyn, z, b32)
    jax.block_until_ready(out)
    t_cycle = (time.perf_counter() - t0) / 10

    # --- headline: mixed-precision solve to true rel-res 1e-10 (warm)
    inner_iters = []

    def counting_solve():
        res_out = []
        inner = 0
        x64 = np.zeros(n)
        normb = np.linalg.norm(b)
        for _ in range(10):
            r = b - As @ x64
            nr = np.linalg.norm(r)
            res_out.append(nr)
            if nr <= 1e-10 * normb:
                break
            res_in = []
            e = ml.solve(jnp.asarray(r / nr, jnp.float32), tol=1e-5,
                         maxiter=30, accel="cg", residuals=res_in)
            inner += len(res_in) - 1
            x64 = x64 + nr * np.asarray(e, np.float64)[:n]
        return x64, res_out, inner

    counting_solve()                           # warm-up (compiles)
    t0 = time.perf_counter()
    x, res_out, inner = counting_solve()
    t_solve = time.perf_counter() - t0
    rel = float(np.linalg.norm(b - As @ x) / np.linalg.norm(b))

    # --- baseline: scipy CSR SpMV on this host (reference substrate)
    xs = rng.standard_normal(n)
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
        "unit": "seconds_to_true_rel_1e-10_warm",
        "vs_baseline": spmv_nnz_s / scipy_nnz_s,
        "true_rel_residual": rel,
        "outer_iterations": len(res_out) - 1,
        "inner_cg_iterations": inner,
        "spmv_gnnz_per_s": spmv_nnz_s / 1e9,
        "spgemm_gnnz_proxy_per_s": spgemm_nnz_s / 1e9,
        "scipy_spmv_gnnz_per_s": scipy_nnz_s / 1e9,
        "vcycle_ms": t_cycle * 1e3,
        "setup_s": setup_time,
        "levels": levels,
        "operator_complexity": opc,
        "device": str(dev),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
