"""Benchmark: SA-AMG preconditioned CG on 2D Poisson (BASELINE.json config).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...extras}

Headline: wall seconds to solve 2D Poisson 500x500 (250k unknowns) to
TRUE relative residual 1e-10 on one TPU chip, warm (post-compile) —
mixed-precision flow, ONE jitted device program end-to-end: f32
grid-structured SA hierarchy (DIA operators + PhaseStencil transfers,
dense-inverse collapsed coarse tail), double-single (two-f32) outer
defect correction fully on device (TPU has no f64 ALU; ops/ds.py), final
x fetched inside the timed region (reference target: 1e-10, PyAMG paper
artifact docs/paper/example.res.txt).

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

    # SpGEMM throughput. Host path (scipy SMMP) is what setup uses for
    # host-resident matrices (the axon tunnel moves ~40 MB/s, so
    # round-tripping host data through the chip loses); the device path
    # (ops/spgemm._expand + rowops.dedup_rows, scatter-free two-sort) is
    # what traced/device-resident setup (distributed shard_map) uses, and
    # is timed in-jit on device-resident operands like SpMV.
    P = ml.levels[0].P
    R = ml.levels[0].R
    t0 = time.perf_counter()
    Ac = spgemm(R, spgemm(A64.astype(jnp.float32), P))
    t_rap = time.perf_counter() - t0
    spgemm_host_nnz_s = (nnz * P.width + Ac.nnz * R.width) / t_rap

    t0 = time.perf_counter()
    ml.compress_stencils()                     # DIA + PhaseStencil layouts
    ml.collapse_coarse(max_n=4096)             # dense-inverse cycle tail
    ml.enable_ds_refinement(A64)               # DS fine operator (f64 acc)
    ml.to_device(dev)
    prep_s = time.perf_counter() - t0

    rng = np.random.default_rng(2022)
    b = rng.standard_normal(n)
    b32 = jax.device_put(jnp.asarray(b, jnp.float32), dev)

    # --- device SpGEMM: in-jit loop on device-resident A@P (the traced /
    # distributed-setup production path)
    from pyamg_tpu.sparse.matrix import ELL, from_scipy
    from pyamg_tpu.ops.spgemm import _expand
    from pyamg_tpu.ops.rowops import dedup_rows
    A_ell = from_scipy(As.astype(np.float32))
    P_ell = from_scipy(to_scipy(P).tocsr().astype(np.float32))
    KG = 50
    n_pc = P_ell.shape[1]

    @jax.jit
    def spgemm_loop(ac, av, arn, bc, bv, brn):
        def body(i, carry):
            av2, acc = carry
            cc, vv, ok = _expand(ELL(ac, av2, arn, A_ell.shape),
                                 ELL(bc, bv, brn,
                                     (A_ell.shape[1], n_pc)))
            c, v, rn = dedup_rows(cc, vv, ok, n_pc)
            return av2 * jnp.float32(0.9999), acc + v[:, 0]
        _, acc = jax.lax.fori_loop(
            0, KG, body, (av, jnp.zeros(A_ell.shape[0], jnp.float32)))
        return acc

    gargs = [jax.device_put(jnp.asarray(x), dev) for x in
             (A_ell.cols, A_ell.vals, A_ell.row_nnz,
              P_ell.cols, P_ell.vals, P_ell.row_nnz)]
    jax.block_until_ready(np.asarray(spgemm_loop(*gargs)[:8]))
    t0 = time.perf_counter()
    _ = np.asarray(spgemm_loop(*gargs)[:8])
    t_spgemm_dev = (time.perf_counter() - t0) / KG
    spgemm_dev_mult_s = (n * A_ell.width * P_ell.width) / t_spgemm_dev

    # --- SpMV throughput: banded (DIA) f32 fine operator.  Two-point
    # measurement (t(K2)-t(K1))/(K2-K1) with a forced value fetch: the
    # axon runtime's block_until_ready returns early on some programs,
    # and each dispatch+fetch carries a ~30 ms fixed tunnel cost that
    # must not be attributed to the kernel.
    A_dev = ml.levels[0].A

    def timed_loop(mk_loop, K):
        f = jax.jit(mk_loop(K))
        float(f(A_dev, b32))              # warm (compile)
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            float(f(A_dev, b32))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    def mk_spmv(K):
        def run(A, x):
            y = jax.lax.fori_loop(
                0, K, lambda i, y: _mv(A, y) / jnp.float32(1.0001), x)
            return jnp.sum(y)
        return run

    K1, K2 = 200, 2000
    t_spmv = (timed_loop(mk_spmv, K2) - timed_loop(mk_spmv, K1)) / (K2 - K1)
    spmv_nnz_s = nnz / t_spmv

    # bytes-moved model for the banded fine SpMV: stored diagonals once,
    # x read once, y written once (XLA fuses shifted slices into one
    # streaming pass); v5e HBM peak 819 GB/s
    HBM_PEAK = 819e9

    def _bytes_of(M):
        tot = 0
        for name in ("vals", "data", "cols", "offsets"):
            arr = getattr(M, name, None)
            if arr is not None and hasattr(arr, "nbytes"):
                tot += arr.nbytes
        return tot

    spmv_bytes = _bytes_of(A_dev) + 2 * n * 4
    spmv_gb_s = spmv_bytes / t_spmv / 1e9
    spmv_pct_hbm = 100.0 * spmv_bytes / t_spmv / HBM_PEAK

    # --- V-cycle time (two-point measurement, forced fetch: see above)
    cyc = ml._get_cycle("V")
    dyn = ml._dyn()

    def vcycle_time(K):
        @jax.jit
        def vloop(dyn, x, b):
            y = jax.lax.fori_loop(0, K, lambda i, v: cyc(dyn, v, b), x)
            return jnp.sum(y)

        z = jnp.zeros_like(b32)
        float(vloop(dyn, z, b32))
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            float(vloop(dyn, z, b32))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    t_cycle = (vcycle_time(300) - vcycle_time(50)) / 250

    # V(1,1) bytes model: per level, 3 A-passes (pre-smooth, residual,
    # post-smooth) + one P and one R pass + ~8 vector passes
    vcycle_bytes = 0
    for lv in ml.levels:
        nl = lv.A.shape[0]
        vcycle_bytes += 3 * _bytes_of(lv.A) + 8 * nl * 4
        if getattr(lv, "P", None) is not None:
            vcycle_bytes += _bytes_of(lv.P) + _bytes_of(lv.R)
    op = ml.coarse_solver.params.get("op", None)
    if op is not None and hasattr(op, "nbytes"):
        vcycle_bytes += op.nbytes      # dense-inverse coarse matvec
    vcycle_gb_s = vcycle_bytes / t_cycle / 1e9
    vcycle_pct_hbm = 100.0 * vcycle_bytes / t_cycle / HBM_PEAK

    # --- headline: mixed-precision solve to true rel-res 1e-10 (warm).
    # ONE jitted program: double-single (two-f32) outer residuals + DS
    # accumulation of x (TPU has no f64 ALU), V-cycle-preconditioned f32
    # CG inner solves — zero host round-trips until the final fetch of x
    # (which IS included in the timed region, as are the tiny history
    # fetches).
    ml.solve_refined_device(b)                 # warm-up (compiles)
    ts_solve = []
    for _ in range(5):
        t0 = time.perf_counter()
        x = ml.solve_refined_device(b, tol=1e-10, inner_tol=1e-5,
                                    inner_maxiter=30, max_outer=10)
        ts_solve.append(time.perf_counter() - t0)
    t_solve = min(ts_solve)
    rel = float(np.linalg.norm(b - As @ x) / np.linalg.norm(b))
    # re-run (untimed) to fetch the iteration diagnostics
    res_out, it = [], {}
    ml.solve_refined_device(b, residuals=res_out, iterations_out=it)
    inner = it["inner"]

    # timing budget of the headline: dispatch+upload+compute with only a
    # scalar fetched (no 2 MB x download), vs the full timed solve.
    # outer_overhead_ms = headline time not spent inside V-cycles
    # (transfers, CG vector work, DS outer residuals).
    from pyamg_tpu.ops.ds import ds_from_f64
    run = ml._get_ds_refined_run("V", 1e-10, 1e-5, 30, 10)
    bhi, blo = ds_from_f64(np.asarray(b, np.float64).reshape(-1))
    bds_h = np.stack([bhi, blo])
    ds_arrays = {k: v for k, v in ml._ds_op.items() if hasattr(v, "shape")}
    dyn_s = ml._dyn()
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        _, _, k_dev, _ = run(dyn_s, ds_arrays, jnp.asarray(bds_h))
        int(k_dev)
        ts.append(time.perf_counter() - t0)
    t_nofetch = min(ts)

    # --- SELL SpMV throughput (the unstructured-operator fast path;
    # single Pallas kernel, windowed lane gathers)
    sell_nnz_s = 0.0
    try:
        from pyamg_tpu.sparse.sell import sell_from_ell
        S = sell_from_ell(A_ell)
        if S is not None:
            S = jax.tree_util.tree_map(
                lambda v: jax.device_put(v, dev) if hasattr(v, "shape")
                else v, S)

            def sell_time(K):
                @jax.jit
                def sell_loop(S, x):
                    y = jax.lax.fori_loop(
                        0, K, lambda i, y: S.mv(y) / jnp.float32(1.0001),
                        x)
                    return jnp.sum(y)

                float(sell_loop(S, b32))
                ts = []
                for _ in range(3):
                    t0 = time.perf_counter()
                    float(sell_loop(S, b32))
                    ts.append(time.perf_counter() - t0)
                return min(ts)

            t_sell = (sell_time(2000) - sell_time(200)) / 1800
            sell_nnz_s = nnz / t_sell
    except Exception:
        pass

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
        "spmv_gb_per_s": spmv_gb_s,
        "spmv_pct_hbm_peak": spmv_pct_hbm,
        "sell_spmv_gnnz_per_s": sell_nnz_s / 1e9,
        "spgemm_device_gnnz_per_s": spgemm_dev_mult_s / 1e9,
        "spgemm_host_gnnz_per_s": spgemm_host_nnz_s / 1e9,
        "scipy_spmv_gnnz_per_s": scipy_nnz_s / 1e9,
        "vcycle_ms": t_cycle * 1e3,
        "vcycle_gb_per_s": vcycle_gb_s,
        "vcycle_pct_hbm_peak": vcycle_pct_hbm,
        "outer_overhead_ms": t_solve * 1e3 - inner * t_cycle * 1e3,
        "solve_device_dispatch_ms": t_nofetch * 1e3,
        "x_fetch_ms": (t_solve - t_nofetch) * 1e3,
        "setup_s": setup_time,
        "prep_s": prep_s,
        "levels": levels,
        "levels_active": len(ml.levels),
        "operator_complexity": opc,
        "device": str(dev),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
