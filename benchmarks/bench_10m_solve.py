"""End-to-end 10M-unknown solve on ONE TPU chip: 2D Poisson 3163^2,
SA-AMG (grid aggregation) + mixed-precision defect correction to TRUE
relative residual 1e-10.

This is the reference's 1M-unknown paper artifact
(/root/reference/docs/paper/paper.md:150-165) scaled 10x and run through
the full production flow: host setup -> DIA/PhaseStencil compression ->
dense-inverse coarse tail -> double-single refinement on device.
Writes benchmarks/SOLVE_10M.json.
"""

import json
import time

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
import jax.numpy as jnp


def main():
    from pyamg_tpu.gallery import poisson
    from pyamg_tpu.aggregation import smoothed_aggregation_solver
    from pyamg_tpu.sparse.matrix import to_scipy

    dev = jax.devices()[0]
    N = 3163                               # 10.004M unknowns
    t0 = time.perf_counter()
    A64 = poisson((N, N))
    matrix_s = time.perf_counter() - t0
    n = A64.shape[0]

    t0 = time.perf_counter()
    ml = smoothed_aggregation_solver(A64.astype(jnp.float32),
                                     aggregate=("grid", {}),
                                     max_coarse=10)
    setup_s = time.perf_counter() - t0
    levels = len(ml.levels)
    opc = float(ml.operator_complexity())

    t0 = time.perf_counter()
    ml.compress_stencils()
    ml.collapse_coarse(max_n=4096)
    ml.enable_ds_refinement(A64)
    ml.to_device(dev)
    prep_s = time.perf_counter() - t0

    b = np.random.default_rng(2022).standard_normal(n)
    t0 = time.perf_counter()
    x = ml.solve_refined_device(b, tol=1e-10, inner_tol=1e-5,
                                inner_maxiter=40, max_outer=10)
    first_solve_s = time.perf_counter() - t0
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        x = ml.solve_refined_device(b, tol=1e-10, inner_tol=1e-5,
                                    inner_maxiter=40, max_outer=10)
        ts.append(time.perf_counter() - t0)
    solve_s = min(ts)
    res, it = [], {}
    ml.solve_refined_device(b, residuals=res, iterations_out=it,
                            inner_tol=1e-5, inner_maxiter=40,
                            max_outer=10)

    t0 = time.perf_counter()
    As = to_scipy(A64)
    rel = float(np.linalg.norm(b - As @ x) / np.linalg.norm(b))

    out = {
        "metric": "sa_amg_solve_2d_poisson_3163x3163_single_chip",
        "n": n,
        "value": solve_s,
        "unit": "seconds_to_true_rel_1e-10_warm",
        "true_rel_residual": rel,
        "outer_iterations": it.get("outer"),
        "inner_cg_iterations": it.get("inner"),
        "matrix_build_s": round(matrix_s, 2),
        "setup_s": round(setup_s, 2),
        "prep_s": round(prep_s, 2),
        "first_solve_s": round(first_solve_s, 2),
        "levels": levels,
        "levels_active": len(ml.levels),
        "operator_complexity": round(opc, 4),
        "device": str(dev),
        "reference_anchor": ("paper artifact is 1M unknowns, 21 V(1,1) "
                             "cycles to 1e-10 on CPU "
                             "(docs/paper/example.res.txt)"),
    }
    print(json.dumps(out))
    with open("benchmarks/SOLVE_10M.json", "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
