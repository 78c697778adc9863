"""SELL SpMV scaling benchmark: the north-star-size (10^7-unknown)
unstructured-operator SpMV on one chip (VERDICT r3 weak #6).

Separate from bench.py because the one-time costs (host plan build over
5x10^7 entries + first Mosaic compile) are minutes; the kernel itself is
the tiled neighbour-block SELL SpMV (``ops/sell_kernels._spmv_tiled_call``)
whose x streams through the BlockSpec pipeline two (TRow, 128) blocks per
output tile.  Writes benchmarks/SELL_SCALE.json.
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
    from pyamg_tpu.sparse.sell import sell_from_ell

    N = 3163                              # 10.004M unknowns
    t0 = time.perf_counter()
    A = poisson((N, N)).astype(jnp.float32)
    matrix_s = time.perf_counter() - t0
    # allocator warm-up: the first ~2 GB of heap growth page-faults at
    # ~400 MB/s on this host; a 1M-unknown plan faults it in so the 10M
    # measurement reflects the plan build itself, not the VM's fault rate
    sell_from_ell(poisson((1000, 1000)).astype(jnp.float32),
                  k_choices=(4,))
    t0 = time.perf_counter()
    S = sell_from_ell(A, k_choices=(4,))
    plan_cold_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    S = sell_from_ell(A, k_choices=(4,))
    plan_s = time.perf_counter() - t0
    n = S.shape[0]
    dev = jax.devices()[0]
    Sd = jax.tree_util.tree_map(
        lambda v: jax.device_put(v, dev) if hasattr(v, "shape") else v, S)
    x = jax.device_put(jnp.asarray(
        np.random.default_rng(0).standard_normal(n), jnp.float32), dev)

    K = 20

    @jax.jit
    def loop(S, x):
        y = jax.lax.fori_loop(
            0, K, lambda i, y: S.mv(y) / jnp.float32(1.0001), x)
        return jnp.sum(y * y)

    t0 = time.perf_counter()
    float(loop(Sd, x))
    compile_s = time.perf_counter() - t0
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(loop(Sd, x))
        ts.append(time.perf_counter() - t0)
    t = min(ts) / K
    bytes_ = Sd.vals.nbytes + Sd.delta.nbytes + 2 * n * 4
    out = {
        "metric": "sell_spmv_unstructured_10m",
        "n": n,
        "nnz": S.nnz,
        "passes": S.n_passes,
        "mv_ms": t * 1e3,
        "gnnz_per_s": S.nnz / t / 1e9,
        "gb_per_s": bytes_ / t / 1e9,
        "pct_hbm_peak": 100.0 * bytes_ / t / 819e9,
        "plan_build_s": plan_s,
        "plan_build_cold_s": plan_cold_s,
        "matrix_build_s": matrix_s,
        "first_compile_s": compile_s,
        "device": str(dev),
    }
    print(json.dumps(out))
    with open("benchmarks/SELL_SCALE.json", "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
