"""Round-4 profiling: where does the 3 ms V-cycle go, and what does the
axon tunnel cost for transfers?  All timed loops run inside one jit."""

import time
import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
import jax.numpy as jnp


def timeit(fn, *args, reps=50):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps


def loop_time(body, x0, K=200):
    @jax.jit
    def run(x):
        return jax.lax.fori_loop(0, K, lambda i, v: body(v), x)
    jax.block_until_ready(run(x0))
    t0 = time.perf_counter()
    jax.block_until_ready(run(x0))
    return (time.perf_counter() - t0) / K


def main():
    dev = jax.devices()[0]
    print("device:", dev)

    # ---- transfer bandwidth over the tunnel
    h = np.random.rand(1 << 20).astype(np.float32)     # 4 MB
    jax.block_until_ready(jax.device_put(h, dev))
    t0 = time.perf_counter()
    d = jax.device_put(h, dev)
    jax.block_until_ready(d)
    up = time.perf_counter() - t0
    t0 = time.perf_counter()
    _ = np.asarray(d)
    down = time.perf_counter() - t0
    print(f"h2d 4MB: {up*1e3:.1f} ms ({4/up:.0f} MB/s);  "
          f"d2h 4MB: {down*1e3:.1f} ms ({4/down:.0f} MB/s)")

    # tiny dispatch floor
    f = jax.jit(lambda x: x + 1.0)
    s = jax.device_put(jnp.float32(1.0), dev)
    print(f"dispatch floor: {timeit(f, s, reps=20)*1e3:.2f} ms")

    # ---- build bench hierarchy
    from pyamg_tpu.gallery import poisson
    from pyamg_tpu.aggregation import smoothed_aggregation_solver
    from pyamg_tpu.ops.spmv import matvec
    from pyamg_tpu.relaxation.smoothing import apply_smoother

    A64 = poisson((500, 500))
    t0 = time.perf_counter()
    ml = smoothed_aggregation_solver(A64.astype(jnp.float32),
                                     aggregate=("grid", {}), max_coarse=10)
    print(f"setup: {time.perf_counter()-t0:.2f} s")
    ml.compress_stencils()
    ml.to_device(dev)
    for i, l in enumerate(ml.levels):
        print(f"  level {i}: n={l.A.shape[0]} type={type(l.A).__name__} "
              f"pre={l.pre[0]}/{l.pre[1]}")

    n = ml.levels[0].A.shape[0]
    rng = np.random.default_rng(0)
    b = jax.device_put(jnp.asarray(rng.standard_normal(n), jnp.float32), dev)

    # ---- full V-cycle
    cyc = ml._get_cycle("V")
    dyn = ml._dyn()
    t = loop_time(lambda x: cyc(dyn, x, b), jnp.zeros_like(b), K=100)
    print(f"V-cycle: {t*1e3:.3f} ms")

    # ---- level-0 pieces
    A0 = ml.levels[0].A
    l0 = ml.levels[0]
    t = loop_time(lambda x: matvec(A0, x) * 0.999, b, K=500)
    print(f"L0 DIA spmv: {t*1e3:.3f} ms")
    pk, ps, pp = l0.pre
    t = loop_time(lambda x: apply_smoother(pk, ps, pp, A0, x, b),
                  jnp.zeros_like(b), K=100)
    print(f"L0 pre-smoother ({pk} {ps}): {t*1e3:.3f} ms")
    # restrict+prolong
    P0, R0 = l0.P, l0.R
    nc = P0.shape[1]
    bc = jax.device_put(jnp.asarray(rng.standard_normal(nc), jnp.float32),
                        dev)
    t = loop_time(lambda v: matvec(R0, matvec(P0, v)) * 0.999, bc, K=500)
    print(f"L0 P+R pair: {t*1e3:.3f} ms")

    # ---- level-1 spmv + smoother
    A1 = ml.levels[1].A
    l1 = ml.levels[1]
    x1 = jax.device_put(
        jnp.asarray(rng.standard_normal(A1.shape[0]), jnp.float32), dev)
    t = loop_time(lambda x: matvec(A1, x) * 0.999, x1, K=500)
    print(f"L1 spmv (n={A1.shape[0]}, {type(A1).__name__}): {t*1e3:.3f} ms")
    pk, ps, pp = l1.pre
    t = loop_time(lambda x: apply_smoother(pk, ps, pp, A1, x, x1),
                  jnp.zeros_like(x1), K=100)
    print(f"L1 pre-smoother: {t*1e3:.3f} ms")

    # ---- tail-only cycle (levels 2..end)
    from pyamg_tpu.multilevel import MultilevelSolver
    sub = MultilevelSolver.__new__(MultilevelSolver)
    sub.levels = ml.levels[2:]
    sub.coarse_solver = ml.coarse_solver
    sub.symmetric_smoothing = True
    sub._cycle_cache = {}
    sub.to_device(dev)
    cyc2 = sub._get_cycle("V")
    dyn2 = sub._dyn()
    n2 = sub.levels[0].A.shape[0]
    b2 = jax.device_put(jnp.asarray(rng.standard_normal(n2), jnp.float32),
                        dev)
    t = loop_time(lambda x: cyc2(dyn2, x, b2), jnp.zeros_like(b2), K=100)
    print(f"tail cycle (levels 2+, n={n2}): {t*1e3:.3f} ms")

    # ---- dense matvec at n2 (what a collapsed tail would cost)
    M = jax.device_put(
        jnp.asarray(rng.standard_normal((n2, n2)), jnp.float32), dev)
    t = loop_time(lambda v: M @ v * 0.999, b2, K=500)
    print(f"dense {n2}x{n2} matvec: {t*1e3:.3f} ms")

    # ---- one CG iteration cost (cycle + spmv + dots)
    from pyamg_tpu.krylov.methods import cg_loop
    @jax.jit
    def cg_run(dyn, b):
        A0 = dyn[0][0][0]
        mv = lambda v: matvec(A0, v)
        Mv = lambda r: cyc(dyn, jnp.zeros_like(r), r)
        return cg_loop(mv, Mv, jnp.zeros_like(b), b, 1e-5, "rr", 30)
    x, info, resbuf, nit = cg_run(dyn, b)
    jax.block_until_ready(x)
    t0 = time.perf_counter()
    x, info, resbuf, nit = cg_run(dyn, b)
    jax.block_until_ready(x)
    t = time.perf_counter() - t0
    print(f"cg_loop to 1e-5: {t*1e3:.1f} ms, iters={int(nit)-1}, "
          f"info={int(info)}")


if __name__ == "__main__":
    main()
