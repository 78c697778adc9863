"""DIA SpMV throughput vs problem size on the real chip.

Measures Gnnz/s for 5-point Poisson at n = 250k..16M to separate
launch/latency overhead from streaming bandwidth; prints GB/s against the
v5e HBM roofline (~819 GB/s).  Timed loop runs inside one jit
(lax.fori_loop) per the axon tunnel rule.
"""

import time

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from pyamg_tpu.gallery import poisson
from pyamg_tpu.sparse.matrix import dia_from_ell
from pyamg_tpu.ops.spmv import dia_spmv


def bench(nx, iters=100, dtype=jnp.float32):
    A = poisson((nx, nx)).astype(dtype)
    D = dia_from_ell(A)
    D = jax.device_put(D, jax.devices()[0])
    n = A.shape[0]
    x = jax.device_put(jnp.ones((n,), dtype), jax.devices()[0])

    @jax.jit
    def loop(x):
        def body(_, x):
            y = dia_spmv(D, x)
            return y / jnp.max(jnp.abs(y))   # normalize: avoid overflow
        return lax.fori_loop(0, iters, body, x)

    loop(x).block_until_ready()              # compile
    t0 = time.perf_counter()
    loop(x).block_until_ready()
    dt = (time.perf_counter() - t0) / iters
    nnz = int(np.asarray(D.data != 0).sum()) if hasattr(D, "data") else 5 * n
    gnnz = nnz / dt / 1e9
    bytes_per = nnz * (4 if dtype == jnp.float32 else 8) * 2 + n * 8
    print(f"n={n:>9,}  {dt*1e6:9.1f} us/spmv  {gnnz:7.2f} Gnnz/s  "
          f"{bytes_per/dt/1e9:7.1f} GB/s", flush=True)


if __name__ == "__main__":
    print("device:", jax.devices()[0])
    for nx in (500, 1000, 2000, 4000):
        bench(nx)
