"""Experiment: ELL (gather) vs DIA (shifted-slice) SpMV on the real TPU.

Numerically safe loop (normalize each iteration) and linear-scaling check.
"""
import time
import numpy as np
import jax
import jax.numpy as jnp

from pyamg_tpu.gallery import poisson
from pyamg_tpu.sparse.matrix import dia_from_ell, to_scipy
from pyamg_tpu.ops.spmv import spmv, dia_spmv

N = 500
A = poisson((N, N)).astype(jnp.float32)
n = A.shape[0]
dev = jax.devices()[0]
print("device:", dev, jax.devices())
A = jax.device_put(A, dev)
x = jax.device_put(jnp.ones((n,), jnp.float32), dev)

def bench(f, A_, x_, K):
    def loop(A_, x_):
        def body(i, y):
            y = f(A_, y)
            return y / jnp.max(jnp.abs(y))      # keep finite
        return jax.lax.fori_loop(0, K, body, x_)
    g = jax.jit(loop)
    y = jax.block_until_ready(g(A_, x_))
    t0 = time.perf_counter()
    y = jax.block_until_ready(g(A_, x_))
    return (time.perf_counter() - t0) / K, y

# correctness single matvec
y_ell = jax.block_until_ready(jax.jit(spmv)(A, x))
D = dia_from_ell(A)
y_dia = jax.block_until_ready(jax.jit(dia_spmv)(D, x))
As = to_scipy(A)
y_ref = As @ np.ones(n, np.float32)
print("ell correct:", np.allclose(np.asarray(y_ell), y_ref, atol=1e-4))
print("dia correct:", np.allclose(np.asarray(y_dia), y_ref, atol=1e-4))

for K in (25, 100):
    t_e, _ = bench(spmv, A, x, K)
    t_d, _ = bench(dia_spmv, D, x, K)
    print(f"K={K:4d}  ell {t_e*1e6:8.1f} us ({A.nnz/t_e/1e9:7.2f} Gnnz/s)   "
          f"dia {t_d*1e6:8.1f} us ({A.nnz/t_d/1e9:7.2f} Gnnz/s)")
