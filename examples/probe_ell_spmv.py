"""Probe ELL SpMV formulations on real TPU at ~10 Mnnz.

Variants:
  A. current: x[cols] 2-D gather + sum
  B. per-slot jnp.take columns
  C. pallas kernel with VMEM-staged x and per-slot gather (if supported)
"""
import time
import numpy as np
import jax
import jax.numpy as jnp

n = 2048 * 1024          # 2M rows
W = 5
rng = np.random.default_rng(0)
# banded-ish cols to mimic Poisson (but generic gather path)
base = np.arange(n, dtype=np.int64)
offs = np.array([-1448, -1, 0, 1, 1448])
cols = np.clip(base[:, None] + offs[None, :], 0, n - 1).astype(np.int32)
vals = rng.standard_normal((n, W)).astype(np.float32)
x = rng.standard_normal(n).astype(np.float32)

cols_d = jnp.asarray(cols)
vals_d = jnp.asarray(vals)
x_d = jnp.asarray(x)

nnz = n * W


def bench(fn, *args, iters=50):
    y = fn(*args)
    y.block_until_ready()
    t0 = time.perf_counter()
    for _ in range(iters):
        y = fn(*args)
    y.block_until_ready()
    dt = (time.perf_counter() - t0) / iters
    return dt, y


@jax.jit
def spmv_a(vals, cols, x):
    return jnp.sum(vals * x[cols], axis=1)


@jax.jit
def spmv_b(vals, cols, x):
    acc = vals[:, 0] * jnp.take(x, cols[:, 0])
    for k in range(1, W):
        acc = acc + vals[:, k] * jnp.take(x, cols[:, k])
    return acc


ta, ya = bench(spmv_a, vals_d, cols_d, x_d)
tb, yb = bench(spmv_b, vals_d, cols_d, x_d)
print(f"A 2d-gather : {ta*1e3:.3f} ms  {nnz/ta/1e9:.2f} Gnnz/s  {nnz*12/ta/1e9:.1f} GB/s")
print(f"B take/slot : {tb*1e3:.3f} ms  {nnz/tb/1e9:.2f} Gnnz/s  {nnz*12/tb/1e9:.1f} GB/s")
print("allclose", np.allclose(ya, yb, atol=1e-4))

# C: pallas gather probe
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 2048  # rows per step


def kernel(cols_ref, vals_ref, x_ref, o_ref):
    xt = x_ref[0, :]          # full x in VMEM (n,) as (1, n)
    acc = jnp.zeros((TILE,), jnp.float32)
    for k in range(W):
        c = cols_ref[:, k]
        acc = acc + vals_ref[:, k] * jnp.take(xt, c, axis=0)
    o_ref[:] = acc


try:
    call = pl.pallas_call(
        kernel,
        grid=(n // TILE,),
        in_specs=[
            pl.BlockSpec((TILE, W), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE, W), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TILE,), lambda i: (i,), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n,), jnp.float32),
    )
    xs = x_d[None, :8 * 1024 * 256]  # cap VMEM: 8M? no, full x is 8MB
    tc, yc = bench(jax.jit(lambda c, v, x: call(c, v, x[None, :])),
                   cols_d, vals_d, x_d)
    print(f"C pallas    : {tc*1e3:.3f} ms  {nnz/tc/1e9:.2f} Gnnz/s  {nnz*12/tc/1e9:.1f} GB/s")
    print("allclose", np.allclose(ya, yc, atol=1e-4))
except Exception as e:
    print("pallas gather unsupported:", type(e).__name__, str(e)[:500])
