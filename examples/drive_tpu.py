"""Drive the real TPU end-to-end.

Production flow: setup (latency-bound graph algorithms) on host CPU,
then `ml.to_device(tpu)` and run the jitted solve phase on the chip.
"""
import time
import jax
jax.config.update("jax_enable_x64", True)
import numpy as np
import jax
import jax.numpy as jnp

t0 = time.time()
tpu = jax.devices()[0]
cpu = jax.local_devices(backend="cpu")[0]
print("tpu:", tpu, "| cpu:", cpu, flush=True)

from pyamg_tpu.gallery import poisson
from pyamg_tpu import smoothed_aggregation_solver
from pyamg_tpu.classical import ruge_stuben_solver
from pyamg_tpu.sparse import to_scipy

with jax.default_device(cpu):
    A = poisson((100, 100))
    t1 = time.time()
    ml = smoothed_aggregation_solver(A, max_coarse=10)
    print("SA setup (cpu)", time.time() - t1, flush=True)
    t1 = time.time()
    ml2 = ruge_stuben_solver(A, max_coarse=20)
    print("RS setup (cpu)", time.time() - t1, flush=True)

ml.to_device(tpu)
ml2.to_device(tpu)
b = jax.device_put(jnp.ones((A.shape[0],), ml.levels[0].A.dtype), tpu)

res = []
t1 = time.time()
x = ml.solve(b, tol=1e-8, residuals=res, accel="cg")
t_first = time.time() - t1
res = []
t1 = time.time()
x = ml.solve(b, tol=1e-8, residuals=res, accel="cg")
print("SA-CG iters", len(res) - 1, "rel", res[-1] / res[0],
      "first_s", round(t_first, 2), "warm_s", round(time.time() - t1, 3),
      flush=True)
r = np.linalg.norm(np.ones(10000) - to_scipy(ml.levels[0].A) @ np.asarray(x))
print("true resid", r, flush=True)

res2 = []
t1 = time.time()
x2 = ml2.solve(b, tol=1e-8, maxiter=30, residuals=res2)
t_first = time.time() - t1
res2 = []
t1 = time.time()
x2 = ml2.solve(b, tol=1e-8, maxiter=30, residuals=res2)
print("RS iters", len(res2) - 1, "rel", res2[-1] / res2[0],
      "first_s", round(t_first, 2), "warm_s", round(time.time() - t1, 3),
      flush=True)
print("total", time.time() - t0, flush=True)
