import numpy as np, jax.numpy as jnp, time, cProfile, pstats, io
from pyamg_tpu.gallery import poisson
from pyamg_tpu.classical import ruge_stuben_solver
A64 = poisson((500, 500))
A = A64.astype(jnp.float32)
t0 = time.time()
pr = cProfile.Profile()
pr.enable()
ml = ruge_stuben_solver(A)
pr.disable()
print("RS setup", time.time() - t0, flush=True)
s = io.StringIO()
ps = pstats.Stats(pr, stream=s).sort_stats("cumulative")
ps.print_stats(30)
print(s.getvalue()[:4000])
