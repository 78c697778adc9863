import numpy as np, jax, jax.numpy as jnp, time
from pyamg_tpu.gallery import stencil_grid, diffusion_stencil_2d
from pyamg_tpu.aggregation import smoothed_aggregation_solver
from pyamg_tpu.sparse.matrix import to_scipy
st = np.asarray(diffusion_stencil_2d(epsilon=1e-3, theta=np.pi/8, type="FE"))
A64 = stencil_grid(st, (512, 512))
S = to_scipy(A64).astype(np.float64)
ml = smoothed_aggregation_solver(A64.astype(jnp.float32), strength=("evolution", {}),
                                 aggregate=("grid", {}), max_coarse=20)
ml.compress_stencils()
ml.to_device(jax.devices()[0])
b = np.random.default_rng(0).standard_normal(A64.shape[0])
# outer 1 by hand
r = b.copy()
res1=[]
e = ml.solve(jnp.asarray(r/np.linalg.norm(r), jnp.float32), tol=1e-5, maxiter=60, accel='cg', residuals=res1)
x = np.linalg.norm(r)*np.asarray(e, np.float64)
r2 = b - S@x
print('outer1: inner iters', len(res1)-1, 'inner hist', ['%.1e'%v for v in res1[:4]], '...', ['%.1e'%v for v in res1[-3:]], flush=True)
print('true rel after outer1', np.linalg.norm(r2)/np.linalg.norm(b), flush=True)
res2=[]
e2 = ml.solve(jnp.asarray(r2/np.linalg.norm(r2), jnp.float32), tol=1e-5, maxiter=60, accel='cg', residuals=res2)
print('outer2: inner iters', len(res2)-1, 'hist', ['%.1e'%v for v in res2], flush=True)
x2 = x + np.linalg.norm(r2)*np.asarray(e2, np.float64)
r3 = b - S@x2
print('true rel after outer2', np.linalg.norm(r3)/np.linalg.norm(b), flush=True)
