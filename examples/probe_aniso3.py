import numpy as np, jax, jax.numpy as jnp, time, json
from pyamg_tpu.gallery import stencil_grid, diffusion_stencil_2d
from pyamg_tpu.aggregation import smoothed_aggregation_solver
from pyamg_tpu.sparse.matrix import to_scipy
st = np.asarray(diffusion_stencil_2d(epsilon=1e-3, theta=np.pi/8, type="FE"))
A64 = stencil_grid(st, (512, 512))
S = to_scipy(A64)
t0=time.time()
ml = smoothed_aggregation_solver(A64.astype(jnp.float32), strength=("evolution", {}),
                                 aggregate=("grid", {}), max_coarse=20)
print("setup", time.time()-t0, flush=True)
ml.compress_stencils()
ml.to_device(jax.devices()[0])
for i,l in enumerate(ml.levels):
    print(i, type(l.A).__name__, l.A.shape, 'P:', type(getattr(l,'P',None)).__name__, flush=True)
b = np.random.default_rng(0).standard_normal(A64.shape[0])
t0=time.time()
res=[]
x = ml.solve_refined(b, A_fine=S, tol=1e-10, accel="cg", inner_maxiter=60, max_outer=20, residuals=res)
print("cold solve", time.time()-t0, "outers", len(res)-1, flush=True)
print("hist", ["%.2e"%v for v in res], flush=True)
t0=time.time()
x = ml.solve_refined(b, A_fine=S, tol=1e-10, accel="cg", inner_maxiter=60, max_outer=20, residuals=res)
print("warm solve", time.time()-t0, flush=True)
print("relres", np.linalg.norm(b - S@np.asarray(x,np.float64))/np.linalg.norm(b), flush=True)
