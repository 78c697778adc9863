import numpy as np, jax, jax.numpy as jnp, time
from pyamg_tpu.gallery import stencil_grid, diffusion_stencil_2d
from pyamg_tpu.aggregation import smoothed_aggregation_solver
from pyamg_tpu.sparse.matrix import to_scipy, ELL, DIA, BELL
st = np.asarray(diffusion_stencil_2d(epsilon=1e-3, theta=np.pi/8, type="FE"))
A64 = stencil_grid(st, (512, 512))
t0=time.time()
ml = smoothed_aggregation_solver(A64.astype(jnp.float32), strength=("evolution", {}), max_coarse=20)
print("setup", time.time()-t0, flush=True)
ml.compress_stencils()
ml.to_device(jax.devices()[0])
for i,l in enumerate(ml.levels):
    P = getattr(l,'P',None)
    print(i, type(l.A).__name__, l.A.shape, getattr(l.A,'width',getattr(l.A,'data',np.zeros((0,0))).shape[0] if hasattr(l.A,'data') else '?'),
          'P:', type(P).__name__ if P is not None else '-', getattr(P,'width','') if P is not None else '', flush=True)
b = np.random.default_rng(0).standard_normal(A64.shape[0]).astype(np.float32)
bj = jnp.asarray(b)
M = ml.aspreconditioner()
mv = jax.jit(M.matvec)
y = mv(bj); y.block_until_ready()
t0=time.time()
for _ in range(10): y = mv(bj)
y.block_until_ready()
print("vcycle warm ms", (time.time()-t0)/10*1e3, flush=True)
# one inner solve timing
x = ml.solve(bj, tol=1e-5, maxiter=60, accel='cg')
t0=time.time()
res=[]
x = ml.solve(bj, tol=1e-5, maxiter=60, accel='cg', residuals=res)
print("inner cg warm s", time.time()-t0, "iters", len(res)-1, flush=True)
