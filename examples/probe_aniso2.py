import numpy as np, jax, jax.numpy as jnp, time
from pyamg_tpu.gallery import stencil_grid, diffusion_stencil_2d
from pyamg_tpu.aggregation import smoothed_aggregation_solver
from pyamg_tpu.ops.spmv import matvec
st = np.asarray(diffusion_stencil_2d(epsilon=1e-3, theta=np.pi/8, type="FE"))
A64 = stencil_grid(st, (512, 512))
ml = smoothed_aggregation_solver(A64.astype(jnp.float32), strength=("evolution", {}), max_coarse=20)
ml.compress_stencils()
ml.to_device(jax.devices()[0])
def timeit(f, *a):
    g = jax.jit(f)
    y = g(*a); jax.block_until_ready(y)
    t0=time.time()
    for _ in range(20): y = g(*a)
    jax.block_until_ready(y)
    return (time.time()-t0)/20*1e3
for i,l in enumerate(ml.levels):
    n = l.A.shape[0]
    x = jnp.ones((n,), jnp.float32)
    tA = timeit(lambda v: matvec(l.A, v), x)
    out = f"lvl{i} A {type(l.A).__name__} n={n} spmv={tA:.3f}ms"
    if getattr(l,'P',None) is not None:
        nc = l.P.shape[1]
        xc = jnp.ones((nc,), jnp.float32)
        tP = timeit(lambda v: matvec(l.P, v), xc)
        tR = timeit(lambda v: matvec(l.R, v), x)
        out += f" P={tP:.3f}ms R={tR:.3f}ms"
        # smoother application
        from pyamg_tpu.relaxation.smoothing import apply_smoother
        k,s,p = l.pre
        tS = timeit(lambda v: apply_smoother(k,s,p,l.A,v,v), x)
        out += f" pre[{k}]={tS:.3f}ms"
    print(out, flush=True)
