import numpy as np, jax, jax.numpy as jnp
from pyamg_tpu.gallery import stencil_grid, diffusion_stencil_2d
from pyamg_tpu.aggregation import smoothed_aggregation_solver
from pyamg_tpu.sparse.matrix import to_scipy
from pyamg_tpu.ops.spmv import matvec
st = np.asarray(diffusion_stencil_2d(epsilon=1e-3, theta=np.pi/8, type="FE"))
A64 = stencil_grid(st, (512, 512))
ml = smoothed_aggregation_solver(A64.astype(jnp.float32), strength=("evolution", {}),
                                 aggregate=("grid", {}), max_coarse=20)
ml.compress_stencils()
ml.to_device(jax.devices()[0])
rng = np.random.default_rng(0)
for i,l in enumerate(ml.levels[:-1]):
    P, R = l.P, l.R
    Pe = getattr(l, 'P_ell', None); Re = getattr(l, 'R_ell', None)
    nf, nc = (P.shape if type(P).__name__!='PhaseStencil' else P.shape)
    xc = jnp.asarray(rng.standard_normal(nc).astype(np.float32))
    xf = jnp.asarray(rng.standard_normal(nf).astype(np.float32))
    if Pe is not None:
        Psc = to_scipy(Pe).astype(np.float64)
        gp = Psc @ np.asarray(xc, np.float64)
        yp = np.asarray(jax.jit(lambda v: matvec(P, v))(xc), np.float64)
        print(f"lvl{i} P err {np.linalg.norm(yp-gp)/np.linalg.norm(gp):.2e}", end=" ", flush=True)
    if Re is not None:
        Rsc = to_scipy(Re).astype(np.float64)
        gr = Rsc @ np.asarray(xf, np.float64)
        yr = np.asarray(jax.jit(lambda v: matvec(R, v))(xf), np.float64)
        print(f"R err {np.linalg.norm(yr-gr)/np.linalg.norm(gr):.2e}", flush=True)
    else:
        print("", flush=True)
# overall symmetry of M on TPU
M = ml.aspreconditioner()
u = jnp.asarray(rng.standard_normal(A64.shape[0]).astype(np.float32))
v = jnp.asarray(rng.standard_normal(A64.shape[0]).astype(np.float32))
Mu = M.matvec(u); Mv = M.matvec(v)
a = float(jnp.vdot(u,Mv)); bq = float(jnp.vdot(Mu,v))
print("M sym relerr:", abs(a-bq)/abs(a), flush=True)
for k in range(5):
    w = jnp.asarray(rng.standard_normal(A64.shape[0]).astype(np.float32))
    print("quad form:", float(jnp.vdot(w, M.matvec(w))), flush=True)
