import numpy as np, jax, jax.numpy as jnp
from pyamg_tpu.gallery import stencil_grid, diffusion_stencil_2d
from pyamg_tpu.aggregation import smoothed_aggregation_solver
from pyamg_tpu.sparse.matrix import to_scipy
import pyamg_tpu.ops.pallas_kernels as pk
from pyamg_tpu.ops.spmv import dia_spmv
st = np.asarray(diffusion_stencil_2d(epsilon=1e-3, theta=np.pi/8, type="FE"))
A64 = stencil_grid(st, (512, 512))
ml = smoothed_aggregation_solver(A64.astype(jnp.float32), strength=("evolution", {}),
                                 aggregate=("grid", {}), max_coarse=20)
ml.compress_stencils()
ml.to_device(jax.devices()[0])
rng = np.random.default_rng(0)
for i,l in enumerate(ml.levels):
    if type(l.A).__name__ != 'DIA':
        continue
    n = l.A.shape[0]
    x = jnp.asarray(rng.standard_normal(n).astype(np.float32))
    from pyamg_tpu.sparse.matrix import ell_from_dia
    Ssc = to_scipy(ell_from_dia(l.A))
    gold = Ssc.astype(np.float64) @ np.asarray(x, np.float64)
    y_pl = jax.jit(lambda v: dia_spmv(l.A, v))(x)   # pallas path (backend axon)
    # jnp fallback: monkeypatch availability off
    av = pk.pallas_available
    pk.pallas_available = lambda: False
    y_jnp = jax.jit(lambda v: dia_spmv(l.A, v))(x)
    pk.pallas_available = av
    e_pl = np.linalg.norm(np.asarray(y_pl)-gold)/max(1e-30,np.linalg.norm(gold))
    e_jnp = np.linalg.norm(np.asarray(y_jnp)-gold)/max(1e-30,np.linalg.norm(gold))
    print(f"lvl{i} n={n} ndiag={l.A.data.shape[0]} offs[min,max]=({min(l.A.offsets)},{max(l.A.offsets)}) pallas_err={e_pl:.2e} jnp_err={e_jnp:.2e}", flush=True)
