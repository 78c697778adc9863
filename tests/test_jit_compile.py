"""Compile-path coverage: the numerics tests run eagerly (conftest sets
``jax_disable_jit``); this file re-enables jit and checks that the hot
paths trace and compile — one V-cycle, the jitted standalone solve, a
preconditioned-CG solve, and the multi-chip dryrun."""

import numpy as np
import jax
import jax.numpy as jnp


def test_entry_compiles():
    with jax.disable_jit(False):
        import __graft_entry__ as ge
        fn, args = ge.entry()
        out = jax.jit(fn)(*args)
        assert out.shape == args[1].shape
        assert np.isfinite(np.asarray(out)).all()


def test_solve_jit_path():
    with jax.disable_jit(False):
        from pyamg_tpu.gallery import poisson
        from pyamg_tpu.aggregation import smoothed_aggregation_solver
        A = poisson((16, 16))
        ml = smoothed_aggregation_solver(A, max_coarse=8)
        b = jnp.asarray(np.random.default_rng(0).standard_normal(256),
                        A.dtype)
        res = []
        x = ml.solve(b, tol=1e-8, maxiter=30, residuals=res)
        assert res[-1] / res[0] < 1e-7
        res2 = []
        ml.solve(b, tol=1e-8, maxiter=30, accel="cg", residuals=res2)
        assert res2[-1] / res2[0] < 1e-7


def test_dryrun_multichip():
    with jax.disable_jit(False):
        import __graft_entry__ as ge
        ge.dryrun_multichip(len(jax.devices()))
