"""pyamg_tpu — TPU-native algebraic multigrid (JAX/XLA/Pallas).

A from-scratch framework with the capabilities of PyAMG (reference at
``/root/reference``): multigrid hierarchies (classical Ruge-Stuben,
smoothed aggregation, root-node, adaptive, pairwise, AIR), Krylov
accelerators, smoothers, strength measures and graph algorithms — all
designed as static-shape, data-parallel device programs rather than
sequential CSR loops.
"""

__version__ = "0.1.0"

import os as _os

# glibc munmaps every >128 KB free, so each large numpy temporary on the
# host setup path re-faults its pages (~8x slowdown measured on the
# 10M-unknown SELL plan build).  Keep big allocations on the heap and
# never trim: setup-phase numpy runs at memory speed instead of
# page-fault speed.  Opt out with PYAMG_TPU_NO_MALLOC_TUNE=1.
if not _os.environ.get("PYAMG_TPU_NO_MALLOC_TUNE"):
    try:
        import ctypes as _ctypes
        _libc = _ctypes.CDLL("libc.so.6", use_errno=True)
        _libc.mallopt(-3, 1 << 30)   # M_MMAP_THRESHOLD
        _libc.mallopt(-1, 1 << 30)   # M_TRIM_THRESHOLD
    except Exception:  # pragma: no cover - glibc-only tuning
        pass

import jax as _jax

# AMG setup compiles hundreds of small shape-specialized XLA programs
# (per level, per pad-width); a persistent compile cache makes every run
# after the first cheap.  Opt out with PYAMG_TPU_NO_COMPILE_CACHE=1.
if not _os.environ.get("PYAMG_TPU_NO_COMPILE_CACHE"):
    try:
        if _jax.config.jax_compilation_cache_dir is None:
            _cache = _os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                     "/tmp/pyamg_tpu_jax_cache")
            _os.makedirs(_cache, exist_ok=True)
            _jax.config.update("jax_compilation_cache_dir", _cache)
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
        _jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:  # pragma: no cover - cache is best-effort
        pass

from pyamg_tpu.sparse import ELL, BELL, from_scipy, to_scipy

# mirror of the reference's public surface (pyamg/__init__.py:6-10) plus
# the container types; names below resolve lazily via __getattr__
__all__ = ["ELL", "BELL", "from_scipy", "to_scipy",
           "ruge_stuben_solver", "smoothed_aggregation_solver",
           "rootnode_solver", "adaptive_sa_solver", "pairwise_solver",
           "air_solver", "solve", "solver", "solver_configuration",
           "MultilevelSolver", "coarse_grid_solver", "gallery", "util",
           "test"]


def __getattr__(name):
    # Lazy re-exports of the solver factories (avoid import cycles / cost).
    if name in ("smoothed_aggregation_solver",):
        from pyamg_tpu.aggregation import smoothed_aggregation_solver
        return smoothed_aggregation_solver
    if name in ("rootnode_solver",):
        from pyamg_tpu.aggregation import rootnode_solver
        return rootnode_solver
    if name in ("pairwise_solver",):
        from pyamg_tpu.aggregation import pairwise_solver
        return pairwise_solver
    if name in ("adaptive_sa_solver",):
        from pyamg_tpu.aggregation import adaptive_sa_solver
        return adaptive_sa_solver
    if name in ("ruge_stuben_solver",):
        from pyamg_tpu.classical import ruge_stuben_solver
        return ruge_stuben_solver
    if name in ("air_solver",):
        from pyamg_tpu.classical import air_solver
        return air_solver
    if name in ("MultilevelSolver", "coarse_grid_solver"):
        import pyamg_tpu.multilevel as ml
        return getattr(ml, name)
    if name in ("solve", "solver", "solver_configuration"):
        import pyamg_tpu.blackbox as bb
        return getattr(bb, name)
    if name == "gallery":
        import pyamg_tpu.gallery as gallery
        return gallery
    if name == "util":
        import pyamg_tpu.util as util
        return util
    if name == "test":
        from pyamg_tpu._tools import PytestTester
        return PytestTester(__name__)
    raise AttributeError(f"module 'pyamg_tpu' has no attribute {name!r}")
