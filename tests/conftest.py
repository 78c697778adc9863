"""Test configuration: run on a virtual 8-device CPU mesh with x64.

Real-TPU runs happen in bench.py; tests validate numerics (f64) and
multi-device sharding on the host platform, mirroring how the reference
validates kernels against numpy golds (SURVEY.md §4).

Note: plugins (jaxtyping) import jax before this conftest runs, so env vars
are too late — use jax.config.update, which works any time before backend
initialization.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_enable_x64", True)

# Compile time dominates the suite (every (shape, width) combo of every
# level retraces); persist ALL compiles so warm re-runs are cheap.
os.makedirs("/tmp/jax_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)


def pytest_configure(config):
    config.addinivalue_line("markers", "slow: long-running parity tests")
