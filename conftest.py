"""Repo-level pytest config: force a virtual 8-device CPU mesh for tests.

Set before any jax import so sharding tests can build an 8-device Mesh without
TPU hardware (bench.py / production code run on the real chip instead).
"""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(__file__))

import jax  # noqa: E402

# The axon sitecustomize overrides JAX_PLATFORMS=axon; force the test suite
# onto a virtual 8-device CPU mesh via config (wins if set before backend
# init).
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

# Persistent compilation cache: repeat test runs skip XLA recompiles.
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_vmas_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
