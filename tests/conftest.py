"""Test harness config: force CPU with 8 virtual devices.

Multi-chip sharding tests run on a virtual CPU mesh
(``--xla_force_host_platform_device_count``), the JAX equivalent of a fake
backend; bench.py separately runs on real TPU hardware.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# The container's site hook may have initialized an accelerator backend before
# this conftest runs; force the platform through the config API (which wins
# over an eagerly-registered plugin) and cache compilations across test runs.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
_cache_dir = os.path.join(os.path.dirname(__file__), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
