"""Test configuration: CPU backend with a virtual 8-device mesh and float64.

The parity suite mirrors the reference's float64 round-trip gates
(/root/reference/test/*.jl); sharding tests use the virtual device mesh.
Bench runs (bench.py) use the real TPU chip instead.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_enable_x64", True)

# Persistent compilation cache: each fresh XLA compile is expensive in this
# environment (remote compile service); cache executables across runs.
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
