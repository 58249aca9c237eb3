"""Test configuration: CPU backend with a virtual 8-device mesh and float64.

The parity suite mirrors the reference's float64 round-trip gates
(/root/reference/test/*.jl); sharding tests use the virtual device mesh.
Bench runs (bench.py) use the real TPU chip instead.
"""

import os

# Run the parity suite on the local CPU backend with 8 virtual devices.
# (The axon sitecustomize would otherwise register the remote TPU backend,
# sending every tiny test compile through the tunnel.)
os.environ["PALLAS_AXON_POOL_IPS"] = ""
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# the axon sitecustomize force-selects its remote TPU platform via
# jax.config (env vars are overridden) — select local CPU back.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

# Persistent compilation cache: each fresh XLA compile is expensive in this
# environment (remote compile service); cache executables across runs.
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

# NaN sanitizer test mode (SURVEY §5): WAVELETSEXT_DEBUG_NANS=1 makes every
# NaN produced inside a jitted program raise at the producing primitive.
if os.environ.get("WAVELETSEXT_DEBUG_NANS"):
    jax.config.update("jax_debug_nans", True)
