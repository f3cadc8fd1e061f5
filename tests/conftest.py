"""Test configuration: force CPU backend with 8 virtual devices so
multi-chip sharding behavior is testable without a pod."""

import os

# Force override: the session environment pins JAX_PLATFORMS to the hardware
# plugin; unit tests must run on the virtual 8-device CPU mesh.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# sitecustomize pre-imports jax, so the env var alone is not enough:
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
# Persistent compile cache: XLA-CPU compiles are expensive on this machine.
os.makedirs("/tmp/jax_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
