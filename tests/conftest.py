"""Test env: force CPU with 8 virtual devices so sharding tests run anywhere.

Env vars alone are unreliable (a pytest plugin may import jax before this
conftest runs, freezing the platform default to the shell's axon TPU), so we
also update the config explicitly — this works as long as no backend has been
initialized yet.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax

jax.config.update("jax_platforms", "cpu")
assert jax.device_count() == 8, (
    f"expected 8 virtual CPU devices, got {jax.device_count()} "
    f"({jax.devices()[:2]}) — backend initialized before conftest?"
)
