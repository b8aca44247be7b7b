"""Test configuration: run everything on CPU with 8 virtual devices so
sharding/multichip paths are exercised without TPU hardware."""

import os

# Force CPU even if the ambient environment points JAX at a TPU tunnel.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# Plugins (e.g. jaxtyping) may import jax before this conftest runs, in which
# case the env var alone is too late — set the config explicitly too.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
