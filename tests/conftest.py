"""Test configuration: force CPU with 8 virtual devices so sharding /
multi-chip tests run without TPU hardware. Must run before jax imports."""
import os

# JAX_PLATFORM_NAME wins over the environment's JAX_PLATFORMS=axon override
os.environ["JAX_PLATFORM_NAME"] = "cpu"
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

# the axon sitecustomize registers its backend at interpreter start and can
# override env-based platform selection; pin it explicitly via jax.config
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
