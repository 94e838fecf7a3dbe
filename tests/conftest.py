"""Test configuration: force CPU with 8 virtual devices so sharding /
multi-chip tests run without TPU hardware. Must run before jax imports."""
import os
import re

# overwrite BOTH platform vars: JAX_PLATFORMS takes priority over the
# legacy JAX_PLATFORM_NAME, and the environment ships JAX_PLATFORMS=axon
os.environ["JAX_PLATFORM_NAME"] = "cpu"
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
_m = re.search(r"--xla_force_host_platform_device_count=(\d+)", _flags)
if _m is None:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()
elif int(_m.group(1)) < 8:
    # an inherited smaller count would silently break every mesh test
    os.environ["XLA_FLAGS"] = re.sub(
        r"--xla_force_host_platform_device_count=\d+",
        "--xla_force_host_platform_device_count=8", _flags)

# the axon sitecustomize registers its backend at interpreter start and can
# override env-based platform selection; pin it explicitly via jax.config
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
