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


# ---------------------------------------------------------------------------
# test tiers: `pytest -m "not slow"` is the quick tier (~2-5 min) for the
# edit-verify loop; the full suite (~45 min on one core) stays the gate.
# Files listed here spawn subprocess trainings, drive the bench/CLIs, or
# run multi-step trajectory oracles.
# ---------------------------------------------------------------------------
import pytest as _pytest

_SLOW_FILES = {
    "test_cli.py",              # subprocess trainings + on-chip bench
    "test_import_torch.py",     # converter CLI subprocess
    "test_export_torch.py",     # exporter CLI subprocess + torch twins
    "test_multihost.py",        # 2-process cluster trainings
    "test_reference_commands.py",  # README-parity subprocess CLIs
    "test_torch_parity.py",     # torch trajectory oracles
    "test_parity_round2b.py",   # multi-step loss-family oracles
    "test_parallel.py",         # mesh-equality training runs
    "test_train.py",            # family training loops
    "test_legacy_roto.py",      # legacy family training loops
    "test_robustness_fixes.py",  # end-to-end resume/robustness runs
    "test_infer_eval.py",       # sweep + volume-synthesis pipelines
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        if os.path.basename(str(item.fspath)) in _SLOW_FILES:
            item.add_marker(_pytest.mark.slow)
