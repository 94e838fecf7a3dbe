"""Multi-host scaffolding tests: a 2-process x 4-device CPU cluster must
train to the SAME losses as 1 process x 8 devices (identical global
batches, GSPMD over the same 8-device mesh), with filesystem side
effects (settings/checkpoints/npz/png) owned by process 0 only."""
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _env(n_local_devices):
    return dict(
        os.environ,
        JAX_PLATFORM_NAME="cpu", JAX_PLATFORMS="cpu",
        XLA_FLAGS=(os.environ.get("XLA_FLAGS", "")
                   + f" --xla_force_host_platform_device_count="
                     f"{n_local_devices}").strip(),
        PYTHONPATH=os.pathsep.join(
            p for p in (REPO, os.environ.get("PYTHONPATH")) if p))


def _train_cmd(out, exper_id, extra=()):
    return [sys.executable, "train_brain_aesr.py",
            "-d", "MNIST3D", "-m", "ae_combined",
            "--downsample_steps", "2", "-e", "2", "-b", "8",
            "--width", "32", "--latent_width", "16", "--depth", "8",
            "--latent", "8", "--lr", "0.001",
            "--image_mix_loss_func", "mse",
            "--epoch_threshold", "-1", "--use_synthetic_data",
            "--volume_preview_interval", "0",
            "--num_devices", "8",
            "-o", out, "-id", exper_id, *extra]


@pytest.mark.slow
def test_two_process_matches_single_process(tmp_path):
    port = _free_port()
    out2 = str(tmp_path / "mh2")
    procs = []
    for pid in (0, 1):
        procs.append(subprocess.Popen(
            _train_cmd(out2, "mh", extra=(
                "--coordinator_address", f"127.0.0.1:{port}",
                "--num_processes", "2", "--process_id", str(pid))),
            cwd=REPO, env=_env(4), stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT, text=True))
    outs = [p.communicate(timeout=1800)[0] for p in procs]
    for p, o in zip(procs, outs):
        assert p.returncode == 0, o[-3000:]

    out1 = str(tmp_path / "sp8")
    r = subprocess.run(_train_cmd(out1, "sp"), cwd=REPO, env=_env(8),
                       capture_output=True, text=True, timeout=1800)
    assert r.returncode == 0, r.stderr[-3000:]

    tr2 = np.load(os.path.join(out2, "mh", "losses_train.npz"))
    tr1 = np.load(os.path.join(out1, "sp", "losses_train.npz"))
    assert set(tr2.files) == set(tr1.files)
    for k in tr1.files:
        np.testing.assert_allclose(
            tr2[k], tr1[k], rtol=2e-3, atol=5e-5,
            err_msg=f"2x4 vs 1x8 diverged on train loss {k}")
    te2 = np.load(os.path.join(out2, "mh", "losses_test.npz"))
    te1 = np.load(os.path.join(out1, "sp", "losses_test.npz"))
    for k in te1.files:
        np.testing.assert_allclose(
            te2[k], te1[k], rtol=2e-3, atol=5e-5,
            err_msg=f"2x4 vs 1x8 diverged on val loss {k}")

    # checkpoints exist exactly once (process 0 wrote; process 1 gated)
    models = os.listdir(os.path.join(out2, "mh", "models"))
    assert any(m.endswith(".models") for m in models)
    # process-0 gating messages: both ran 2 epochs, only one printed
    n_epoch_lines = sum(o.count("epoch    1") for o in outs)
    assert n_epoch_lines == 1, "verbose epoch line should be proc-0 only"


def test_initialize_noop_without_config():
    from superresolution_aniso_mri_tpu.parallel.distributed import (
        initialize_distributed, is_main_process,
    )
    env_backup = {k: os.environ.pop(k, None)
                  for k in ("SR_COORDINATOR_ADDRESS", "SR_NUM_PROCESSES",
                            "SR_PROCESS_ID", "SR_MULTIHOST")}
    try:
        assert initialize_distributed({}) is False
        assert initialize_distributed({"num_processes": 1}) is False
        assert is_main_process() is True
        with pytest.raises(ValueError, match="process_id"):
            initialize_distributed({"coordinator_address": "x:1",
                                    "num_processes": 2})
        # explicit flags beat SR_MULTIHOST=auto: an exported 'auto'
        # must not auto-init when the caller explicitly asked for a
        # single process, and a partial explicit config must still
        # fail fast instead of silently auto-initializing
        os.environ["SR_MULTIHOST"] = "auto"
        try:
            assert initialize_distributed({"num_processes": 1}) is False
            with pytest.raises(ValueError, match="incomplete"):
                initialize_distributed({"num_processes": 2})
        finally:
            os.environ.pop("SR_MULTIHOST", None)
    finally:
        for k, v in env_backup.items():
            if v is not None:
                os.environ[k] = v


def test_global_batch_from_host_single_process():
    """Single-process degenerate case: identical to shard_batch."""
    import jax
    from jax.sharding import PartitionSpec as P, NamedSharding
    from superresolution_aniso_mri_tpu.parallel import create_mesh
    from superresolution_aniso_mri_tpu.parallel.distributed import (
        global_batch_from_host,
    )
    mesh = create_mesh(jax.devices()[:4])
    sh = NamedSharding(mesh, P("data"))
    batch = {"x": np.arange(16, dtype=np.float32).reshape(8, 2)}
    out = global_batch_from_host(sh, batch)
    np.testing.assert_array_equal(np.asarray(out["x"]), batch["x"])
    with pytest.raises(ValueError, match="divisible"):
        global_batch_from_host(sh, {"x": np.zeros((3, 2))})
    # the divisibility requirement is the SHARDED-axis size (4-device
    # 'data' axis here), not just process_count (1): a batch of 6 rows
    # must get the friendly error, not an opaque uneven-sharding one
    with pytest.raises(ValueError, match="divisible"):
        global_batch_from_host(sh, {"x": np.zeros((6, 2))})
    # a 2-D mesh whose leading spec names only 'data' still shards
    # correctly and checks against the data-axis size alone
    from jax.sharding import Mesh
    mesh2 = Mesh(np.asarray(jax.devices()[:4]).reshape(2, 2),
                 ("data", "model"))
    sh2 = NamedSharding(mesh2, P("data"))
    out2 = global_batch_from_host(sh2, {"x": batch["x"]})
    np.testing.assert_array_equal(np.asarray(out2["x"]), batch["x"])