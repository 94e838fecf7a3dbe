"""Exporter tests: a framework checkpoint written as a reference-format
``.models`` torch pickle must (a) load through the reference's own
``load`` sequence (model AND optimizer dicts, base_trainer.py:358-362),
(b) produce forward-parity outputs in torch, and (c) round-trip back
through the importer bit-identically."""
import os
import subprocess
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from tests.test_train import _toy_args  # noqa: E402
from superresolution_aniso_mri_tpu.train import Trainer  # noqa: E402
from superresolution_aniso_mri_tpu.train.export_torch import (  # noqa: E402
    build_reference_twin,
    save_reference_checkpoint,
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _export(trainer, path, **cfg_over):
    import jax

    cfg = trainer.model_config
    kw = dict(width=cfg.width, latent_width=cfg.latent_width,
              depth=cfg.depth, latent=cfg.latent, colors=cfg.colors,
              use_batchnorm=cfg.use_batchnorm,
              use_sigmoid=cfg.use_sigmoid, n_res_block=cfg.n_res_block,
              epoch=7)
    kw.update(cfg_over)
    save_reference_checkpoint(path, jax.device_get(trainer.state.params),
                              jax.device_get(trainer.state.batch_stats
                                             or {}), **kw)


def test_export_reference_load_contract_and_parity(tmp_path):
    """The exported pickle survives the reference's exact load sequence
    (load_state_dict on BOTH dicts) and the torch twin then matches the
    flax model's forward outputs."""
    t = Trainer(_toy_args("ae_combined", tmp_path, use_batchnorm=True))
    path = str(tmp_path / "export.models")
    _export(t, path)

    raw = torch.load(path, map_location="cpu", weights_only=False)
    assert set(raw) == {"model_dict_ae", "optimizer_dict_ae", "epoch"}
    assert raw["epoch"] == 7

    twin = build_reference_twin(32, 16, 8, 8, use_batchnorm=True)
    twin.load_state_dict(raw["model_dict_ae"])  # reference load step 1
    opt = torch.optim.Adam(twin.parameters(), lr=1e-3)
    opt.load_state_dict(raw["optimizer_dict_ae"])  # reference step 2

    x = np.random.RandomState(11).rand(4, 32, 32, 1).astype(np.float32)
    out_jax = np.asarray(t.predict(x))
    twin.eval()
    with torch.no_grad():
        out_t = twin(torch.tensor(x.transpose(0, 3, 1, 2)))
    np.testing.assert_allclose(out_jax,
                               out_t.numpy().transpose(0, 2, 3, 1),
                               atol=5e-3)  # default (bf16) conv precision


def test_export_import_roundtrip_bit_identical(tmp_path):
    """export → importer → the flax tree that comes back equals the one
    that went out (float32 params; BN stats included)."""
    import jax

    t = Trainer(_toy_args("ae_combined", tmp_path, use_batchnorm=True,
                          n_res_block=1))
    path = str(tmp_path / "rt.models")
    _export(t, path)

    t2 = Trainer(_toy_args("ae_combined", tmp_path, use_batchnorm=True,
                           n_res_block=1))
    t2.load(path)  # auto-detects the torch format
    for a, b in zip(jax.tree_util.tree_leaves(
                        jax.device_get(t.state.params)),
                    jax.tree_util.tree_leaves(
                        jax.device_get(t2.state.params))):
        np.testing.assert_array_equal(np.asarray(a, np.float32),
                                      np.asarray(b, np.float32))
    for a, b in zip(jax.tree_util.tree_leaves(
                        jax.device_get(t.state.batch_stats)),
                    jax.tree_util.tree_leaves(
                        jax.device_get(t2.state.batch_stats))):
        np.testing.assert_array_equal(np.asarray(a, np.float32),
                                      np.asarray(b, np.float32))


def test_export_rejects_architecture_mismatch(tmp_path):
    """Wrong twin flags (depth) must fail loudly, not write a
    half-mapped checkpoint."""
    t = Trainer(_toy_args("ae_combined", tmp_path, use_batchnorm=True))
    with pytest.raises(ValueError, match="do not match|shape"):
        _export(t, str(tmp_path / "bad.models"), depth=16)


def test_export_wrapped_family_exports_ae_only(tmp_path):
    """acai-family params are {'ae','disc'}: the exporter writes the AE
    subtree (what the reference persists) and ignores the disc."""
    t = Trainer(_toy_args("acai", tmp_path, use_batchnorm=True,
                          advweight=0.5, reg=0.2, advdepth=8))
    path = str(tmp_path / "acai.models")
    _export(t, path)
    raw = torch.load(path, map_location="cpu", weights_only=False)
    sides = {k.split(".")[0] for k in raw["model_dict_ae"]}
    assert sides == {"enc", "dec"}


@pytest.mark.slow
def test_export_cli(tmp_path):
    """tools/export_reference_checkpoint.py over a real experiment dir
    (settings.yaml + msgpack checkpoint)."""
    import yaml

    t = Trainer(_toy_args("ae_combined", tmp_path, use_batchnorm=True))
    exper = tmp_path / "exper"
    (exper / "models").mkdir(parents=True)
    with open(exper / "settings.yaml", "w") as f:
        yaml.dump(_toy_args("ae_combined", None, use_batchnorm=True), f)
    t.save_models(str(exper / "models" / "3.models"), epoch=3)

    out = str(tmp_path / "for_reference.models")
    env = dict(os.environ, JAX_PLATFORMS="cpu", JAX_PLATFORM_NAME="cpu",
               PYTHONPATH=REPO)
    r = subprocess.run(
        [sys.executable, "tools/export_reference_checkpoint.py",
         "--exper_dir", str(exper), "--model_nbr", "3", "--out", out],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=600)
    assert r.returncode == 0, r.stderr[-3000:]
    raw = torch.load(out, map_location="cpu", weights_only=False)
    twin = build_reference_twin(32, 16, 8, 8, use_batchnorm=True)
    twin.load_state_dict(raw["model_dict_ae"])
