"""Reference torch-checkpoint importer tests: a real torch.save'd
``.models`` file (NCHW Sequential state dict, the reference's on-disk
format — kwatsch/base_trainer.py:353-367) must load through
Trainer.load with forward-output parity against the torch net."""
import os
import subprocess
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

from tests.test_train import _toy_args  # noqa: E402
from superresolution_aniso_mri_tpu.train import Trainer  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _torch_vanilla_acai(width=32, latent_width=16, depth=8, latent=8,
                        colors=1, use_batchnorm=True, seed=0,
                        n_res_block=None, stem_padding=0):
    """Torch twin of models/acai.py VanillaACAI — now the shared
    builder in train/export_torch.py (the exporter needs the identical
    reference Sequential recipe); this wrapper keeps the tests' seeded
    conv init and non-trivial BN running stats so eval-mode parity
    exercises them. ``stem_padding=1`` is the TRUE reference geometry
    (acai_vanilla.py:51 pads the 1x1 stem) — paired with
    stem_pad_parity on the flax side."""
    from superresolution_aniso_mri_tpu.train.export_torch import (
        build_reference_twin,
    )

    torch.manual_seed(seed)
    model = build_reference_twin(width, latent_width, depth, latent,
                                 colors=colors,
                                 use_batchnorm=use_batchnorm,
                                 n_res_block=n_res_block,
                                 stem_padding=stem_padding)
    with torch.no_grad():
        for m in model.modules():
            if isinstance(m, tnn.BatchNorm2d):
                m.running_mean.normal_(0.0, 0.1)
                m.running_var.uniform_(0.5, 1.5)
                m.weight.normal_(1.0, 0.1)
                m.bias.normal_(0.0, 0.1)
    return model


def _save_reference_ckpt(model, path, epoch=42):
    torch.save({"model_dict_ae": model.state_dict(),
                "optimizer_dict_ae": {"state": {}, "param_groups": []},
                "epoch": epoch}, path)


@pytest.fixture(scope="module")
def ref_ckpt(tmp_path_factory):
    d = tmp_path_factory.mktemp("refckpt")
    model = _torch_vanilla_acai()
    path = str(d / "120.models")
    _save_reference_ckpt(model, path)
    return model, path


def test_import_forward_parity(ref_ckpt, tmp_path):
    model, path = ref_ckpt
    t = Trainer(_toy_args("ae_combined", tmp_path, use_batchnorm=True))
    t.load(path)
    assert t.epoch == 42

    x = np.random.RandomState(3).rand(4, 32, 32, 1).astype(np.float32)
    out_jax = np.asarray(t.predict(x))
    model.eval()
    with torch.no_grad():
        out_t = model(torch.tensor(x.transpose(0, 3, 1, 2)))
    np.testing.assert_allclose(out_jax,
                               out_t.numpy().transpose(0, 2, 3, 1),
                               atol=5e-3)  # default (bf16) conv precision


def test_import_into_wrapped_family(ref_ckpt, tmp_path):
    """acai-family trainers wrap params as {'ae', 'disc'}; the importer
    must route model_dict_ae into the 'ae' subtree only."""
    model, path = ref_ckpt
    t = Trainer(_toy_args("acai", tmp_path, use_batchnorm=True,
                          advweight=0.5, reg=0.2, advdepth=8))
    disc_before = t.state.params["disc"]
    t.load(path)
    # disc untouched (reference never saves it)
    import jax
    assert all(np.array_equal(a, b) for a, b in zip(
        jax.tree_util.tree_leaves(disc_before),
        jax.tree_util.tree_leaves(t.state.params["disc"])))
    x = np.random.RandomState(4).rand(2, 32, 32, 1).astype(np.float32)
    out_jax = np.asarray(t.predict(x))
    model.eval()
    with torch.no_grad():
        out_t = model(torch.tensor(x.transpose(0, 3, 1, 2)))
    np.testing.assert_allclose(out_jax,
                               out_t.numpy().transpose(0, 2, 3, 1),
                               atol=5e-3)


def test_import_res_block_parity(tmp_path):
    """n_res_block checkpoints must import the nested ResBlock convs
    (they used to be silently skipped, leaving random res weights)."""
    model = _torch_vanilla_acai(n_res_block=1, seed=5)
    path = str(tmp_path / "7.models")
    _save_reference_ckpt(model, path, epoch=7)
    t = Trainer(_toy_args("ae_combined", tmp_path, use_batchnorm=True,
                          n_res_block=1))
    t.load(path)
    x = np.random.RandomState(6).rand(2, 32, 32, 1).astype(np.float32)
    out_jax = np.asarray(t.predict(x))
    model.eval()
    with torch.no_grad():
        out_t = model(torch.tensor(x.transpose(0, 3, 1, 2)))
    np.testing.assert_allclose(out_jax,
                               out_t.numpy().transpose(0, 2, 3, 1),
                               atol=5e-3)


def test_import_partial_checkpoint_raises(ref_ckpt, tmp_path):
    """An encoder-only torch artifact must fail loudly instead of
    'loading' with a random decoder."""
    model, _ = ref_ckpt
    sd = {k: v for k, v in model.state_dict().items()
          if k.startswith("enc.")}
    path = str(tmp_path / "partial.models")
    torch.save({"model_dict_ae": sd, "optimizer_dict_ae": {},
                "epoch": 1}, path)
    t = Trainer(_toy_args("ae_combined", tmp_path, use_batchnorm=True))
    with pytest.raises(ValueError, match="missing submodules"):
        t.load(path)


def test_import_shape_mismatch_raises(ref_ckpt, tmp_path):
    _, path = ref_ckpt
    t = Trainer(_toy_args("ae_combined", tmp_path, use_batchnorm=True,
                          depth=16))  # wrong width flags for the ckpt
    with pytest.raises(ValueError, match="shape|do not match"):
        t.load(path)


def test_load_caisr_accepts_torch_checkpoint(ref_ckpt, tmp_path):
    model, path = ref_ckpt
    t = Trainer(_toy_args("ae_combined", tmp_path, use_batchnorm=True))
    t.load_caisr(path)
    x = np.random.RandomState(5).rand(2, 32, 32, 1).astype(np.float32)
    out_jax = np.asarray(t.predict(x, use_sr_model=True))
    model.eval()
    with torch.no_grad():
        out_t = model(torch.tensor(x.transpose(0, 3, 1, 2)))
    np.testing.assert_allclose(out_jax,
                               out_t.numpy().transpose(0, 2, 3, 1),
                               atol=5e-3)


def test_converter_cli_roundtrip(ref_ckpt, tmp_path):
    """Fabricated reference experiment dir → converter → get_trainer
    loads the converted (msgpack) checkpoint with identical outputs."""
    import yaml

    model, path = ref_ckpt
    src = tmp_path / "ref_exper"
    (src / "models").mkdir(parents=True)
    import shutil
    shutil.copy2(path, src / "models" / "120.models")
    settings = _toy_args("ae_combined", None, use_batchnorm=True)
    settings["device"] = "cuda"  # reference-only key must be tolerated
    with open(src / "settings.yaml", "w") as f:
        yaml.dump(settings, f)

    dst = str(tmp_path / "out_exper")
    env = dict(os.environ, JAX_PLATFORMS="cpu", JAX_PLATFORM_NAME="cpu",
               PYTHONPATH=REPO)
    r = subprocess.run(
        [sys.executable, "tools/convert_reference_checkpoint.py",
         "--exper_dir", str(src), "--output_dir", dst],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=600)
    assert r.returncode == 0, r.stderr[-3000:]
    assert "converted 120.models (epoch 42)" in r.stdout

    from superresolution_aniso_mri_tpu.train import get_trainer
    from superresolution_aniso_mri_tpu.train.import_torch import (
        is_torch_checkpoint,
    )
    conv_path = os.path.join(dst, "models", "120.models")
    assert not is_torch_checkpoint(conv_path)
    t = get_trainer(dst, model_nbr=120)
    x = np.random.RandomState(6).rand(2, 32, 32, 1).astype(np.float32)
    out_jax = np.asarray(t.predict(x))
    model.eval()
    with torch.no_grad():
        out_t = model(torch.tensor(x.transpose(0, 3, 1, 2)))
    np.testing.assert_allclose(out_jax,
                               out_t.numpy().transpose(0, 2, 3, 1),
                               atol=5e-3)


def test_import_reference_stem_geometry_parity(tmp_path):
    """Forward parity against the TRUE reference spatial graph: the
    original's padded 1x1 stem (H/W + 2, floor pooling). stem_pad_parity
    reproduces it; without the flag the importer warns that activations
    run through a different geometry."""
    import warnings

    model = _torch_vanilla_acai(width=32, latent_width=8, depth=8,
                                latent=8, use_batchnorm=True, seed=9,
                                stem_padding=1)
    path = str(tmp_path / "33.models")
    _save_reference_ckpt(model, path, epoch=33)

    t = Trainer(_toy_args("ae_combined", tmp_path, width=32,
                          latent_width=8, use_batchnorm=True,
                          stem_pad_parity=True))
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        t.load(path)
    assert not any("stem_pad_parity" in str(x.message) for x in w)
    x = np.random.RandomState(8).rand(2, 32, 32, 1).astype(np.float32)
    out_jax = np.asarray(t.predict(x))
    model.eval()
    with torch.no_grad():
        out_t = model(torch.tensor(x.transpose(0, 3, 1, 2)))
    np.testing.assert_allclose(out_jax,
                               out_t.numpy().transpose(0, 2, 3, 1),
                               atol=5e-3)

    # without the flag: same weights load, but the geometry-mismatch
    # warning must fire
    t2 = Trainer(_toy_args("ae_combined", tmp_path, width=32,
                           latent_width=8, use_batchnorm=True))
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        t2.load(path)
    assert any("stem_pad_parity" in str(x.message) for x in w)
