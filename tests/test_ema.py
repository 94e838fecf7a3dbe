"""EMA (Polyak-averaged) weight tracking (--ema_decay).

Beyond-reference quality lever: trainer.ema_params follows
``ema = d*ema + (1-d)*params`` after every optimizer step, a rolling
models/ema.models checkpoint is written each epoch, and
get_trainer(model_nbr='ema') evaluates the averaged weights.
"""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from superresolution_aniso_mri_tpu.data import (
    TripletSampler, make_toy_dataset, prepare_batch_pairs,
)
from superresolution_aniso_mri_tpu.train import Trainer, get_trainer

from test_train import _device_batch, _toy_args


@pytest.fixture(scope="module")
def sampler():
    vols = make_toy_dataset(num_volumes=2, size=32, num_slices=9, seed=7)
    return TripletSampler(vols, downsample_steps=2, seed=11)


def _flat(tree):
    return jax.tree_util.tree_leaves(jax.device_get(tree))


def test_ema_recurrence_matches_manual(sampler, tmp_path):
    d = 0.9
    t = Trainer(_toy_args("ae_combined", tmp_path, ema_decay=d))
    # manual recurrence over host copies of the params after each step
    manual = [np.array(x) for x in _flat(t.state.params)]
    for _ in range(3):
        t.train(_device_batch(sampler))
        cur = _flat(t.state.params)
        manual = [d * m + (1 - d) * np.array(c)
                  for m, c in zip(manual, cur)]
    got = _flat(t.ema_params)
    for m, g in zip(manual, got):
        np.testing.assert_allclose(np.array(g), m, rtol=2e-5, atol=1e-7)
    # and the EMA genuinely lags the live params
    assert any(not np.allclose(np.array(g), np.array(c))
               for g, c in zip(got, _flat(t.state.params)))


def test_ema_disabled_by_default(sampler, tmp_path):
    t = Trainer(_toy_args("ae_combined", tmp_path))
    assert t.ema_params is None
    t.train(_device_batch(sampler))
    assert t.ema_params is None


def test_train_many_compounds_decay(sampler, tmp_path):
    d = 0.8
    t = Trainer(_toy_args("ae_combined", tmp_path, ema_decay=d,
                          steps_per_dispatch=2))
    ema0 = [np.array(x) for x in _flat(t.ema_params)]
    b1 = _device_batch(sampler)
    b2 = _device_batch(sampler)
    t.train_many(jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), b1, b2))
    # one dispatch of n=2 steps folds with decay d**2 toward the FINAL
    # params (intermediate iterates are not observable)
    cur = _flat(t.state.params)
    exp = [d ** 2 * e + (1 - d ** 2) * np.array(c)
           for e, c in zip(ema0, cur)]
    for e, g in zip(exp, _flat(t.ema_params)):
        np.testing.assert_allclose(np.array(g), e, rtol=2e-5, atol=1e-7)


def test_ema_checkpoint_written_and_loadable(sampler, tmp_path):
    t = Trainer(_toy_args("ae_combined", tmp_path, ema_decay=0.9,
                          epoch_threshold=-1))
    t.prepare_run()
    for _ in range(2):
        t.train(_device_batch(sampler))
    t.validate(_device_batch(sampler))
    t.show_loss_on_tensorboard("train")
    t.show_loss_on_tensorboard("test")
    t.end_epoch_processing()
    ema_file = os.path.join(t.dir_models, "ema.models")
    assert os.path.isfile(ema_file)

    # the rolling EMA checkpoint is a normal checkpoint: model_nbr='ema'
    # rehydrates a trainer whose weights are the averaged ones
    te = get_trainer(str(tmp_path), model_nbr="ema")
    for a, b in zip(_flat(te.state.params), _flat(t.ema_params)):
        np.testing.assert_allclose(np.array(a), np.array(b), rtol=1e-6)
    # and it predicts (forward pass runs on the averaged weights)
    out = te.predict(jnp.zeros((2, 32, 32, 1)))
    assert np.asarray(out).shape == (2, 32, 32, 1)


def test_ema_resume_restores_track(sampler, tmp_path):
    args = _toy_args("ae_combined", tmp_path, ema_decay=0.9,
                     epoch_threshold=-1)
    t = Trainer(args)
    os.makedirs(t.dir_models, exist_ok=True)
    t.train(_device_batch(sampler))
    t.validate(_device_batch(sampler))
    t.show_loss_on_tensorboard("train")
    t.show_loss_on_tensorboard("test")
    t.end_epoch_processing()
    want = [np.array(x) for x in _flat(t.ema_params)]

    t2 = Trainer(args)
    t2.load(os.path.join(t.dir_models, "last.models"))
    got = _flat(t2.ema_params)
    for w, g in zip(want, got):
        np.testing.assert_allclose(np.array(g), w, rtol=1e-6)
