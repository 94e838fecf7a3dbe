"""Shared training loop driven by the CLI scripts.

Reference: train_cardiac_aesr.py:153-204 / train_brain_aesr.py:137-192 —
epoch loop, per-iteration trainer.train, end-of-epoch validate + image
dumps + checkpointing, KeyboardInterrupt → save.

TPU shape: the host sampler yields fixed-shape triplet batches; all
augmentation runs in one fused device program; the train step is a
single jitted XLA program (optionally data-parallel over a mesh).
"""
from __future__ import annotations

import os
import time
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from ..config.net_config import NetworkConfig, merge_args_architecture
from ..data import AugmentConfig, TripletSampler, augment_batch, \
    prepare_batch_pairs, prepare_batch_quintets, prepare_batch_septets
from ..data.datasets import get_datasets
from ..train import Trainer
from ..utils.grids import generate_recon_grid, save_image_grid


def build_augment_config(args: Dict) -> AugmentConfig:
    """Per-dataset transform composition
    (reference: train_cardiac_aesr.py:83-105 get_transforms,
    datasets/common_brains.py:47-100 get_transforms_brain)."""
    dataset = args["dataset"]
    width = int(args["width"])
    aug_patch = args.get("aug_patch_size")
    if dataset in ("MNIST3D", "MNISTRoto"):
        return AugmentConfig(patch_size=width, aug_patch_size=aug_patch,
                             random_crop=False, rot90=False, intensity=False)
    # label channels (ACDCLBL) and loss-mask channels must stay exact:
    # no intensity remap, no bilinear rotation (rot90/crops are exact)
    exact_channels = dataset == "ACDCLBL" or bool(args.get("get_masks"))
    # recipe parity with what the reference CLIs ACTUALLY compose:
    #  * ACDC and ACDCC both train through train_cardiac_aesr.py's own
    #    get_transforms (:83-105, passed into get_new_dataset_acdc at
    #    :36-41): AdjustToPatchSize + CenterCrop(aug) + RandomCrop(width)
    #    + RandomIntensity + RandomRotation (= rot90) — NO any-angle
    #    rotation (RandomAnyRotation only appears in dataset-module
    #    DEFAULTS the CLI overrides, data4d_simple.py:38-40);
    #  * elastic deformation (shared_transforms.py:15-45
    #    SpatialTransformToHalfBatch) is defined in the reference but
    #    composed into NO training entry point (grep: zero call sites) —
    #    AugmentConfig.elastic therefore defaults to False and stays an
    #    opt-in extra here too.
    return AugmentConfig(
        patch_size=width,
        aug_patch_size=int(aug_patch) if aug_patch else None,
        random_crop=True, rot90=True, intensity=not exact_channels,
        # opt-in extra (--rotate_any), like the dataset-module defaults'
        # RandomAnyRotation(max_degree=359) the reference CLI overrides
        rotate_any=bool(args.get("rotate_any")) and not exact_channels,
        max_degree=359,
        # dHCP/ADNI/brainMASI crop near the brain center
        # (reference: dHCP/dataset.py:45, ADNI/dataset.py:21 —
        # RandomCropNextToCenter(width, max_translation=35))
        crop_next_to_center=dataset in ("dHCP", "ADNI", "brainMASI"),
        max_translation=35,
        # opt-in extras (--aug_noise/--aug_blur): the reference defines
        # these in acdc_transforms.py but composes them into no training
        # entry point; exposed here as noise-aware training levers (a
        # noisy-GT benchmark rewards a model that has seen noise —
        # docs/STATUS.md round-4 dHCP analysis). Exact channels (labels/
        # masks) exclude them like the intensity remap.
        noise=bool(args.get("aug_noise")) and not exact_channels,
        blur=bool(args.get("aug_blur")) and not exact_channels,
    )


def _device_batch(raw: Dict, aug_cfg: AugmentConfig, key,
                  with_mask: bool = False,
                  with_alpha_features: bool = False,
                  latent_taps: int = 2) -> Dict:
    triplet = augment_batch(key, jnp.asarray(raw["triplet"]), aug_cfg)
    loss_mask = None
    if with_mask:
        # the loss mask rode through the augmentation as the last channel
        loss_mask = triplet[..., -1:]
        triplet = triplet[..., :-1]
    outer = outer2 = None
    if latent_taps == 6:
        # septet layout (TripletSampler(latent_taps=6)): both outward
        # z-neighbour pairs rode through the SAME per-item augmentation
        # warp as their triplet — required for the lanczos3 mix to see
        # a geometrically consistent 6-slice neighbourhood
        image, outer, outer2, between = prepare_batch_septets(triplet)
    elif latent_taps == 4:
        # quintet layout (TripletSampler(latent_taps=4)): the outward
        # z-neighbour pair rode through the SAME per-item augmentation
        # warp as its triplet — required for the cubic mix to see a
        # geometrically consistent 4-slice neighbourhood
        image, outer, between = prepare_batch_quintets(triplet)
    else:
        image, between = prepare_batch_pairs(triplet)
    batch = {
        "image": image,
        "slice_between": between,
        "alpha_from": jnp.asarray(raw["alpha_from"]),
        "alpha_to": jnp.asarray(raw["alpha_to"]),
    }
    if outer is not None:
        batch["outer"] = outer
    if outer2 is not None:
        batch["outer2"] = outer2
    if "is_inbetween" in raw:
        # weights the synthesis loss: degenerate step-1 triplets
        # (between := endpoint) are monitor-only
        batch["is_inbetween"] = jnp.asarray(raw["is_inbetween"])
    if with_alpha_features and "alpha_features" in raw:
        # slice-geometry scalars for the alpha probes (reference:
        # base_alpha_trainer.py:178-189 create_add_features)
        batch["alpha_features"] = jnp.asarray(raw["alpha_features"])
    if loss_mask is not None:
        batch["loss_mask"] = loss_mask
    return batch


def _generate_volume_previews(trainer, val_vols, merged: Dict,
                              epoch: int) -> None:
    """Synthesize full validation volumes (ds=2) and save compare grids
    per epoch (reference: base_trainer.py:149-162,
    evaluate/evaluate_image.py:36-107). Cardiac 4D volumes preview one
    frame; brain volumes preview the whole stack."""
    interval = int(merged.get("volume_preview_interval", 1) or 0)
    if not val_vols or interval <= 0 or epoch % interval != 0:
        return
    from ..evaluate import generate_val_volume_grids

    vol = val_vols[0]
    image_dicts = {getattr(vol, "patient_id", "val0") or "val0":
                   {"image": np.asarray(vol.image, np.float32)}}
    try:
        res = generate_val_volume_grids(
            trainer, image_dicts,
            eval_patch_size=int(merged["width"]))
    except Exception as exc:  # preview must never kill training
        print(f"volume preview skipped: {exc}")
        return
    for pid, grid in res["grids"].items():
        save_image_grid(grid, os.path.join(
            trainer.dir_images, f"synth_vol_{pid}_e{epoch:03d}.png"))
        trainer.log_tb_image(f"val/synth_volume_{pid}", grid)


def rehydrate_resume_loss_config(args_dict: Dict) -> list:
    """--auto_resume continuation: loss-defining keys the CLI left
    unset must come from the experiment's recorded settings.yaml, not
    from ambient defaults. The combined families' default mix loss is
    environment-sensitive (SR_MIX_LOSS_DEFAULT, net_config
    _default_mix_loss) — without this, a run started under
    SR_MIX_LOSS_DEFAULT=mse and resumed from a shell without the env
    var would silently flip to the perceptual objective mid-experiment
    (and prepare_run's settings rewrite would destroy the evidence).
    Returns the list of rehydrated keys (for tests/logging)."""
    if not args_dict.get("auto_resume"):
        return []
    out = args_dict.get("output_dir")
    spath = os.path.join(out, "settings.yaml") if out else None
    if not spath or not os.path.isfile(spath):
        return []
    from ..config.settings import load_settings

    kept = load_settings(spath) or {}
    took = []
    for key in ("image_mix_loss_func", "alpha_loss_func"):
        if args_dict.get(key) is None and kept.get(key) is not None:
            args_dict[key] = kept[key]
            took.append(key)
    return took


def run_training(args_dict: Dict, verbose: bool = True) -> Trainer:
    # persistent XLA compile cache: restarts (--auto_resume under a
    # supervisor) reload compiled programs instead of re-paying
    # minutes of tunneled compilation (utils/compile_cache.py)
    from ..utils.compile_cache import enable_persistent_compile_cache
    enable_persistent_compile_cache()
    # multi-host: join the JAX distributed cluster BEFORE any device
    # query (no-op unless --coordinator_address/--num_processes or the
    # SR_* env names more than one process; parallel/distributed.py)
    from ..parallel.distributed import initialize_distributed, \
        is_main_process
    initialize_distributed(args_dict)
    main_proc = is_main_process()
    verbose = verbose and main_proc

    rehydrate_resume_loss_config(args_dict)
    net_cfg = NetworkConfig(args_dict["model"], args_dict["dataset"],
                            args_dict.get("ae_class", "VanillaACAI"))
    merged = merge_args_architecture(args_dict, net_cfg.architecture)

    trainer = Trainer(merged)
    trainer.prepare_run()
    merged = trainer.args

    train_vols, val_vols = get_datasets(merged)
    ds = int(merged.get("downsample_steps") or 2)
    pad = int(merged.get("aug_patch_size") or merged["width"])
    use_masks = bool(merged.get("get_masks"))
    # --train_latent_interp cubic/lanczos3: sample quintets/septets (the
    # outward z-neighbour pairs ride as extra slots) so the loss can mix
    # 4/6 latents with the same spline kernel the matching inference
    # path decodes
    tli = str(merged.get("train_latent_interp") or "linear")
    latent_taps = {"cubic": 4, "lanczos3": 6}.get(tli, 2)
    if merged["dataset"] == "MNISTRoto":
        if latent_taps > 2:
            raise ValueError(
                f"--train_latent_interp {tli} is not supported for "
                "MNISTRoto (the roto sampler generates rotation "
                "triplets on the fly, not volume quintets/septets)")
        # on-the-fly rotation triplets (reference: MNIST/data_roto.py
        # MakeRotatedTriple) — NOT the pre-built MNIST3D stacks
        from ..data.synthetic import RotoTripletSampler

        sampler = RotoTripletSampler(
            size=int(merged["width"]), downsample_steps=ds,
            seed=int(merged.get("seed", 0)),
            mnist_path=merged.get("mnist_path"), mnist_split="train")
        val_sampler = RotoTripletSampler(
            size=int(merged["width"]), downsample_steps=ds,
            seed=int(merged.get("seed", 0)) + 1,
            mnist_path=merged.get("mnist_path"), mnist_split="val")
    else:
        sampler = TripletSampler(
            train_vols, ds, merged.get("slice_selection", "adjacent_plus"),
            pad_size=pad, seed=int(merged.get("seed", 0)),
            use_masks=use_masks, latent_taps=latent_taps)
        val_sampler = TripletSampler(val_vols, ds, "adjacent_plus",
                                     pad_size=pad,
                                     seed=int(merged.get("seed", 0)) + 1,
                                     use_masks=use_masks,
                                     latent_taps=latent_taps)
    # device-resident slice cache: upload the padded stacks once,
    # gather each batch on device — identical batches/trajectory to the
    # host path, minus the per-step pixel transfer (data/device_cache.py)
    from ..data.device_cache import maybe_device_cache
    multi_device = int(merged.get("num_devices") or 1) > 1
    sampler = maybe_device_cache(
        sampler, merged.get("device_data_cache", "auto"),
        multi_device=multi_device, verbose=verbose)
    val_sampler = maybe_device_cache(
        val_sampler, merged.get("device_data_cache", "auto"),
        multi_device=multi_device)
    aug_cfg = build_augment_config(merged)
    val_cfg = AugmentConfig(patch_size=int(merged["width"]),
                            aug_patch_size=aug_cfg.aug_patch_size,
                            random_crop=False, rot90=False, intensity=False)

    with_alpha_feats = str(merged.get("model", "")).startswith("alpha")
    batch_size = int(merged["batch_size"])
    test_batch_size = int(merged.get("test_batch_size", batch_size))
    epochs = int(merged["epochs"])
    rng = jax.random.PRNGKey(int(merged.get("seed", 0)))

    if merged.get("model_filename"):
        trainer.load(merged["model_filename"])
        if verbose:
            print(f"resumed from {merged['model_filename']} "
                  f"(epoch {trainer.epoch})")
    elif merged.get("auto_resume"):
        # elastic restart: prefer the rolling last.models (written every
        # epoch), else the newest numbered checkpoint (the reference
        # requires a manual --model_filename,
        # train_cardiac_aesr.py:108-116)
        from ..evaluate.find_best_model import list_epoch_checkpoints

        last = os.path.join(trainer.dir_models, "last.models")
        ckpt = None
        if os.path.isfile(last):
            ckpt = last
        else:
            epochs_saved = list_epoch_checkpoints(merged["output_dir"])
            if epochs_saved:
                ckpt = os.path.join(trainer.dir_models,
                                    f"{epochs_saved[-1]}.models")
        if ckpt:
            trainer.load(ckpt)
            if verbose:
                print(f"auto-resumed from {ckpt} (epoch {trainer.epoch})")

    profile_dir = merged.get("profile_dir")
    start_epoch = trainer.epoch
    # stall watchdog (--step_timeout_s): a hung device backend (dead
    # tunnel, preempted slice) blocks forever instead of raising — beat
    # after every completed train/val step and exit 75 on silence so a
    # supervisor can restart with --auto_resume (utils/watchdog.py)
    watchdog = None
    timeout_s = float(merged.get("step_timeout_s") or 0)
    if timeout_s > 0:
        from ..utils.watchdog import StepWatchdog

        # the FIRST step carries every program compile (168 s measured
        # for a 256² train step through the tunnel; the persistent
        # compile cache makes restarts cheap but the first-ever run of
        # a config still pays it) — widen only the pre-first-beat
        # window so steady-state stall detection stays sharp
        first_s = max(timeout_s,
                      float(merged.get("first_step_timeout_s") or 600.0))
        watchdog = StepWatchdog(timeout_s, label=str(
            merged.get("exper_id") or "train"),
            first_timeout_s=first_s).start()

    def _beat():
        if watchdog is not None:
            watchdog.beat()
            # re-arm after a cross-host pause window (no-op when armed)
            watchdog.resume()

    try:
        import contextlib

        from ..data.prefetch import prefetch_epoch
        from ..utils.profiling import trace

        for epoch in range(trainer.epoch, epochs):
            t0 = time.time()
            last_batch = None
            # --profile_dir records a jax.profiler trace of the first
            # epoch (viewable in TensorBoard/Perfetto)
            prof = (trace(profile_dir) if profile_dir
                    and epoch == start_epoch else contextlib.nullcontext())
            prof.__enter__()

            # fresh augmentation stream per epoch: folding the epoch in
            # prevents consecutive epochs replaying (almost) the same
            # split() chain of keys
            def to_device(raw, _rng_box=[jax.random.fold_in(rng, epoch)]):
                _rng_box[0], k = jax.random.split(_rng_box[0])
                return _device_batch(raw, aug_cfg, k, with_mask=use_masks,
                                     with_alpha_features=with_alpha_feats,
                                     latent_taps=latent_taps)

            # background thread keeps 2 device-ready batches ahead;
            # steps_per_dispatch > 1 scans N optimizer steps inside one
            # device program (amortizes the tunnel's per-program floor)
            spd = int(merged.get("steps_per_dispatch", 1) or 1)
            prefetch = prefetch_epoch(sampler, batch_size, to_device)
            try:
                buf = []
                for batch in prefetch:
                    last_batch = batch
                    if spd <= 1:
                        trainer.train(batch)
                        _beat()
                        continue
                    buf.append(batch)
                    if len(buf) == spd:
                        trainer.train_many(jax.tree_util.tree_map(
                            lambda *xs: jnp.stack(xs), *buf))
                        _beat()
                        buf = []
                for batch in buf:  # remainder of the epoch
                    trainer.train(batch)
                    _beat()
            finally:
                # stop the worker even on interrupt/step failure — an
                # abandoned iterator would leak the thread + queued
                # device batches
                prefetch.close()
                prof.__exit__(None, None, None)
            rng, _ = jax.random.split(rng)
            # end-of-epoch validation over several batches so best-model
            # selection averages a real estimate rather than one noisy
            # batch (reference validates a dedicated batch per epoch,
            # train_cardiac_aesr.py:179-189; we widen it)
            n_val = int(merged.get("num_val_batches", 4) or 4)
            val_batch = None
            for _ in range(n_val):
                rng, k = jax.random.split(rng)
                val_raw = val_sampler.sample_batch(test_batch_size)
                val_batch = _device_batch(
                    val_raw, val_cfg, k, with_mask=use_masks,
                    with_alpha_features=with_alpha_feats,
                    latent_taps=latent_taps)
                trainer.validate(val_batch)
                _beat()
            trainer.show_loss_on_tensorboard("train")
            trainer.show_loss_on_tensorboard("test")

            if last_batch is None:
                raise ValueError(
                    f"epoch {epoch} produced 0 training batches — the "
                    f"dataset has fewer slices ({len(sampler)}) than "
                    f"batch_size ({batch_size})")
            if verbose:
                tr = trainer.mean_losses["loss_ae"][-1]
                te = trainer.mean_losses_test["loss_ae"][-1]
                print(f"epoch {epoch:4d}  loss_ae={tr:.5f} "
                      f"val={te:.5f}  ({time.time() - t0:.1f}s)")

            # image dumps (reference: base_trainer.py:395-420)
            dump_every = int(merged.get("image_dump_interval", 1) or 0)
            if main_proc and last_batch is not None \
                    and trainer.test_predictions \
                    and dump_every > 0 and epoch % dump_every == 0:
                grid = generate_recon_grid(
                    np.asarray(val_batch["image"]),
                    np.asarray(trainer.test_predictions["reconstruction"]))
                save_image_grid(grid, os.path.join(
                    trainer.dir_images, f"val_recons_e{epoch:03d}.png"))
                trainer.log_tb_image("val/reconstructions", grid)
                _beat()  # grid fetch completed — real device progress

            # synthesized-volume previews: super-resolve a held-out val
            # volume and dump the original-vs-synth compare grid — the
            # reference's main training-time QA signal
            # (reference: base_trainer.py:149-162 _generate_val_volumes,
            # evaluate/evaluate_image.py:82-107)
            if main_proc:
                _generate_volume_previews(trainer, val_vols, merged, epoch)
                _beat()  # whole-volume synthesis is slow but IS progress

            if merged.get("log_tensorboard") and epoch % 10 == 0:
                trainer.log_tb_histograms()
            trainer.reset_losses()
            # checkpoint writes fetch params from the device — keep the
            # watchdog armed (a hung fetch IS a stall) but beat after
            trainer.end_epoch_processing()
            _beat()
            if not main_proc and watchdog is not None:
                # Non-main hosts now block in the next epoch's first
                # collective while main runs its serial preview /
                # checkpoint phase — that wait is main's progress, not a
                # stall here. Disarm until our next completed step beats
                # (main's own watchdog still covers a hung backend).
                watchdog.pause()
    except KeyboardInterrupt:
        if watchdog is not None:
            watchdog.stop()
        # save into the rolling checkpoint, NOT a numbered file: the
        # reference writes '{epoch}.models' here
        # (train_cardiac_aesr.py:198-201), but a numbered name means
        # "epoch N completed" everywhere else — find_best sweeps would
        # score mid-epoch partial weights (or a duplicate of the
        # previous epoch) as a finished epoch. Stored epoch =
        # trainer.epoch, so --auto_resume reruns the interrupted epoch.
        fname = os.path.join(trainer.dir_models, "last.models")
        trainer.save_models(fname, trainer.epoch)
        print(f"interrupted — saved {fname} (epoch {trainer.epoch})")
    finally:
        if watchdog is not None:
            watchdog.stop()
    return trainer
