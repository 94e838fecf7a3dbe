"""Jitted train/val steps for every model family.

The reference implements training as a class hierarchy of stateful
trainers (reference: kwatsch/trainer_ae.py AEBaseTrainer,
kwatsch/cardiac/trainer_ae.py AETrainerEndToEnd,
kwatsch/brain/trainer_ae.py AETrainerBrain/Extension1,
kwatsch/trainer_vae.py VAETrainer, kwatsch/trainer_acai.py ACAITrainer,
kwatsch/sr_multi_channel/trainer_ae.py MultiChannel*). Here each family
is ONE pure loss function selected by config, compiled into a single XLA
program containing model forward, loss networks, backward and the Adam
update — the TPU-native replacement for the reference's 2-GPU
model/loss-network split (kwatsch/base_trainer.py:33-56).

Batch contract (see data.transforms.prepare_batch_pairs):
  image        [2B, H, W, C]   from-slices ∥ to-slices
  slice_between [B, H, W, C]
  alpha_from/alpha_to [B]      (0.5/0.5 for cardiac gap-2 sampling)
  loss_mask    [B, H, W, 1]    optional

The step returns (new_state, metrics-dict) with the reference's loss
keys (loss_ae, loss_ae_dist, loss_laploss, loss_latent_1, loss_latent_2,
loss_ae_dist_extra, kl_loss, loss_disc) so logging/selection semantics
carry over unchanged.
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from ..ops import (bce_sum_over_batch, dice_loss, kl_standard_normal,
                   lap_loss, latent_mix, latent_mix_cubic,
                   latent_mix_lanczos3, lpips_distance, mse)

Array = jax.Array

FAMILY_OF_MODEL = {
    # reference model flag → loss family
    "ae": "ae", "aesr": "ae",
    "ae_combined": "ae_combined", "aesr_combined": "ae_combined",
    "vae": "vae", "vae_combined": "vae", "vae2": "vae",
    "acai": "acai", "acai_combined": "acai",
    "multichannel": "multichannel",
    "multichannel_combined": "multichannel_combined",
    "alpha": "alpha",
    "alpha_end_to_end": "alpha",
    "alpha_only": "alpha",
    "alpha_combined": "alpha",
}


@dataclasses.dataclass(frozen=True)
class LossConfig:
    """Static loss configuration (hashable → one compile per config)."""

    model: str = "ae_combined"
    recon_loss: str = "mse"               # 'mse' | 'perceptual'
    use_laploss: bool = False
    # adds 0.135*(1 - SSIM(win=11)) to the MSE recon loss (reference
    # semantics at base_trainer.py:179-181; the reference itself disabled
    # the flag after a torch upgrade, trainer_ae.py:61-63 — we implement
    # it with the differentiable JAX SSIM kernel)
    use_ssim_loss: bool = False
    image_mix_loss_func: Optional[str] = None  # 'mse' | 'perceptual' | None
    use_extra_latent_loss: bool = False
    use_masks: bool = False
    # 'cubic' trains the synthesis loss through the same 4-tap
    # Catmull-Rom latent mix the cubic inference path decodes
    # (ops.latent_mix_cubic) — the batch then carries an 'outer' key
    # (outward z-neighbour pair, TripletSampler(latent_taps=4)).
    # ae/ae_combined family only; an extension the reference lacks.
    train_latent_interp: str = "linear"
    # VAE
    vae_beta: float = 0.0
    lamb: float = 1.0
    # ACAI
    lamb_reg_acai: float = 0.5
    gamma_reg_acai: float = 0.2
    # multichannel
    nclasses: int = 4
    dice_weight: float = 0.1
    # alpha probes: coefficient count & scheme
    # (reference: base_alpha_trainer.py:141-154 _determine_num_alphas;
    #  schemes at base_alpha_trainer.py:98-126)
    num_alphas: int = 32
    # scheme name derived from the probe CLASS (trainer.alpha_mix_scheme)
    # — dispatching on num_alphas alone collides for unusual latents
    alpha_scheme: str = ""
    latent: int = 16
    # LPIPS VGG stack precision: 'bfloat16' rides the model's
    # mixed-precision setting (MXU-native; distance accumulation stays
    # float32 inside lpips_distance, so no grad scaling is needed)
    lpips_dtype: str = "float32"

    @property
    def family(self) -> str:
        return FAMILY_OF_MODEL[self.model]

    @property
    def combined(self) -> bool:
        return "combined" in self.model


def _variables(params, batch_stats):
    v = {"params": params}
    if batch_stats:
        v["batch_stats"] = batch_stats
    return v


def _apply(model, params, batch_stats, fn, *args, train: bool):
    """Apply a bound-method computation; returns (out, new_batch_stats)."""
    if train and batch_stats:
        out, mut = model.apply(_variables(params, batch_stats), *args,
                               method=fn, mutable=["batch_stats"])
        return out, mut["batch_stats"]
    out = model.apply(_variables(params, batch_stats), *args, method=fn)
    return out, batch_stats


def _recon_loss(cfg: LossConfig, lpips_params, pred, target):
    """Reconstruction loss dispatch (reference: base_trainer.py:164-198).
    Returns (loss_ae, loss_ae_dist, loss_laploss)."""
    if cfg.recon_loss == "perceptual_enc" and lpips_params is not None:
        # encoder-backbone perceptual (ops/perceptual.py) — scale-
        # calibrated to MSE magnitude by tools/fit_perceptual_head.py,
        # so it rides the same loss weights
        from ..ops.perceptual import enc_lpips_distance
        dist = jnp.mean(enc_lpips_distance(
            lpips_params, pred, target, compute_dtype=cfg.lpips_dtype))
    elif cfg.recon_loss == "perceptual" and lpips_params is not None:
        dist = jnp.mean(lpips_distance(lpips_params, pred, target,
                                       normalize=True,
                                       compute_dtype=cfg.lpips_dtype))
    else:
        dist = mse(pred, target)
        if cfg.use_ssim_loss:
            from ..ops import ssim_volume
            s = jnp.mean(ssim_volume(pred[..., 0], target[..., 0],
                                     data_range=1.0, win_size=11))
            dist = dist + 0.135 * (1.0 - s)
    # the laplacian term applies in BOTH branches — the reference
    # computes it outside the perceptual/mse dispatch
    # (base_trainer.py:183-186: `if self.laploss is not None` after the
    # if/else, added to loss_ae unconditionally)
    lap = lap_loss(pred, target) if cfg.use_laploss else jnp.float32(0.0)
    return dist + lap, dist, lap


def _mix_image_loss(cfg: LossConfig, lpips_params, reference, synthesized,
                    mask, sample_weight=None):
    """Synthesis (extra image) loss (reference: cardiac/trainer_ae.py:103-130,
    brain/trainer_ae.py:196-242).

    ``sample_weight`` [B] masks out degenerate triplets — step-1 gaps
    where slice_between := an endpoint ('mix'/'adjacent' sampling emits
    is_inbetween=0 for those; they must not pull midpoint decodes toward
    endpoints). All-ones weights reproduce the unweighted loss exactly."""
    if (cfg.image_mix_loss_func in ("perceptual", "perceptual_enc")
            and lpips_params is not None):
        if cfg.image_mix_loss_func == "perceptual_enc":
            from ..ops.perceptual import enc_lpips_distance
            dist_fn = enc_lpips_distance
        else:
            dist_fn = lpips_distance
        if cfg.use_masks and mask is not None:
            d = dist_fn(lpips_params, reference * mask,
                        synthesized * mask, normalize=True,
                        compute_dtype=cfg.lpips_dtype)
        else:
            d = dist_fn(lpips_params, reference, synthesized,
                        normalize=True,
                        compute_dtype=cfg.lpips_dtype)
        if sample_weight is not None:
            return (jnp.sum(d * sample_weight)
                    / jnp.maximum(jnp.sum(sample_weight), 1.0))
        return jnp.mean(d)
    m = mask if (cfg.use_masks and mask is not None) else None
    if sample_weight is None:
        loss = mse(reference, synthesized, m)
    else:
        d = (reference - synthesized) ** 2
        if m is not None:
            d = d * m
        per_sample = jnp.mean(d, axis=tuple(range(1, d.ndim)))
        loss = (jnp.sum(per_sample * sample_weight)
                / jnp.maximum(jnp.sum(sample_weight), 1.0))
    if cfg.use_laploss:
        # (reference adds the lap term only in this mse branch,
        # brain/trainer_ae.py:218-221 — the perceptual branch above
        # returns without it, matching get_extra_image_loss)
        if sample_weight is None:
            loss = loss + lap_loss(synthesized, reference)
        else:
            # degenerate (is_inbetween=0) triplets must not contribute
            # lap gradients either — weight the per-sample pyramids
            per = jax.vmap(lambda s, r: lap_loss(s[None], r[None]))(
                synthesized, reference)
            loss = loss + (jnp.sum(per * sample_weight)
                           / jnp.maximum(jnp.sum(sample_weight), 1.0))
    return loss


# ---------------------------------------------------------------------------
# family losses
# ---------------------------------------------------------------------------

def _wmse(a: Array, b: Array, sample_weight) -> Array:
    """mse with the optional per-sample (is_inbetween) degenerate-triplet
    guard — the latent twin of _mix_image_loss's weighting, so step-1
    triplets (slice_between := an endpoint) don't pull the probe/encoder
    to map midpoint mixes onto endpoint encodings. ``None`` weights
    reproduce plain mse exactly."""
    if sample_weight is None:
        return mse(a, b)
    per = jnp.mean((a - b) ** 2, axis=tuple(range(1, a.ndim)))
    return jnp.sum(per * sample_weight) / jnp.maximum(
        jnp.sum(sample_weight), 1.0)


def _train_latent_mix(model, cfg, params, batch_stats, z, batch,
                      train: bool = True):
    """The (ae-family) training latent mix: the reference's 2-tap lerp,
    the 4-tap Catmull-Rom spline when cfg.train_latent_interp is
    'cubic', or the 6-tap lanczos kernel when 'lanczos3' — then the
    outward-neighbour pair(s) (batch['outer'][, 'outer2'],
    TripletSampler(latent_taps=4/6)) are encoded under the
    already-updated batch statistics (auxiliary encode: batch-stat
    normalisation without advancing the running stats, like the other
    aux encodes here)."""
    if cfg.train_latent_interp == "cubic":
        if "outer" not in batch:
            raise ValueError(
                "train_latent_interp='cubic' needs the batch to carry "
                "'outer' (outward z-neighbour pair) — build batches "
                "from TripletSampler(latent_taps=4) via "
                "prepare_batch_quintets")
        z_outer, _ = _apply(model, params, batch_stats,
                            lambda mdl, img: mdl.encode(img, train=train),
                            batch["outer"], train=train)
        return latent_mix_cubic(z, z_outer, batch["alpha_to"])
    if cfg.train_latent_interp == "lanczos3":
        if "outer" not in batch or "outer2" not in batch:
            raise ValueError(
                "train_latent_interp='lanczos3' needs the batch to "
                "carry 'outer' AND 'outer2' (one/two pair steps out) — "
                "build batches from TripletSampler(latent_taps=6) via "
                "prepare_batch_septets")
        # one encode covers both outward pairs (same aux-encode BN
        # semantics as the cubic branch: batch-stat normalisation
        # without advancing the running stats)
        n2 = batch["outer"].shape[0]
        z_out, _ = _apply(model, params, batch_stats,
                          lambda mdl, img: mdl.encode(img, train=train),
                          jnp.concatenate([batch["outer"],
                                           batch["outer2"]], axis=0),
                          train=train)
        return latent_mix_lanczos3(z, z_out[:n2], z_out[n2:],
                                   batch["alpha_to"])
    return latent_mix(z, batch["alpha_from"], batch["alpha_to"])


def _ae_losses(model, cfg, lpips_params, params, batch_stats, batch,
               mix_weight):
    """'ae' and 'ae_combined' families
    (reference: trainer_ae.py:71-109, cardiac/trainer_ae.py:10-50,
    brain/trainer_ae.py:49-132)."""
    x = batch["image"]
    between = batch["slice_between"]
    mask = batch.get("loss_mask")

    def fwd(mdl, inp):
        z = mdl.encode(inp, train=True)
        out = mdl.decode(z, train=True)
        return z, out

    (z, out), new_bs = _apply(model, params, batch_stats, fwd, x, train=True)
    loss_ae, loss_dist, loss_lap = _recon_loss(cfg, lpips_params, out, x)

    z_mix = _train_latent_mix(model, cfg, params, new_bs, z, batch)
    # decode of the mix and auxiliary encodes run with batch-statistics
    # normalisation (train mode) but do not advance running stats — the
    # single canonical BN update comes from the main forward above.
    s_mix, _ = _apply(model, params, new_bs,
                      lambda mdl, zz: mdl.decode(zz, train=True),
                      z_mix, train=True)
    z_ref, _ = _apply(model, params, new_bs,
                      lambda mdl, img: mdl.encode(img, train=True),
                      between, train=True)

    metrics = {
        "loss_ae_dist": loss_dist,
        "loss_laploss": loss_lap,
        "loss_latent_1": jax.lax.stop_gradient(mse(z_mix, z_ref)),
    }

    if cfg.family == "ae_combined":
        sw = batch.get("is_inbetween")
        loss_mix = _mix_image_loss(cfg, lpips_params, between, s_mix, mask,
                                   sample_weight=sw)
        loss_extra = mix_weight * loss_mix
        if cfg.use_extra_latent_loss:
            z_syn, _ = _apply(model, params, new_bs,
                              lambda mdl, img: mdl.encode(img, train=True),
                              s_mix, train=True)
            l_lat1 = _wmse(z_ref, z_mix, sw)
            l_lat2 = _wmse(z_ref, z_syn, sw)
            loss_extra = loss_extra + 0.5 * (l_lat1 + l_lat2)
            metrics["loss_latent_2"] = l_lat2
        loss_ae = loss_ae + loss_extra
        # logged WEIGHTED, like the reference (cardiac/trainer_ae.py:97
        # appends loss_extra_image AFTER ex_loss_weight1/annealing is
        # applied) — under --use_loss_annealing the caisr.models
        # selection metric decays with the schedule, and matching that
        # keeps best-epoch selection identical to the reference
        metrics["loss_ae_dist_extra"] = jax.lax.stop_gradient(
            mix_weight * loss_mix)
        metrics["loss_ae_extra"] = jax.lax.stop_gradient(loss_extra)
    # else 'ae': the latent loss stays monitor-only — nothing to add

    metrics["loss_ae"] = loss_ae
    aux = {"reconstruction": out, "slice_inbetween_mix": s_mix, "z_mix": z_mix}
    return loss_ae, (new_bs, metrics, aux)


def _vae_losses(model, cfg, lpips_params, params, batch_stats, batch,
                mix_weight, rng):
    """'vae'/'vae_combined'/'vae2' (reference: trainer_vae.py:24-107)."""
    x = batch["image"]
    between = batch["slice_between"]
    mask = batch.get("loss_mask")

    def fwd(mdl, inp, key):
        z_conv = mdl.encode(inp, train=True)
        mu, logvar = mdl.heads(z_conv)
        z_flat = mdl.reparametrize(key, mu, logvar)
        z = mdl.unflatten(z_flat)
        out = mdl.decode(z, train=True)
        return mu, logvar, z, out

    (mu, logvar, z, out), new_bs = _apply(model, params, batch_stats, fwd,
                                          x, rng, train=True)
    recon = bce_sum_over_batch(out, x)
    kl = kl_standard_normal(mu, logvar)
    loss_ae = cfg.lamb * recon + cfg.vae_beta * kl

    z_mix = latent_mix(z, batch["alpha_from"], batch["alpha_to"])
    s_mix, _ = _apply(model, params, new_bs,
                      lambda mdl, zz: mdl.decode(zz, train=True),
                      z_mix, train=True)

    # monitored interpolation-quality signal: mse(z_mix, encode(between))
    # through the mu bottleneck (reference: trainer_vae.py:72 logs
    # loss_latent_1 from synthesize_batch_images(compute_latent_loss=True))
    def enc_mu(mdl, img):
        z_conv = mdl.encode(img, train=True)
        mu, _logvar = mdl.heads(z_conv)
        return mdl.unflatten(mu)

    z_ref, _ = _apply(model, params, new_bs, enc_mu, between, train=True)
    metrics = {
        "loss_ae_dist": jax.lax.stop_gradient(recon),
        "kl_loss": jax.lax.stop_gradient(cfg.vae_beta * kl),
        "loss_latent_1": jax.lax.stop_gradient(mse(z_mix, z_ref)),
    }
    if cfg.combined:
        sw = batch.get("is_inbetween")
        loss_mix = _mix_image_loss(cfg, lpips_params, between, s_mix, mask,
                                   sample_weight=sw)
        loss_extra = mix_weight * loss_mix
        if cfg.use_extra_latent_loss:
            # trained latent terms (reference VAETrainer inherits
            # AETrainerExtension1Brain.get_extra_loss,
            # brain/trainer_ae.py:163-179; encodes through the mu
            # bottleneck — the shape-consistent reading of the
            # reference's self.model.encode here)
            z_syn, _ = _apply(model, params, new_bs, enc_mu, s_mix,
                              train=True)
            l_lat1 = _wmse(z_ref, z_mix, sw)
            l_lat2 = _wmse(z_ref, z_syn, sw)
            loss_extra = loss_extra + 0.5 * (l_lat1 + l_lat2)
            metrics["loss_latent_2"] = jax.lax.stop_gradient(l_lat2)
        loss_ae = loss_ae + loss_extra
        # weighted, like the reference logs it (see _ae_losses)
        metrics["loss_ae_dist_extra"] = jax.lax.stop_gradient(
            mix_weight * loss_mix)
    metrics["loss_ae"] = loss_ae
    aux = {"reconstruction": out, "slice_inbetween_mix": s_mix, "z_mix": z_mix}
    return loss_ae, (new_bs, metrics, aux)


def _acai_losses(models, cfg, lpips_params, params, batch_stats, batch,
                 mix_weight, rng):
    """'acai'/'acai_combined' (reference: trainer_acai.py:46-125).

    ``params``/``batch_stats`` are {'ae': ..., 'disc': ...} trees; the
    total loss is loss_ae + loss_disc, whose gradients wrt each group
    reproduce the reference's twin backward/step exactly (both backward
    calls accumulate into both networks before each optimizer steps).
    """
    ae, disc = models["ae"], models["disc"]
    x = batch["image"]
    between = batch["slice_between"]
    mask = batch.get("loss_mask")
    b = x.shape[0] // 2

    def fwd(mdl, inp):
        z = mdl.encode(inp, train=True)
        out = mdl.decode(z, train=True)
        return z, out

    (z, out), new_bs_ae = _apply(ae, params["ae"], batch_stats["ae"], fwd, x,
                                 train=True)
    _, loss_dist, loss_lap = _recon_loss(cfg, lpips_params, out, x)

    # critic on the regularised reconstruction (gamma=0.2)
    disc_mix_reg = out + cfg.gamma_reg_acai * (x - out)
    d_reg, new_bs_disc = _apply(disc, params["disc"], batch_stats["disc"],
                                lambda mdl, img: mdl(img, train=True),
                                disc_mix_reg, train=True)
    loss_disc_l2 = jnp.mean(d_reg ** 2)

    alpha = jax.random.uniform(rng, (b,)) / 2.0  # U[0, 0.5)
    z_mix_d = latent_mix(z, alpha, 1.0 - alpha)
    out_mix, _ = _apply(ae, params["ae"], new_bs_ae,
                        lambda mdl, zz: mdl.decode(zz, train=True),
                        z_mix_d, train=True)
    d_mix, _ = _apply(disc, params["disc"], new_bs_disc,
                      lambda mdl, img: mdl(img, train=True),
                      out_mix, train=True)
    loss_ae_l2 = jnp.mean(d_mix ** 2)
    loss_disc_dist = jnp.mean((d_mix - alpha) ** 2)

    # the ACAI objective uses loss_ae_DIST only — the reference computes
    # the laplacian (logged via get_loss) but indexes ['loss_ae_dist']
    # for the trained loss (trainer_acai.py:61-64), so lap never enters
    # the ACAI gradient even with --use_laploss
    loss_ae_full = loss_dist + cfg.lamb_reg_acai * loss_ae_l2
    loss_disc = loss_disc_dist + loss_disc_l2

    # synthesis branch with the batch's true alphas
    z_mix = latent_mix(z, batch["alpha_from"], batch["alpha_to"])
    s_mix, _ = _apply(ae, params["ae"], new_bs_ae,
                      lambda mdl, zz: mdl.decode(zz, train=True),
                      z_mix, train=True)
    # monitored interpolation-quality signal (reference:
    # trainer_acai.py:89 logs loss_latent_1 from
    # synthesize_batch_images(compute_latent_loss=True))
    z_ref, _ = _apply(ae, params["ae"], new_bs_ae,
                      lambda mdl, img: mdl.encode(img, train=True),
                      between, train=True)
    metrics = {
        "loss_ae_dist": loss_dist,
        "loss_laploss": loss_lap,
        "loss_disc": jax.lax.stop_gradient(loss_disc),
        "loss_latent_1": jax.lax.stop_gradient(mse(z_mix, z_ref)),
    }
    if cfg.combined:
        sw = batch.get("is_inbetween")
        loss_mix = _mix_image_loss(cfg, lpips_params, between, s_mix, mask,
                                   sample_weight=sw)
        loss_extra = mix_weight * loss_mix
        if cfg.use_extra_latent_loss:
            # trained latent terms (reference ACAITrainer inherits
            # AETrainerExtension1Brain.get_extra_loss,
            # brain/trainer_ae.py:163-179)
            z_syn, _ = _apply(ae, params["ae"], new_bs_ae,
                              lambda mdl, img: mdl.encode(img, train=True),
                              s_mix, train=True)
            l_lat1 = _wmse(z_ref, z_mix, sw)
            l_lat2 = _wmse(z_ref, z_syn, sw)
            loss_extra = loss_extra + 0.5 * (l_lat1 + l_lat2)
            metrics["loss_latent_2"] = jax.lax.stop_gradient(l_lat2)
        loss_ae_full = loss_ae_full + loss_extra
        # weighted, like the reference logs it (see _ae_losses)
        metrics["loss_ae_dist_extra"] = jax.lax.stop_gradient(
            mix_weight * loss_mix)

    total = loss_ae_full + loss_disc
    metrics["loss_ae"] = jax.lax.stop_gradient(loss_ae_full)
    new_bs = {"ae": new_bs_ae, "disc": new_bs_disc}
    aux = {"reconstruction": out, "slice_inbetween_mix": s_mix, "z_mix": z_mix}
    return total, (new_bs, metrics, aux)


def _multichannel_losses(model, cfg, lpips_params, params, batch_stats,
                         batch, mix_weight):
    """'multichannel'(_combined) — ACDCLBL
    (reference: sr_multi_channel/trainer_ae.py:79-130). ``image`` carries
    [image, labels] channels; recon loss on the image channel + 0.1*dice
    on soft probs vs integer labels."""
    x = batch["image"]                      # [2B, H, W, 2]
    between = batch["slice_between"]        # [B, H, W, 2]
    img_in = x[..., 0:1]
    labels = x[..., 1].astype(jnp.int32)

    def fwd(mdl, inp):
        z = mdl.encode(inp, train=True)
        out = mdl.decode(z, train=True)
        return z, out

    (z, out), new_bs = _apply(model, params, batch_stats, fwd, x, train=True)
    loss_ae, loss_dist, loss_lap = _recon_loss(cfg, lpips_params,
                                               out["image"], img_in)
    loss_labels = cfg.dice_weight * dice_loss(out["soft_probs"], labels,
                                              cfg.nclasses)
    total = loss_ae + loss_labels

    z_mix = latent_mix(z, batch["alpha_from"], batch["alpha_to"])
    s_mix, _ = _apply(model, params, new_bs,
                      lambda mdl, zz: mdl.decode(zz, train=True),
                      z_mix, train=True)
    # monitored latent signal: mse(z_mix, encode(between)) at the fixed
    # 0.5 mix, no grad (reference: sr_multi_channel/trainer_ae.py:96-111
    # get_latent_loss(no_grad=True) logged as loss_latent_1)
    z_ref, _ = _apply(model, params, new_bs,
                      lambda mdl, img: mdl.encode(img, train=True),
                      between, train=True)
    metrics = {
        "loss_ae_dist": loss_dist,
        "loss_laploss": loss_lap,
        "loss_label": jax.lax.stop_gradient(loss_labels),
        "loss_latent_1": jax.lax.stop_gradient(mse(z_mix, z_ref)),
    }
    if cfg.family == "multichannel_combined":
        loss_mix = _mix_image_loss(cfg, lpips_params, between[..., 0:1],
                                   s_mix["image"], None,
                                   sample_weight=batch.get("is_inbetween"))
        # the reference's extra loss ALSO trains the label decoder on the
        # synthesized in-between: weight * Dice(soft_prob_mix, between
        # labels) (sr_multi_channel/trainer_ae.py:372-376, 412) — without
        # it the label head receives no gradient from interpolated
        # latents and synthesized segmentations are never optimized
        loss_mix_labels = dice_loss(s_mix["soft_probs"],
                                    between[..., 1].astype(jnp.int32),
                                    cfg.nclasses)
        total = total + mix_weight * (loss_mix + loss_mix_labels)
        # logged WEIGHTED like the reference (loss_extra_image /
        # loss_extra_labels after the ex_loss_weight1/annealing scale,
        # sr_multi_channel/trainer_ae.py:374-385); loss_ae_extra is the
        # reference's caisr-selection metric for this family
        metrics["loss_ae_dist_extra"] = jax.lax.stop_gradient(
            mix_weight * loss_mix)
        metrics["loss_ae_dist_labels"] = jax.lax.stop_gradient(
            mix_weight * loss_mix_labels)
        metrics["loss_ae_extra"] = jax.lax.stop_gradient(
            mix_weight * (loss_mix + loss_mix_labels))
    # reference logs loss_ae WITHOUT the dice term (logged separately as
    # loss_label; sr_multi_channel/trainer_ae.py:109-110) — the gradient
    # still flows through `total`
    metrics["loss_ae"] = jax.lax.stop_gradient(loss_ae)
    aux = {"reconstruction": out["image"],
           "slice_inbetween_mix": s_mix["image"], "z_mix": z_mix}
    return total, (new_bs, metrics, aux)


def alpha_mix(alpha: Array, z1: Array, z3: Array, num_alphas: int,
              latent: int, scheme: str = "") -> Array:
    """Apply a predicted-coefficient mixing scheme
    (reference: base_alpha_trainer.py:98-126 synthesize_batch_images).

    ``scheme`` ('pair' | 'convex' | 'halves' | 'spatial', from the probe
    class via trainer.alpha_mix_scheme) selects the mixing; the legacy
    count-based dispatch remains as a fallback for callers without a
    scheme but collides when unusual latent sizes make counts equal.
    """
    b = z1.shape[0]
    if not scheme:
        if num_alphas == 2:
            scheme = "pair"
        elif num_alphas == latent:
            scheme = "convex"
        elif num_alphas == 2 * latent:
            scheme = "halves"
        else:
            scheme = "spatial"
    if scheme == "pair":
        # rank-agnostic broadcast: a fixed [B,1,1,1] coefficient against
        # a dense [B,d] latent would silently outer-product into
        # [B,1,B,d] cross-sample garbage instead of erroring
        shape = (b,) + (1,) * (z1.ndim - 1)
        return (alpha[:, 0].reshape(shape) * z1
                + alpha[:, 1].reshape(shape) * z3)
    if z1.ndim != 4:
        raise ValueError(
            f"alpha_mix scheme {scheme!r} needs conv latents "
            f"[B, lw, lw, c], got shape {z1.shape} — only the 'pair' "
            f"scheme supports dense latents")
    if scheme == "convex":
        a = alpha[:, None, None, :]
        return a * z1 + (1.0 - a) * z3
    if scheme == "halves":
        a1 = alpha[:, None, None, :latent]
        a3 = alpha[:, None, None, latent:]
        return a1 * z1 + a3 * z3
    # spatial map: [B, lw*lw] → [B, lw, lw, 1]
    lw = z1.shape[1]
    a = alpha.reshape(b, lw, lw, 1)
    return a * z1 + (1.0 - a) * z3


def _alpha_losses(models, cfg, lpips_params, params, batch_stats, batch,
                  mix_weight):
    """Alpha-probe families, with the reference's exact per-variant
    gradient stops (reference: kwatsch/alpha/*):

      * 'alpha' (AlphaTrainer): probe INPUT detached
        (base_alpha_trainer.py:106 z_reshape.detach()) but z_mix built
        from LIVE latents — the latent loss trains encoder + probe;
        decode of z_mix and the z_ref/z_syn encodes run under no_grad.
      * 'alpha_end_to_end': nothing detached, full joint gradients
        (trainer_alpha.py:84-144 AlphaTrainerEndToEnd).
      * 'alpha_only': AE frozen in EVAL mode (trainer_alpha_only.py:22
        model.eval(), no_grad encode/decode); probe-only loss, image
        term weighted 0.005 (trainer_alpha_only.py:84).
      * 'alpha_combined': end-to-end + separate mix decoder
        (alpha_combined.py:40-146).

    ``mix_weight`` is unused (the reference weights image/latent 0.5/0.5,
    base_alpha_trainer.py:14-28; alpha_only 0.005/0.5).
    """
    variant = cfg.model
    ae, probe = models["ae"], models["probe"]
    dec_mix = models.get("decoder_mix")
    x = batch["image"]
    between = batch["slice_between"]
    mask = batch.get("loss_mask")
    b = x.shape[0] // 2
    feats = batch.get("alpha_features")
    if feats is None:
        # fail at trace time, not silently: the probe trained on zeros
        # would face REAL slice-geometry features at inference
        # (infer/alpha_interp.get_alpha_probe_features raises for the
        # same reason)
        raise KeyError(
            "alpha-family batches need 'alpha_features' [B, 5] "
            "(TripletSampler and RotoTripletSampler emit them; see "
            "data/pairs.py and data/synthetic.py)")

    # alpha_only keeps the loaded AE permanently in eval mode: running
    # BN averages, and its batch stats never advance
    ae_train = variant != "alpha_only"

    def fwd(mdl, inp):
        z = mdl.encode(inp, train=ae_train)
        return z, mdl.decode(z, train=ae_train)

    (z, out), new_bs_ae = _apply(ae, params["ae"], batch_stats["ae"], fwd, x,
                                 train=ae_train)
    if variant == "alpha_only":
        z = jax.lax.stop_gradient(z)
        out = jax.lax.stop_gradient(out)

    z1, z3 = z[:b], z[b:]
    if variant in ("alpha", "alpha_only"):
        # only the probe INPUT is detached; z_mix keeps live latents
        z_cat = jnp.concatenate([jax.lax.stop_gradient(z1),
                                 jax.lax.stop_gradient(z3)], axis=-1)
    else:
        z_cat = jnp.concatenate([z1, z3], axis=-1)
    alpha, new_bs_probe = _apply(
        probe, params["probe"], batch_stats["probe"],
        lambda mdl, zz, ff: mdl(zz, ff, train=True), z_cat, feats,
        train=True)
    z_mix = alpha_mix(alpha, z1, z3, cfg.num_alphas, cfg.latent,
                      cfg.alpha_scheme)

    if variant == "alpha_combined" and dec_mix is not None:
        s_mix, new_bs_dm = _apply(dec_mix, params["decoder_mix"],
                                  batch_stats.get("decoder_mix", {}),
                                  lambda mdl, zz: mdl(zz, train=True),
                                  z_mix, train=True)
    else:
        new_bs_dm = None
        s_mix, _ = _apply(ae, params["ae"], new_bs_ae,
                          lambda mdl, zz: mdl.decode(zz, train=ae_train),
                          z_mix, train=ae_train)
        if variant in ("alpha", "alpha_only"):
            # reference decodes under no_grad (base_alpha_trainer.py:118-121)
            s_mix = jax.lax.stop_gradient(s_mix)

    z_ref, _ = _apply(ae, params["ae"], new_bs_ae,
                      lambda mdl, img: mdl.encode(img, train=ae_train),
                      between, train=ae_train)
    z_syn, _ = _apply(ae, params["ae"], new_bs_ae,
                      lambda mdl, img: mdl.encode(img, train=ae_train),
                      s_mix, train=ae_train)
    if variant in ("alpha", "alpha_only"):
        z_ref = jax.lax.stop_gradient(z_ref)
        z_syn = jax.lax.stop_gradient(z_syn)

    loss_img = _mix_image_loss(cfg, lpips_params, between, s_mix, mask,
                               sample_weight=batch.get("is_inbetween"))
    l_lat1 = mse(z_ref, z_mix)
    l_lat2 = mse(z_ref, z_syn)
    # image-term weight: 0.5 (base_alpha_trainer.py:19) except
    # alpha_only's 0.005 (trainer_alpha_only.py:84)
    img_w = 0.005 if variant == "alpha_only" else 0.5
    loss_extra = img_w * loss_img + 0.5 * (l_lat1 + l_lat2)

    metrics = {
        "loss_latent_1": jax.lax.stop_gradient(l_lat1),
        "loss_latent_2": jax.lax.stop_gradient(l_lat2),
        "loss_ae_dist_extra": jax.lax.stop_gradient(loss_img),
        "loss_ae_extra": jax.lax.stop_gradient(loss_extra),
        "pred_alpha_mean": jax.lax.stop_gradient(jnp.mean(alpha)),
    }
    if variant == "alpha_only":
        total = loss_extra
        metrics["loss_ae_dist"] = jax.lax.stop_gradient(mse(out, x))
    else:
        loss_ae, loss_dist, loss_lap = _recon_loss(cfg, lpips_params, out, x)
        total = loss_ae + loss_extra
        metrics["loss_ae_dist"] = loss_dist
        metrics["loss_laploss"] = loss_lap
    metrics["loss_ae"] = total
    new_bs = dict(batch_stats)
    new_bs["ae"] = new_bs_ae
    new_bs["probe"] = new_bs_probe
    if new_bs_dm is not None:
        new_bs["decoder_mix"] = new_bs_dm
    aux = {"reconstruction": out, "slice_inbetween_mix": s_mix,
           "z_mix": z_mix, "pred_alphas": alpha}
    return total, (new_bs, metrics, aux)


# ---------------------------------------------------------------------------
# step builders
# ---------------------------------------------------------------------------

def _make_loss_fn(model, cfg: LossConfig, lpips_params):
    """Family-dispatch loss shared by the single-step and scanned
    multi-step builders."""
    family = cfg.family

    def loss_fn(params, batch_stats, batch, rng, mix_weight):
        if family in ("ae", "ae_combined"):
            return _ae_losses(model, cfg, lpips_params, params, batch_stats,
                              batch, mix_weight)
        if family == "vae":
            return _vae_losses(model, cfg, lpips_params, params, batch_stats,
                               batch, mix_weight, rng)
        if family == "acai":
            return _acai_losses(model, cfg, lpips_params, params, batch_stats,
                                batch, mix_weight, rng)
        if family in ("multichannel", "multichannel_combined"):
            return _multichannel_losses(model, cfg, lpips_params, params,
                                        batch_stats, batch, mix_weight)
        if family == "alpha":
            return _alpha_losses(model, cfg, lpips_params, params,
                                 batch_stats, batch, mix_weight)
        raise ValueError(f"unknown family {family}")

    return loss_fn


def _make_one_step(loss_fn):
    """grad → Adam update → batch_stats replace, shared by both builders."""

    def one_step(state, batch, rng, mix_weight):
        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        (_, (new_bs, metrics, _aux)), grads = grad_fn(
            state.params, state.batch_stats, batch, rng, mix_weight)
        state = state.apply_gradients(grads=grads)
        state = state.replace(batch_stats=new_bs)
        return state, metrics

    return one_step


def make_train_step(model, cfg: LossConfig, lpips_params=None,
                    donate: bool = True):
    """Build the jitted train step for a model family.

    ``model`` is a Flax module (or {'ae','disc'} dict for ACAI).
    Returns step(state, batch, rng, mix_weight) → (state, metrics).
    ``mix_weight`` is a traced scalar so weight annealing
    (reference: base_trainer.py:451-459) never recompiles.
    """
    one_step = _make_one_step(_make_loss_fn(model, cfg, lpips_params))
    if donate is None:
        # raw (unjitted) step — for callers that apply their own jit
        # with sharding annotations (parallel/mesh._make_sharded_step)
        return one_step
    return partial(jax.jit, donate_argnums=(0,) if donate else ())(one_step)


def make_multi_train_step(model, cfg: LossConfig, lpips_params=None,
                          donate: bool = True):
    """N optimizer steps per device dispatch: ``lax.scan`` over a stacked
    batch tree ([N, ...] leaves) inside ONE jitted program. Returns
    step(state, batches, rng, mix_weight) → (state, metrics-with-[N]-
    leading-axis); N is read from the batch leaves (one compile per N).

    Measured on the axon-tunneled v5e this is ~30% SLOWER per step than
    the pipelined single-step dispatch stream (13.3 vs 9.7 ms at the
    OASIS config): async dispatch already overlaps transport with
    compute, and the scan body cannot donate its carry buffers. Kept as
    an option (--steps_per_dispatch) for host-bound environments; the
    default stays 1.
    """
    one_step = _make_one_step(_make_loss_fn(model, cfg, lpips_params))

    @partial(jax.jit, donate_argnums=(0,) if donate else ())
    def multi_step(state, batches, rng, mix_weight):
        n = jax.tree_util.tree_leaves(batches)[0].shape[0]
        rngs = jax.random.split(rng, n)

        def body(st, xs):
            batch, r = xs
            return one_step(st, batch, r, mix_weight)

        return jax.lax.scan(body, state, (batches, rngs))

    return multi_step


def make_eval_step(model, cfg: LossConfig, lpips_params=None):
    """Validation step: eval-mode forward + the same loss decomposition
    (reference: base_trainer.py:67-99 validate)."""
    family = cfg.family

    @jax.jit
    def eval_step(params, batch_stats, batch, mix_weight=None):
        # ``mix_weight``: the ex_loss_weight1/annealed scale — the
        # reference logs the WEIGHTED extra losses on validation too
        # (get_extra_loss applies the weight before appending to
        # losses_test), and caisr.models selection reads those curves.
        # None (direct test callers) keeps the unweighted value.
        w = jnp.float32(1.0) if mix_weight is None else mix_weight
        x = batch["image"]
        between = batch["slice_between"]

        def fwd(mdl, inp):
            # the shared eval-mode forward (vae overrides: mu bottleneck)
            z = mdl.encode(inp, train=False)
            return z, mdl.decode(z, train=False)

        if family in ("multichannel", "multichannel_combined"):
            (z, out), _ = _apply(model, params, batch_stats, fwd, x,
                                 train=False)
            recon = out["image"]
            target = x[..., 0:1]
        elif family == "vae":
            def fwd_mu(mdl, inp):
                z_conv = mdl.encode(inp, train=False)
                mu, _ = mdl.heads(z_conv)
                z = mdl.unflatten(mu)
                return z, mdl.decode(z, train=False)
            (z, recon), _ = _apply(model, params, batch_stats, fwd_mu, x,
                                   train=False)
            target = x
        elif family in ("acai", "alpha"):
            (z, recon), _ = _apply(model["ae"], params["ae"],
                                   batch_stats["ae"], fwd, x, train=False)
            target = x
        else:
            (z, recon), _ = _apply(model, params, batch_stats, fwd, x,
                                   train=False)
            target = x

        if family == "vae":
            loss_dist = bce_sum_over_batch(recon, target)
            loss_ae = loss_dist
            lap = jnp.float32(0.0)
        else:
            loss_ae, loss_dist, lap = _recon_loss(cfg, lpips_params, recon,
                                                  target)

        aux_extra = {}
        if family == "alpha":
            # validation must measure the TRAINED probe, not a fixed 0.5
            # mix — the reference validates through
            # synthesize_batch_images(is_eval=True) with probe-predicted
            # coefficients (+ decoder_mix for alpha_combined), and
            # caisr.models selection hangs off this metric
            # (base_alpha_trainer.py:128-137)
            b = x.shape[0] // 2
            feats = batch.get("alpha_features")
            if feats is None:
                raise KeyError(
                    "alpha-family validation batches need "
                    "'alpha_features' [B, 5] (TripletSampler and "
                    "RotoTripletSampler emit them; see data/pairs.py "
                    "and data/synthetic.py)")
            z_cat = jnp.concatenate([z[:b], z[b:]], axis=-1)
            alpha, _ = _apply(model["probe"], params["probe"],
                              batch_stats.get("probe", {}),
                              lambda mdl, zz, ff: mdl(zz, ff, train=False),
                              z_cat, feats, train=False)
            z_mix = alpha_mix(alpha, z[:b], z[b:], cfg.num_alphas,
                              cfg.latent, cfg.alpha_scheme)
            aux_extra["pred_alphas"] = alpha
        elif family in ("ae", "ae_combined"):
            # cubic-aligned training validates through the same 4-tap
            # mix it trains (and serves) with; linear configs unchanged
            z_mix = _train_latent_mix(model, cfg, params, batch_stats, z,
                                      batch, train=False)
        else:
            z_mix = latent_mix(z, batch["alpha_from"], batch["alpha_to"])
        if family == "alpha" and "decoder_mix" in model:
            s_mix, _ = _apply(model["decoder_mix"], params["decoder_mix"],
                              batch_stats.get("decoder_mix", {}),
                              lambda mdl, zz: mdl(zz, train=False),
                              z_mix, train=False)
            z_ref, _ = _apply(model["ae"], params["ae"], batch_stats["ae"],
                              lambda mdl, img: mdl.encode(img, train=False),
                              between, train=False)
        elif family in ("acai", "alpha"):
            s_mix, _ = _apply(model["ae"], params["ae"], batch_stats["ae"],
                              lambda mdl, zz: mdl.decode(zz, train=False),
                              z_mix, train=False)
            z_ref, _ = _apply(model["ae"], params["ae"], batch_stats["ae"],
                              lambda mdl, img: mdl.encode(img, train=False),
                              between, train=False)
        elif family == "multichannel" or family == "multichannel_combined":
            s_mix_d, _ = _apply(model, params, batch_stats,
                                lambda mdl, zz: mdl.decode(zz, train=False),
                                z_mix, train=False)
            s_mix = s_mix_d["image"]
            z_ref, _ = _apply(model, params, batch_stats,
                              lambda mdl, img: mdl.encode(img, train=False),
                              between, train=False)
        elif family == "vae":
            s_mix, _ = _apply(model, params, batch_stats,
                              lambda mdl, zz: mdl.decode(zz, train=False),
                              z_mix, train=False)

            def enc_mu(mdl, img):
                z_conv = mdl.encode(img, train=False)
                mu, _logvar = mdl.heads(z_conv)
                return mdl.unflatten(mu)

            z_ref, _ = _apply(model, params, batch_stats, enc_mu, between,
                              train=False)
        else:
            s_mix, _ = _apply(model, params, batch_stats,
                              lambda mdl, zz: mdl.decode(zz, train=False),
                              z_mix, train=False)
            z_ref, _ = _apply(model, params, batch_stats,
                              lambda mdl, img: mdl.encode(img, train=False),
                              between, train=False)

        metrics = {
            "loss_ae": loss_ae,
            "loss_ae_dist": loss_dist,
            "loss_laploss": lap,
            "loss_latent_1": mse(z_mix, z_ref),
        }
        if cfg.combined or cfg.image_mix_loss_func is not None:
            if family in ("multichannel", "multichannel_combined"):
                # the multichannel train loss is UNmasked (reference:
                # sr_multi_channel/trainer_ae.py:388-414 — plain
                # mse/perceptual on the image channel); the eval metric
                # must score the same objective or best-model selection
                # optimizes something training never saw
                ref_img, mask = between[..., 0:1], None
            else:
                ref_img, mask = between, batch.get("loss_mask")
            loss_mix = _mix_image_loss(
                cfg, lpips_params, ref_img, s_mix, mask,
                sample_weight=batch.get("is_inbetween"))
            metrics["loss_ae_dist_extra"] = w * loss_mix
            if family == "multichannel_combined":
                # dice on the synthesized labels + the summed extra —
                # the reference's multichannel caisr selection metric
                # (sr_multi_channel/trainer_ae.py:376-381, 417-421)
                lm_lbl = dice_loss(s_mix_d["soft_probs"],
                                   between[..., 1].astype(jnp.int32),
                                   cfg.nclasses)
                metrics["loss_ae_dist_labels"] = w * lm_lbl
                metrics["loss_ae_extra"] = w * (loss_mix + lm_lbl)
        return metrics, {"reconstruction": recon,
                         "slice_inbetween_mix": s_mix, "z_mix": z_mix,
                         **aux_extra}

    return eval_step
