"""Fused batched epoch evaluation for checkpoint sweeps.

The reference's find_best_model loop synthesizes and scores one volume
at a time (reference: evaluate/find_best_model.py:43-109 →
create_HR_images.py:239-424), which on a tunneled TPU pays the per-
program dispatch floor (~5 ms measured) around ten times per volume.
Here one jitted program per shape-group runs synthesis AND per-slice
SSIM/PSNR/VIF/MSE for EVERY volume of the group at once (vmap over the
volume axis); the host only applies the synth/valid slice masks and
averages.

Semantics note: volumes whose slice count leaves a remainder
((S-1) % ds != 0) have their tail slices copied verbatim in the
reference pipeline; BOTH this evaluator and create_hr_images score only
the model-generated region (create_hr_images truncates at _n_scored),
so the two paths agree on tail-bearing volumes too — pinned by
tests/test_infer_eval.py's batched-vs-per-volume equivalence tests.

For multi-epoch sweeps, ``prepare_sweep_batches`` builds the padded
shape-group stacks ONCE and ``evaluate_prepared`` re-scores them per
checkpoint — only the params change between epochs, so regrouping and
restacking the whole validation set every epoch would be pure waste.
"""
from __future__ import annotations

from typing import Dict, Iterable, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..infer.super_volume import (_DECODE_ACT_BUDGET_BYTES,
                                  _auto_decode_batch, bucket_size,
                                  kept_slice_grid, make_kept_label_channel,
                                  make_synthesis_core,
                                  model_label_semantics)
from ..ops import psnr_volume, ssim_volume, synth_slice_mask, vif_volume


def make_sweep_evaluator(model, decode_batch: Optional[int] = None,
                         latent_interp: str = "linear"):
    """evaluate(params, batch_stats, kept [B,K,H,W,C], hr [B,S,H,W],
    alphas [A]) → per-slice metric stacks {'ssim','psnr','vif','sq'}
    each [B, min(S, (K-1)(A+1)+1)]. ``decode_batch`` bounds per-volume
    decoder activations exactly like create_super_volume's auto path
    (under the vmap it chunks each volume's decode, so in-flight bytes
    are B x decode_batch x HxWxdepth). ``latent_interp`` selects the
    latent z-mixing scheme (see infer.super_volume) — sweeping with the
    scheme you serve with keeps checkpoint selection aligned."""
    core = make_synthesis_core(model, decode_batch,
                               latent_interp=latent_interp)

    @jax.jit
    def evaluate(params, batch_stats, kept_stack, hr_stack, alphas):
        variables = {"params": params}
        if batch_stats:
            variables["batch_stats"] = batch_stats

        # synthesis runs flat-batched over the whole stack (the core
        # folds the volume axis into the conv batch — measured ~1.5x
        # over vmapping the core; see make_synthesis_core); only the
        # per-volume metrics vmap
        vols = core(variables, kept_stack, alphas, False, True)["volume"]
        vols = vols[..., 0]                        # [B, S_out, H, W]

        def one(vol, hr):
            n = min(vol.shape[0], hr.shape[0])     # static per group
            r, u = hr[:n], vol[:n]
            win = 7 if min(r.shape[1], r.shape[2]) >= 8 else 5
            return {
                "ssim": ssim_volume(r, u, 1.0, win),
                "psnr": psnr_volume(r, u, 1.0),
                "vif": vif_volume(r, u),
                "sq": jnp.mean((r - u) ** 2, axis=(1, 2)),
            }

        return jax.vmap(one)(vols, hr_stack)

    return evaluate


_SWEEP_CACHE: dict = {}


def _get_evaluator(trainer, decode_batch: Optional[int] = None,
                   latent_interp: str = "linear"):
    from ..infer.latent_taps import latent_interp_cache_token

    mdl = trainer._ae_model()
    key = (id(mdl), decode_batch, latent_interp_cache_token(latent_interp))
    if key not in _SWEEP_CACHE:
        _SWEEP_CACHE[key] = make_sweep_evaluator(mdl, decode_batch,
                                                 latent_interp)
    return _SWEEP_CACHE[key]


def prepare_sweep_batches(trainer, volumes: Iterable,
                          downsample_steps: int,
                          alpha_range=None) -> Dict:
    """Group/pad/stack the validation volumes once for repeated scoring.

    Returns an opaque dict for ``evaluate_prepared``: per shape-group a
    list of (kept_stack, hr_stack, meta) chunks whose size is bounded so
    the in-flight decoder activations stay under the same HBM budget as
    create_super_volume's auto decode path (model depth included), plus
    the per-volume decode chunking for long volumes. Stacks are host
    numpy — each evaluate_prepared call uploads them; what this saves
    across an N-epoch sweep is the O(N x dataset) regroup/pad/restack."""
    if alpha_range is None:
        alpha_range = np.linspace(0, 1, downsample_steps + 1)[1:-1]
    a_n = len(alpha_range)
    ds = int(downsample_steps)
    if a_n + 1 != ds:
        # interleaved-output stride is a_n+1; HR slice positions only
        # align when that equals the downsample stride
        raise ValueError(
            f"len(alpha_range)={a_n} must be downsample_steps-1={ds - 1} "
            "so synthesized slices align with the HR grid")

    # colors>=2 encoders (ACDCLBL families) take an image+label input
    # channel pair — ride the volume's labels along the kept grid (zeros
    # when absent), via the SAME helper as create_super_volume
    needs_label_channel, _ = model_label_semantics(trainer)
    depth = getattr(getattr(trainer, "model_config", None), "depth", 32)

    from .metrics_driver import IdUniquifier

    groups: Dict[tuple, List] = {}
    frame_counts: Dict[str, int] = {}
    uniq = IdUniquifier()
    for vol in volumes:
        hr_full = np.asarray(
            vol.image_hr if vol.image_hr is not None else vol.image,
            np.float32)
        img_full = np.asarray(vol.image, np.float32)
        lbl_full = (np.asarray(vol.labels, np.float32)
                    if getattr(vol, "labels", None) is not None else None)
        if lbl_full is not None and lbl_full.shape != img_full.shape:
            lbl_full = None  # labels on a different grid
        # uniquify duplicate patient ids (ED/ES frames loaded as
        # separate volumes) — THE shared convention with create_hr_images
        pid = uniq.take(vol.patient_id)
        # 4D cardiac volumes score frame-by-frame, averaged per patient
        # (same convention as create_hr_images)
        if img_full.ndim == 4:
            frames = [(f"{pid}@{t}", img_full[t], hr_full[t],
                       None if lbl_full is None else lbl_full[t])
                      for t in range(img_full.shape[0])]
            frame_counts[pid] = img_full.shape[0]
        else:
            frames = [(pid, img_full, hr_full, lbl_full)]
        for pid, img, hr, lbl in frames:
            kept, remain = kept_slice_grid(img, ds)
            if needs_label_channel:
                klb = make_kept_label_channel(kept, lbl, ds, remain,
                                              "evaluate_volumes_batched")
                kept = np.stack([kept, klb], axis=-1)   # [K, H, W, 2]
            else:
                kept = kept[..., None]                  # [K, H, W, 1]
            k_true = kept.shape[0]
            k_pad = bucket_size(k_true)
            n_out = (k_pad - 1) * (a_n + 1) + 1
            # EDGE-replicated padding (not zeros): linear pairs never
            # read padded latents, but cubic's z[i+2] boundary tap does
            # — replication gives it the clamped edge latent, matching
            # create_super_volume's cubic pad rule; linear scores are
            # unaffected either way (valid masks drop padded outputs)
            kept_p = np.empty((k_pad,) + kept.shape[1:], np.float32)
            kept_p[:k_true] = kept
            kept_p[k_true:] = kept[-1]
            hr_p = np.zeros((n_out,) + hr.shape[1:], np.float32)
            n_valid = min((k_true - 1) * (a_n + 1) + 1, hr.shape[0])
            hr_p[:n_valid] = hr[:n_valid]
            key = (k_pad, img.shape[1], img.shape[2])
            groups.setdefault(key, []).append((pid, kept_p, hr_p, n_valid))

    chunks = []
    for key, items in groups.items():
        k_pad, h, w = key
        # same activation model as create_super_volume: recon+interp
        # decode in one concatenated call of n_dec slices, chunked to
        # decode_batch within each volume; the per-program volume count
        # then bounds B x in_flight under the same budget
        n_dec = k_pad + (k_pad - 1) * a_n
        decode_batch = _auto_decode_batch(n_dec, h, w, depth)
        in_flight = n_dec if decode_batch is None else decode_batch
        per_vol = in_flight * h * w * max(depth, 32) * 4 * 4
        max_b = max(1, int(_DECODE_ACT_BUDGET_BYTES // max(per_vol, 1)))
        for start in range(0, len(items), max_b):
            part = items[start:start + max_b]
            chunks.append({
                "kept": np.stack([it[1] for it in part]),
                "hr": np.stack([it[2] for it in part]),
                "meta": [(it[0], it[3]) for it in part],
                "decode_batch": decode_batch,
            })
    return {"chunks": chunks, "frame_counts": frame_counts,
            "alphas": np.asarray(alpha_range, np.float32), "ds": ds}


def evaluate_prepared(trainer, prep: Dict,
                      latent_interp: str = "linear") -> Dict[str, Dict]:
    """Score prepared batches against the trainer's CURRENT weights.
    Returns per-frame entries (``pid@t`` keys for 4D volumes)."""
    ds = prep["ds"]
    alphas = jnp.asarray(prep["alphas"])
    params, batch_stats = trainer._ae_params()
    results: Dict[str, Dict] = {}
    for chunk in prep["chunks"]:
        evaluator = _get_evaluator(trainer, chunk["decode_batch"],
                                   latent_interp)
        per_slice = evaluator(params, batch_stats,
                              jnp.asarray(chunk["kept"]),
                              jnp.asarray(chunk["hr"]), alphas)
        per_slice = {k: np.asarray(v) for k, v in per_slice.items()}
        for j, (pid, n_valid) in enumerate(chunk["meta"]):
            valid = np.zeros(per_slice["ssim"].shape[1], bool)
            valid[:n_valid] = True
            synth = synth_slice_mask(per_slice["ssim"].shape[1], ds,
                                     conv_interpol=False) & valid
            m = {}
            for name in ("ssim", "psnr", "vif"):
                vals = per_slice[name][j]
                # drop non-finite per-slice values (NaN VIF on
                # uniform slices, inf PSNR on exact copies) like the
                # non-batched path's masked_mean
                m[name] = _finite_mean(vals[valid])
                m[name + "_synth"] = _finite_mean(vals[synth])
            m["mse"] = float(np.mean(per_slice["sq"][j][valid]))
            results[pid] = m
    return results


def evaluate_volumes_batched(trainer, volumes: Iterable,
                             downsample_steps: int,
                             alpha_range=None,
                             per_frame: bool = False,
                             latent_interp: str = "linear"
                             ) -> Dict[str, Dict]:
    """Score a dataset of volumes against the trainer's current weights
    with one device program per shape-group. Returns
    {patient_id: metrics} with the create_hr_images metric keys.
    Duplicate patient ids keep every entry (``pid#2`` keys, like
    create_hr_images). ``per_frame=True`` keeps 4D volumes' per-frame
    entries (``pid@t`` keys) instead of folding them to a per-patient
    mean — the find_best_model sweep uses this so multi-frame patients
    weigh like the reference's global per-frame lists."""
    prep = prepare_sweep_batches(trainer, volumes, downsample_steps,
                                 alpha_range)
    results = evaluate_prepared(trainer, prep, latent_interp)
    if not per_frame:
        # fold per-frame entries back to per-patient means
        for pat, n_frames in prep["frame_counts"].items():
            frames = [results.pop(f"{pat}@{t}") for t in range(n_frames)]
            results[pat] = {k: float(np.mean([f[k] for f in frames]))
                            for k in frames[0]}
    return results


def _finite_mean(vals: np.ndarray) -> float:
    """Host-side twin of ops.masked_mean's semantics (non-finite entries
    dropped, NaN when nothing remains) — pinned against it by
    tests; keep the two in sync."""
    vals = vals[np.isfinite(vals)]
    return float(np.mean(vals)) if vals.size else float("nan")
