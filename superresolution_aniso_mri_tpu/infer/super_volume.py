"""Whole-volume super-resolution as a single jitted XLA program.

TPU-first re-design of the reference inference kernel
(reference: evaluate/common.py:134-235 create_super_volume,
kwatsch/img_interpolation.py:58-92 latent_space_interp,
generate_hr_volumes.py:12-69): instead of a Python loop over alpha values
with chunked encode/decode round trips, ALL kept slices are encoded in
one batch, all (K-1) x A mixed latents are built with one broadcasted
lerp, and all in-between slices decode in one batched call that keeps the
MXU busy; the interleave is a reshape, not a concat loop.

Slice ordering matches the reference exactly: between kept slices i and
i+1, the synthesized slice at mixing coefficient a is
``decode(a * z[i+1] + (1-a) * z[i])`` and alphas appear in increasing
order (reference passes images[1:] as the alpha-weighted operand —
evaluate/common.py:197-205).
"""
from __future__ import annotations

from functools import partial
from typing import Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


def _chunked_call_pervol(fn, x: Array, per_vol_chunk: Optional[int]):
    """Apply ``fn`` over the flattened [B*N] batch of a [B, N, ...]
    stack in chunks of ``per_vol_chunk`` slices PER VOLUME via
    ``lax.map``, keeping the volume axis leading in every step — peak
    HBM is bounded by B x chunk slices instead of the whole stack (the
    TPU equivalent of the reference's host-side chunking,
    kwatsch/base_trainer.py:216-323). ``per_vol_chunk=None`` runs one
    batched call — fastest when it fits.

    Chunking the SLICE axis (not the volume-major flat axis) matters
    for sharded serving: a run of consecutive flat rows lives on ~one
    device when the volume axis is mesh-sharded — every map step would
    reshard or serialize onto a single chip. Here each step processes
    [B, chunk] (all volumes, a slab of slices), so a volume-sharded
    stack stays shard-local through the whole loop.
    Returns [B, N, ...]."""
    b, n = x.shape[0], x.shape[1]

    def flat(t):
        return t.reshape((t.shape[0] * t.shape[1],) + t.shape[2:])

    if per_vol_chunk is None or n <= per_vol_chunk:
        out = fn(flat(x))
        return out.reshape((b, n) + out.shape[1:])
    pad = (-n) % per_vol_chunk
    xp = jnp.pad(x, ((0, 0), (0, pad)) + ((0, 0),) * (x.ndim - 2))
    nc = xp.shape[1] // per_vol_chunk
    xp = xp.reshape((b, nc, per_vol_chunk) + x.shape[2:])
    xp = jnp.moveaxis(xp, 1, 0)  # [nc, B, chunk, ...]

    def step(t):
        out = fn(flat(t))
        return out.reshape((b, per_vol_chunk) + out.shape[1:])

    out = jax.lax.map(step, xp)             # [nc, B, chunk, ...]
    out = jnp.moveaxis(out, 0, 1)           # [B, nc, chunk, ...]
    return out.reshape((b, nc * per_vol_chunk) + out.shape[3:])[:, :n]


def model_label_semantics(trainer):
    """(needs_label_channel, decodes_labels) for a trainer's primary
    model — the two DISTINCT label questions the volume pipeline asks.

    ``needs_label_channel``: the encoder stem takes [image, label] input
    channels (``model_config.colors >= 2`` — ACDCLBL-family data). True
    for BOTH the multichannel AE and a plain 2-channel AE (alpha
    families on ACDCLBL).

    ``decodes_labels``: the decode output's channel 1 carries argmax
    class ids that should be returned as ``upsampled_labels``. True ONLY
    for MultiChannelAE — the reference's with_labels path indexes
    ``recon_dict['pred_labels']``, which only the multichannel trainer
    returns (generate_hr_volumes.py:34-41; any other trainer crashes
    there). A plain 2-channel AE's decode channel 1 is a
    label-as-intensity reconstruction, NOT class ids — callers must fall
    back to the input-label ride-along for it.
    """
    from ..models.multi_channel import MultiChannelAE

    colors = int(getattr(getattr(trainer, "model_config", None),
                         "colors", 1) or 1)
    return colors >= 2, isinstance(trainer._ae_model(), MultiChannelAE)


def make_kept_label_channel(kept_images: np.ndarray, labels,
                            downsample_steps, remain: int,
                            context: str) -> np.ndarray:
    """Label plane on the kept-slice grid for ``colors >= 2`` encoders:
    tail-strip + stride the full-grid ``labels`` exactly like the image
    volume; zeros (with a warning) when labels are unavailable. Shared
    by create_super_volume and the batched sweep so the two paths cannot
    drift. Raises a clear error when the strided labels do not land on
    the kept image grid (e.g. ED/ES-only labels against a full volume)."""
    kept_images = np.asarray(kept_images)
    if labels is None:
        import warnings
        warnings.warn(
            f"multichannel volume synthesis without labels ({context}): "
            "feeding a zero label channel", stacklevel=3)
        return np.zeros(kept_images.shape, np.float32)
    lbl = np.asarray(labels, np.float32)
    if remain:
        lbl = lbl[:-remain]
    if downsample_steps is not None and int(downsample_steps) > 1:
        lbl = lbl[::int(downsample_steps)]
    if lbl.shape != kept_images.shape:
        raise ValueError(
            f"{context}: labels {np.asarray(labels).shape} do not lie on "
            f"the image grid — strided to {lbl.shape} but the kept image "
            f"grid is {kept_images.shape}; pass labels with one plane "
            "per image slice (or None for a zero channel)")
    return lbl


def kept_slice_grid(img, ds: int):
    """(kept, remain): strip the verbatim tail and stride to the kept
    grid — THE shared definition of which slices the model sees. One
    implementation for create_super_volume and the batched sweep so the
    tail semantics cannot drift between scoring paths."""
    s = img.shape[0]
    remain = (s - 1) % int(ds)
    return (img[:-remain] if remain else img)[::ds], remain


def clip_with_label_channel(vol, decodes_labels: bool):
    """[0,1]-clamp that exempts the decoded-label channel: class ids in
    channel 1 must survive untouched for MultiChannelAE outputs. One
    definition shared by the fused core and the host-side sharded
    interleave so the two paths stay bit-identical."""
    if decodes_labels:
        return jnp.concatenate(
            [jnp.clip(vol[..., :1], 0.0, 1.0), vol[..., 1:]], axis=-1)
    return jnp.clip(vol, 0.0, 1.0)


# latent z-interpolation schemes for the synthesis core: 'linear' is the
# reference's 2-tap lerp (kwatsch/img_interpolation.py:58-92); 'cubic' is
# a Catmull-Rom spline over the 4 neighbouring kept-slice latents — the
# latent-space analogue of the 4-tap conventional kernels (lanczos /
# b-spline) that out-resolve 2-tap linear blending in pixel space. An
# inference-only quality lever: no retraining, same decoder, same grid.
LATENT_INTERP_MODES = ("linear", "cubic", "lanczos3", "fitted")

# canonical definition lives in ops.losses (shared with the
# cubic-aligned training loss); re-exported here for inference callers
from ..ops import catmull_rom_weights, lanczos3_weights  # noqa: E402


# device-side narrowing cast for the readback_dtype='bfloat16' path
_readback_cast = jax.jit(lambda v: v.astype(jnp.bfloat16))


# tap offsets relative to the pair (z[i], z[i+1]) per multi-tap scheme:
# 'cubic' = Catmull-Rom over the 4 neighbours; 'lanczos3' = the radius-3
# lanczos kernel over 6 neighbours — the exact latent twin of the pixel
# baseline _interp_weights('lanczos') below. Edge taps clamp at the
# volume boundary (same index clamping as the pixel baselines).
from ..ops.losses import LANCZOS3_OFFSETS  # noqa: E402

_LATENT_TAP_OFFSETS = {"cubic": (-1, 0, 1, 2),
                       "lanczos3": LANCZOS3_OFFSETS}


# lanczos3_weights ([A] → [A, 6] over taps at offsets (-2..3)) lives in
# ops.losses so the lanczos3-aligned training loss shares the exact
# kernel with this serving path (like catmull_rom_weights).


def latent_tap_weights(mode: str, alphas: Array) -> Array:
    """[A] → [A, n_taps] mixing weights for a multi-tap latent scheme."""
    if mode == "cubic":
        return catmull_rom_weights(alphas)
    if mode == "lanczos3":
        return lanczos3_weights(alphas)
    raise ValueError(f"no tap weights for latent_interp={mode!r}")


def make_volume_synthesizer(model, decode_batch: Optional[int] = None,
                            packed: bool = False,
                            latent_interp: str = "linear"):
    """Build the jitted kernel for one model.

    Returns synth(params, batch_stats, kept [K,H,W,C], alphas [A],
    use_original) → dict with 'recon' [K,H,W,C] and 'interp'
    [K-1, A, H, W, C].

    ``decode_batch`` bounds the number of slices held in flight through
    the conv stacks: encode/decode run as a ``lax.map`` over
    ``decode_batch``-sized chunks, so arbitrarily long volumes (e.g.
    500 slices x 256^2 at ds=6 → ~2500 decode slices) cannot blow HBM.

    ``packed=True`` folds every nearest-2x upsample of the decoder into
    the following conv (space-to-depth packed lanes; see
    infer/packed_decoder.py) when the model's decoder has that shape;
    results are bit-identical. Measured on the v5e it is ~8% SLOWER than
    the plain path (XLA already fuses the reshape-broadcast upsample into
    the conv, and the depth-to-space reshuffles dominate), so it is off
    by default — kept as an option for other topologies. Re-measured in
    the flat-batch B=8 regime (where decode is ~78% of the program and
    the hypothesis was MXU-lane-bound): still 16% slower (13.5 vs 11.6
    ms/volume) — that regime is HBM-bound (74.6% util, roofline tool),
    and the packed layout's reshuffles add bytes, not lanes.
    """
    core = make_synthesis_core(model, decode_batch, packed,
                               latent_interp=latent_interp)

    @partial(jax.jit, static_argnames=("use_original", "interleave"))
    def synthesize(params, batch_stats, kept: Array, alphas: Array,
                   use_original: bool = False,
                   interleave: bool = False) -> Dict[str, Array]:
        variables = {"params": params}
        if batch_stats:
            variables["batch_stats"] = batch_stats
        return core(variables, kept, alphas, use_original, interleave)

    return synthesize


def make_batched_synthesizer(model, decode_batch: Optional[int] = None,
                             latent_interp: str = "linear",
                             packed: bool = False):
    """Jitted MULTI-volume kernel: one program synthesizes a stack of
    same-shaped volumes.

    Returns synth(params, batch_stats, kept [B,K,H,W,C], alphas [A],
    use_original) → interleaved+clamped volumes [B,(K-1)(A+1)+1,H,W,C].

    Batching volumes recovers the MXU efficiency the per-volume program
    leaves on the table at small slice counts: the encoder runs at
    ~4x higher throughput on 128-slice batches than on a single 30-slice
    OASIS volume (measured on v5e — 0.074 vs 0.308 ms/slice), and one
    dispatch covers B volumes, so the per-program launch floor of the
    tunneled chip amortizes too. The volume axis folds into the model's
    batch axis (flat [B*K] conv batches) rather than vmapping the core —
    measured 18.4 → 12 ms/volume on the v5e bench config; see the core's
    note. ``decode_batch`` bounds PER-VOLUME in-flight decode slices
    exactly like the single-volume path (in-flight bytes scale as
    B x decode_batch)."""
    core = make_synthesis_core(model, decode_batch, packed,
                               latent_interp=latent_interp)

    @partial(jax.jit, static_argnames=("use_original",))
    def synthesize(params, batch_stats, kept: Array, alphas: Array,
                   use_original: bool = False) -> Array:
        variables = {"params": params}
        if batch_stats:
            variables["batch_stats"] = batch_stats
        return core(variables, kept, alphas, use_original,
                    True)["volume"]

    return synthesize


def make_synthesis_core(model, decode_batch: Optional[int] = None,
                        packed: bool = False,
                        latent_interp: str = "linear"):
    """The un-jitted synthesis body shared by the single-volume
    synthesizer, the multi-volume synthesizer and the batched sweep
    evaluator (evaluate/sweep.py):
    core(variables, kept [K,H,W,C] or [B,K,H,W,C], alphas [A],
    use_original, interleave) → {'recon', 'interp'[, 'volume']}, with
    a leading volume axis on every output when the input carried one.

    ``latent_interp='cubic'`` mixes FOUR neighbouring latents per
    synthesized slice (Catmull-Rom, endpoint taps clamped at the volume
    edges) instead of the reference's 2-tap lerp. Callers that pad the
    kept-slice stack (bucket shapes / mesh divisibility) must pad with
    EDGE replication in this mode — zero-padding would leak encode(0)
    into the last real pair's z[i+2] tap (create_super_volume does)."""
    cfg = getattr(model, "config", None)
    from .latent_taps import (fitted_tap_weights, fitted_table_path,
                              is_fitted_mode, load_latent_taps)
    if is_fitted_mode(latent_interp):
        # 'fitted:<path>' — learned per-alpha tap weights (see
        # infer/latent_taps.py); table loaded once at build time, rows
        # interpolated in alpha inside the program
        table = load_latent_taps(fitted_table_path(latent_interp))
        tap_offsets = tuple(int(o) for o in table["offsets"])
        tap_weight_fn = partial(fitted_tap_weights, table["alphas"],
                                table["weights"])
    elif latent_interp in _LATENT_TAP_OFFSETS:
        tap_offsets = _LATENT_TAP_OFFSETS[latent_interp]
        tap_weight_fn = partial(latent_tap_weights, latent_interp)
    elif latent_interp == "linear":
        tap_offsets = tap_weight_fn = None
    else:
        raise ValueError(f"latent_interp must be one of "
                         f"{LATENT_INTERP_MODES} (fitted as "
                         f"'fitted:<table path>'), got {latent_interp!r}")

    # VAE family routes encode through the trained mu bottleneck
    # (heads -> mu -> unflatten), exactly like Trainer._encode_fn — raw
    # conv latents are a space the decoder was never trained on
    # (reference: trainer_vae.py:112-149 exec_vae_bottleneck)
    is_vae = hasattr(model, "heads") and hasattr(model, "unflatten")
    # multichannel (ACDCLBL) decode returns {'image','soft_probs'} —
    # the reference's with_labels path decodes BOTH heads and carries
    # pred_labels = argmax(soft_probs) through the interleave
    # (generate_hr_volumes.py:91-101, sr_multi_channel/trainer_ae.py:117);
    # here the label rides as output channel 1 so the core stays a
    # single array program
    from ..models.multi_channel import MultiChannelAE
    is_multichannel = isinstance(model, MultiChannelAE)

    def core(variables, kept: Array, alphas: Array,
             use_original: bool = False,
             interleave: bool = False) -> Dict[str, Array]:
        # accepts [K, H, W, C] (one volume) or [B, K, H, W, C] (a stack
        # of same-shaped volumes). The batched form folds the volume
        # axis into the model's batch axis — one flat [B*K] conv batch —
        # instead of vmapping the whole core over volumes: measured on
        # the v5e bench config, the vmapped-core program ran 18.4
        # ms/volume where the flat-batch program runs ~12 (the vmap
        # batch dim defeats layout/fusion choices XLA makes for the
        # plain conv stack). Per-volume results are bit-identical
        # either way (convs are per-sample; pinned by the batched-vs-
        # single equivalence tests).
        single = kept.ndim == 4
        if single:
            kept = kept[None]
        b, k = kept.shape[0], kept.shape[1]

        # in-plane sizes not divisible by the encoder's total stride
        # (2^scales) would come back smaller from the decoder (AvgPool
        # floors; e.g. ACDC's 1.4mm resample commonly yields odd dims) —
        # reflect-pad up front and crop every output back. The reference
        # torch pipeline simply crashes on such volumes (generate_hr_
        # volumes.py:56-60 torch.cat of mismatched sizes).
        h, w = kept.shape[2], kept.shape[3]
        div = (2 ** cfg.scales) if cfg is not None else 1
        ph, pw = (-h) % div, (-w) % div
        if ph or pw:
            kept = jnp.pad(kept,
                           ((0, 0), (0, 0), (0, ph), (0, pw), (0, 0)),
                           mode="reflect")

        def _crop(arr, axes):
            idx = [slice(None)] * arr.ndim
            idx[axes[0]], idx[axes[1]] = slice(0, h), slice(0, w)
            return arr[tuple(idx)]

        # decode_batch bounds PER-VOLUME in-flight slices (the single-
        # volume contract); each chunked step runs [B, decode_batch] so
        # b volumes are in flight and a mesh-sharded volume axis stays
        # shard-local across map steps (_chunked_call_pervol)
        chunk = decode_batch

        from .packed_decoder import make_packed_decoder, packable
        if packed and cfg is not None and packable(cfg, variables):
            packed_dec = make_packed_decoder(cfg)
            decode_fn = lambda zz: packed_dec(variables, zz)
        elif is_multichannel:
            def decode_fn(zz):
                out = model.apply(variables, zz, method=model.decode)
                lbl = jnp.argmax(out["soft_probs"], axis=-1)[..., None]
                return jnp.concatenate(
                    [out["image"], lbl.astype(out["image"].dtype)], axis=-1)
        else:
            decode_fn = lambda zz: model.apply(variables, zz,
                                               method=model.decode)
        if is_vae:
            def encode_fn(xx):
                z_conv = model.apply(variables, xx, method=model.encode)
                mu, _logvar = model.apply(variables, z_conv,
                                          method=model.heads)
                return model.apply(variables, mu, method=model.unflatten)
        else:
            encode_fn = lambda xx: model.apply(variables, xx,
                                               method=model.encode)

        z = _chunked_call_pervol(encode_fn, kept, chunk)  # [B,K,lw,lw,c]
        if cfg is not None:
            # carry latents in the model's COMPUTE dtype through the
            # mix: the [K + (K-1)A, 55, 55, C]-scale latent stacks are
            # the largest intermediates of the whole program, and the
            # decoder stem rounds to this dtype at its first conv
            # anyway — float32 plumbing would double their HBM traffic
            # for bf16 models (f32 models: identity)
            z = z.astype(cfg.dtype)

        # mixed latents laid out [K-1, A, ...] directly — no transpose of
        # the decoded stack, and ONE decoder pass covers reconstructions
        # and interpolants (fewer logical ops; the axon transport is
        # op-count-bound at ~20 µs/op, docs/STATUS.md)
        if tap_offsets is not None:
            # multi-tap scheme (analytic spline or fitted table) over
            # neighbouring kept-slice latents with edge-clamped taps:
            # for pair j, tap at offset o reads z[clip(j+o, 0, K-1)] —
            # the same index clamping as the pixel-space lanczos/bspline
            # baselines (_interp_weights). NB callers that pad the kept
            # stack must edge-replicate so the clamp lands on the true
            # boundary latent. Weights compute in f32 then mix in the
            # LATENT's dtype: f32 coefficients would promote the whole
            # [K-1, A, 55, 55, C] mixed-latent stack to float32 — for
            # bf16 models that doubles the largest intermediate's HBM
            # traffic for precision the decoder stem immediately rounds
            # away at its first bf16 conv.
            wts = tap_weight_fn(alphas).astype(z.dtype)  # [A, n_taps]
            # [1, 1, A, n, 1, 1, 1] — broadcast over volumes and pairs
            wts = wts[None, None, :, :, None, None, None]
            pair = jnp.arange(k - 1)
            z_mix = jnp.zeros((b, k - 1, alphas.shape[0]) + z.shape[2:],
                              z.dtype)
            for ti, off in enumerate(tap_offsets):
                tap = jnp.take(z, jnp.clip(pair + off, 0, k - 1), axis=1)
                z_mix = z_mix + wts[:, :, :, ti] * tap[:, :, None]
        else:
            # lerp in the latent's dtype (see multi-tap note above)
            a = alphas.astype(z.dtype)[None, None, :, None, None, None]
            one = jnp.ones((), z.dtype)
            z_mix = (a * z[:, 1:, None]
                     + (one - a) * z[:, :-1, None])  # [B, K-1, A, ...]
        k1, am = z_mix.shape[1], z_mix.shape[2]
        z_flat = z_mix.reshape((b, k1 * am) + z_mix.shape[3:])
        if use_original:
            dec = _chunked_call_pervol(decode_fn, z_flat, chunk)
            # multichannel kept is already [image, label] — matches the
            # 2-channel decode output (reference use_original keeps the
            # input labels verbatim, evaluate/common.py:190-193)
            recon = kept
            interp = dec.reshape((b, k1, am) + dec.shape[2:])
        else:
            z_all = jnp.concatenate([z, z_flat], axis=1)
            dec = _chunked_call_pervol(decode_fn, z_all, chunk)
            recon = dec[:, :k]
            interp = dec[:, k:].reshape((b, k1, am) + dec.shape[2:])
        if ph or pw:
            recon = _crop(recon, (2, 3))
            interp = _crop(interp, (3, 4))
        out = {"recon": recon, "interp": interp}
        if interleave:
            # full interleaved volume (+clamp) inside the same program —
            # a single device execution end to end; the multichannel
            # label channel holds class ids and must not be clamped
            out["volume"] = clip_with_label_channel(
                interleave_volume(recon, interp), is_multichannel)
        if single:
            out = {key: val[0] for key, val in out.items()}
        return out

    return core


def interleave_volume(recon: Array, interp: Array) -> Array:
    """[..., K, H, W, C] + [..., K-1, A, H, W, C] →
    [..., (K-1)(A+1)+1, H, W, C] (the reference's per-pair concat loop,
    evaluate/common.py:207-215, as one reshape). Leading batch dims
    (a stack of same-shaped volumes) pass through."""
    k = recon.shape[-4]
    a = interp.shape[-4]
    lead = recon.shape[:-4]
    body = jnp.concatenate(
        [recon[..., :-1, None, :, :, :], interp], axis=-4)
    body = body.reshape(lead + ((k - 1) * (a + 1),) + recon.shape[-3:])
    return jnp.concatenate([body, recon[..., -1:, :, :, :]], axis=-4)


def latent_space_interp(trainer, alpha: float, img1, img2):
    """Single-alpha pair interpolation (reference:
    kwatsch/img_interpolation.py:58-92, which routes through the SR
    model when one is loaded): returns
    decode(alpha * enc(img1) + (1-alpha) * enc(img2))."""
    z1 = trainer.encode(img1, use_sr_model=True)
    z2 = trainer.encode(img2, use_sr_model=True)
    return trainer.decode(alpha * z1 + (1.0 - alpha) * z2,
                          use_sr_model=True)


# Kept-slice-count buckets: volumes pad up to the next bucket so an
# epoch sweep over ragged datasets (30-500 slices/volume) compiles a
# handful of programs instead of one per distinct K (SURVEY §7
# "pad-and-mask bucket shapes"; the ~20 s/compile cost is the axon
# backend's, see docs/STATUS.md).
SLICE_BUCKETS = (8, 12, 16, 24, 32, 48, 64, 96, 128, 192, 256, 384, 512)

# HBM budget for in-flight decode activations before chunking engages
_DECODE_ACT_BUDGET_BYTES = 1 << 30


def bucket_size(k: int) -> int:
    """Next bucket ≥ k (beyond the table: next multiple of 128)."""
    for b in SLICE_BUCKETS:
        if k <= b:
            return b
    return ((k + 127) // 128) * 128


def _auto_decode_batch(n_total: int, h: int, w: int, depth: int) -> Optional[int]:
    """Chunk size bounding decoder activations to the HBM budget.

    The dominant activation is the full-resolution feature map
    (depth channels at H x W, float32) plus same-size fwd temporaries —
    budgeted with 4x headroom. Returns None when everything fits in one
    batched call (the fast path)."""
    per_slice = h * w * max(depth, 32) * 4 * 4
    cap = max(32, _DECODE_ACT_BUDGET_BYTES // max(per_slice, 1))
    return None if n_total <= cap else int(cap)


def _predict_chunked(trainer, kept, decode_batch):
    """trainer.predict in decode_batch-sized host chunks: the AE+CAISR
    combo's reconstruction pass obeys the same HBM bound as the
    synthesis core instead of pushing every kept slice through
    encode+decode in one program (a 250-slice 256^2 volume would
    otherwise hold ~8 GB of decoder activations in flight)."""
    n = kept.shape[0]
    if decode_batch is None or n <= int(decode_batch):
        return trainer.predict(kept)
    c = int(decode_batch)
    outs = [trainer.predict(kept[i:i + c]) for i in range(0, n, c)]
    if isinstance(outs[0], dict):
        return {k: np.concatenate([np.asarray(o[k]) for o in outs])
                for k in outs[0]}
    return np.concatenate([np.asarray(o) for o in outs])


# test-time augmentation variant sets: in-plane symmetries of the slice
# grid. 'flips' = the 4 shape-preserving elements of the dihedral group
# (identity, 180°, H-flip, W-flip); 'dihedral' = all 8 (the 90°/270°
# rotations swap H and W, so non-square volumes compile one extra
# program shape for the transposed variants).
TTA_MODES = ("flips", "dihedral")


def _tta_variants(mode: str):
    """(forward, inverse) pairs of in-plane (axes 1, 2) numpy transforms
    for [S, H, W] volumes; the identity is always first."""
    if mode not in TTA_MODES:
        raise ValueError(f"tta must be one of {TTA_MODES} or None, "
                         f"got {mode!r}")
    ks = (0, 2) if mode == "flips" else (0, 1, 2, 3)
    variants = []
    for k in ks:
        for flip in (False, True):
            def fwd(v, k=k, flip=flip):
                v = np.rot90(v, k, axes=(1, 2))
                if flip:
                    v = np.flip(v, axis=2)
                return np.ascontiguousarray(v)

            def inv(v, k=k, flip=flip):
                if flip:
                    v = np.flip(v, axis=2)
                return np.ascontiguousarray(np.rot90(v, -k, axes=(1, 2)))

            variants.append((fwd, inv))
    return variants


def create_super_volume(trainer, images, alpha_range=None,
                        use_original: bool = False,
                        downsample_steps: Optional[int] = None,
                        generate_inbetween_slices: bool = False,
                        labels=None, pad_to_bucket: bool = True,
                        decode_batch="auto",
                        num_devices: int = 1,
                        tta: Optional[str] = None,
                        latent_interp: str = "linear",
                        readback_dtype: Optional[str] = None
                        ) -> Dict[str, np.ndarray]:
    """Host wrapper with the reference's exact tail-slice semantics
    (reference: evaluate/common.py:134-235).

    ``readback_dtype='bfloat16'`` casts the synthesized volume on
    device before the host transfer (halves the tunnel bytes; widened
    back to float32 on host — measured zero SSIM cost, bench.py
    ``bf16_ssim_delta``).

    ``images``: [S, H, W] (numpy or jax) in [0,1].
    ``pad_to_bucket`` pads the kept-slice count to a bucket shape
    (identical outputs; bounds recompiles over ragged datasets).
    ``decode_batch``: 'auto' | None | int — chunked encode/decode so long
    volumes can't exceed HBM.
    ``num_devices`` > 1 shards the kept-slice axis over a device mesh
    (parallel.make_sharded_synthesizer) — multi-chip volume inference;
    outputs are identical to the single-device path.
    ``tta``: None | 'flips' | 'dihedral' — test-time augmentation:
    synthesize under each in-plane symmetry, invert, and average the
    image output (a standard SR quality lever the reference lacks;
    labels/pred_alphas come from the identity variant — class ids
    cannot be averaged). Shape-preserving variants reuse the one
    compiled program, so the cost is ~n_variants x the per-call time.
    ``latent_interp``: 'linear' (the reference's 2-tap latent lerp) |
    'cubic' (4-tap Catmull-Rom over neighbouring kept-slice latents —
    the latent-space analogue of lanczos's multi-tap kernel; an
    inference-only option the reference lacks).
    Returns {'upsampled_image' [S', H, W], 'pred_alphas', 'upsampled_labels'}.
    """
    if tta:
        variants = _tta_variants(tta)
        kwargs = dict(alpha_range=alpha_range, use_original=use_original,
                      downsample_steps=downsample_steps,
                      generate_inbetween_slices=generate_inbetween_slices,
                      pad_to_bucket=pad_to_bucket,
                      decode_batch=decode_batch, num_devices=num_devices,
                      tta=None, latent_interp=latent_interp,
                      readback_dtype=readback_dtype)
        base = create_super_volume(trainer, images, labels=labels, **kwargs)
        acc = base["upsampled_image"].astype(np.float64).copy()
        for fwd, inv in variants[1:]:
            res = create_super_volume(
                trainer, fwd(np.asarray(images, np.float32)),
                labels=None if labels is None else fwd(np.asarray(labels)),
                **kwargs)
            acc += inv(res["upsampled_image"]).astype(np.float64)
        base["upsampled_image"] = np.clip(
            acc / len(variants), 0.0, 1.0).astype(np.float32)
        return base

    images = np.asarray(images, np.float32)
    if alpha_range is None:
        alpha_range = [0.25, 0.5, 0.75]
    alpha_range = np.asarray(list(alpha_range), np.float32)
    if generate_inbetween_slices and downsample_steps is None:
        downsample_steps = int(len(alpha_range) + 1)
    if generate_inbetween_slices and downsample_steps != len(alpha_range) + 1:
        # interleaved output stride is len(alpha_range)+1; the output
        # only lands back on the input z-grid (and the verbatim tail
        # re-append only aligns) when that equals the downsample stride
        raise ValueError(
            f"generate_inbetween_slices needs len(alpha_range) "
            f"({len(alpha_range)}) == downsample_steps-1 "
            f"({downsample_steps - 1})")

    orig_images = images
    orig_num_slices = images.shape[0]
    remain = 0
    if downsample_steps is not None or generate_inbetween_slices:
        images, remain = kept_slice_grid(images, downsample_steps)

    kept = jnp.asarray(images)[..., None]   # [K, H, W, 1]
    # colors>=2 encoders (ACDCLBL families) take image+label input
    # channels — ride the provided labels along the same kept-slice grid
    # (the reference cats labels as channel 2, generate_hr_volumes.py:28);
    # zeros (with a warning) when labels are unavailable, e.g. the
    # training-time volume previews
    needs_label_channel, decodes_labels = model_label_semantics(trainer)
    if needs_label_channel:
        lbl_in = make_kept_label_channel(
            images, labels, downsample_steps, remain,
            "create_super_volume")
        kept = jnp.concatenate(
            [kept, jnp.asarray(lbl_in, jnp.float32)[..., None]], axis=-1)
    k_true = kept.shape[0]
    a_n = int(len(alpha_range))

    k_pad = bucket_size(k_true) if pad_to_bucket else k_true
    if num_devices and num_devices > 1:
        # slice-axis sharding needs the kept count divisible by the mesh
        k_pad = ((k_pad + num_devices - 1) // num_devices) * num_devices
    if k_pad > k_true:
        # cubic: edge-replicate so the last real pair's z[i+2] tap sees
        # the clamped boundary latent, not encode(zeros); linear pairs
        # never read padded latents, so zero-pad keeps legacy outputs
        # bit-identical there
        kept = jnp.pad(kept, ((0, k_pad - k_true),) + ((0, 0),) * 3,
                       mode="edge" if latent_interp != "linear" else
                       "constant")

    if decode_batch == "auto":
        depth = getattr(getattr(trainer, "model_config", None), "depth", 32)
        # default path decodes reconstructions + interpolants in ONE
        # concatenated call — budget for the sum, not the max
        n_total = k_pad + (k_pad - 1) * a_n
        decode_batch = _auto_decode_batch(n_total, kept.shape[1],
                                          kept.shape[2], depth)

    if num_devices and num_devices > 1:
        # per-shard decode chunking keeps the HBM bound on the mesh too
        per_dev = (decode_batch if decode_batch is None
                   else max(32, int(decode_batch) // int(num_devices)))
        synth = _get_sharded_synthesizer(trainer, num_devices, per_dev,
                                         latent_interp)
    else:
        synth = _get_synthesizer(trainer, decode_batch, latent_interp)
    params_sr = getattr(trainer, "params_sr", None)
    if params_sr is not None:
        # AE+CAISR combo: synthesis from the SR model, reconstructions
        # from the primary model (reference: evaluate/common.py:182-205 —
        # trainer.predict uses the AE, latent_space_interp passes
        # use_sr_model=True)
        p_sr, bs_sr = params_sr
        out = synth(p_sr, bs_sr, kept, jnp.asarray(alpha_range),
                    use_original=True)
        # a multichannel SR model's interp already carries decoded class
        # ids in channel 1 — keep them so the combo serves model-decoded
        # labels like the plain path (1-channel models keep 1 channel)
        n_ch = 2 if (decodes_labels and out["interp"].shape[-1] >= 2) else 1
        interp = out["interp"][:k_true - 1, ..., :n_ch]
        kept_true = kept[:k_true]
        if use_original:
            # original slices keep their input image+label planes
            recon = kept_true[..., :n_ch]
        else:
            # predict needs the model's FULL input channels (a colors>=2
            # stem rejects a 1-channel stack); multichannel decode
            # returns {'image','soft_probs'} — recon labels are the
            # PRIMARY model's argmax, like the reference's recon_dict
            # ['pred_labels'] (generate_hr_volumes.py:34-41)
            pred = _predict_chunked(trainer, kept_true, decode_batch)
            if isinstance(pred, dict):
                img = jnp.asarray(pred["image"])[..., :1]
                if n_ch == 2:
                    ids = jnp.argmax(jnp.asarray(pred["soft_probs"]),
                                     axis=-1)[..., None]
                    recon = jnp.concatenate(
                        [img, ids.astype(img.dtype)], axis=-1)
                else:
                    recon = img
            else:
                recon = jnp.asarray(pred)[..., :n_ch]
        new_volume = interleave_volume(recon, interp)
    else:
        params, batch_stats = trainer._ae_params()
        if num_devices and num_devices > 1:
            # sharded path: recon+interp come back mesh-sharded; the
            # interleave reshape runs outside the sharded program (the
            # multichannel label channel holds class ids — don't clamp)
            out = synth(params, batch_stats, kept, jnp.asarray(alpha_range),
                        use_original=use_original)
            vol = clip_with_label_channel(
                interleave_volume(out["recon"], out["interp"]),
                decodes_labels)
        else:
            out = synth(params, batch_stats, kept, jnp.asarray(alpha_range),
                        use_original=use_original, interleave=True)
            vol = out["volume"]
        # valid prefix of the padded interleaved volume
        new_volume = vol[:(k_true - 1) * (a_n + 1) + 1]
    if readback_dtype == "bfloat16" and hasattr(new_volume, "addressable_data"):
        # halve the device->host transfer over the tunnel: cast on
        # device, transfer 2 bytes/px, widen on host. Measured
        # 1-SSIM(bf16, f32) == 0.0 on the bench volume (bench.py
        # bf16_ssim_delta), so serving quality is unchanged.
        new_volume = np.asarray(
            _readback_cast(new_volume)).astype(np.float32)
    return _finalize_volume_outputs(
        new_volume, orig_images=orig_images, labels=labels,
        alpha_range=alpha_range, downsample_steps=downsample_steps,
        generate_inbetween_slices=generate_inbetween_slices,
        remain=remain, k_true=k_true, decodes_labels=decodes_labels,
        orig_num_slices=orig_num_slices)


def _finalize_volume_outputs(new_volume, *, orig_images, labels,
                             alpha_range, downsample_steps,
                             generate_inbetween_slices, remain: int,
                             k_true: int, decodes_labels: bool,
                             orig_num_slices: int) -> Dict[str, np.ndarray]:
    """Host post-processing shared by create_super_volume and the
    batched create_super_volumes: channel split, verbatim-tail
    re-append, clamp, pred_alphas, label ride-along. ``new_volume`` is
    the device output [S', H, W, C] with any kept-slice padding already
    stripped (S' = (k_true-1)*(len(alpha_range)+1)+1)."""
    a_n = int(len(alpha_range))
    new_volume = np.asarray(new_volume)
    # decoded labels (MultiChannelAE only): argmax(soft_probs) rides as
    # output channel 1 through the same interleave — the reference's
    # recon_labels/inter_label path (generate_hr_volumes.py:55-67). A
    # plain 2-channel AE's channel 1 is an intensity reconstruction, not
    # class ids — those models fall through to the input-label
    # ride-along below.
    dec_labels = (new_volume[..., 1]
                  if decodes_labels and new_volume.shape[-1] >= 2
                  else None)
    new_volume = new_volume[..., 0]

    if generate_inbetween_slices and remain != 0:
        # re-append the original tail slices verbatim
        # (reference: evaluate/common.py:220-231)
        new_volume = np.concatenate([new_volume, orig_images[-remain:]],
                                    axis=0)
        if dec_labels is not None:
            tail_lbl = (np.asarray(labels, np.float32)[-remain:]
                        if labels is not None
                        else np.zeros((remain,) + dec_labels.shape[1:],
                                      dec_labels.dtype))
            dec_labels = np.concatenate([dec_labels, tail_lbl], axis=0)
    new_volume = np.clip(new_volume, 0.0, 1.0)

    k1 = k_true - 1
    pred_alphas = np.repeat(alpha_range[None, :], k1, axis=0).reshape(-1)

    # labels ride along on the output grid by nearest-neighbour z
    # lookup (round-half-up like ITK): in the in-between-slices mode the
    # grids coincide, so labels return unchanged; in the
    # num_interpolations mode each synthesized position takes the
    # nearest original label slice
    upsampled_labels = None
    if dec_labels is not None:
        # multichannel: labels are DECODED by the model (reference
        # pred_labels = argmax(soft_probs)); integer class ids. rint
        # guards float round-trip noise from the interleave program.
        out_dtype = (np.asarray(labels).dtype if labels is not None
                     else np.int32)
        upsampled_labels = np.rint(dec_labels).astype(out_dtype)
    elif labels is not None:
        labels = np.asarray(labels)
        n_out = new_volume.shape[0]
        if n_out == labels.shape[0]:
            upsampled_labels = labels
        else:
            a_n1 = len(alpha_range) + 1
            # position of output slice j on the ORIGINAL label grid:
            # kept slices are ds apart when downsampling happened
            # (adjacent otherwise), with a_n interpolants between each
            # pair; any verbatim tail slices map to the original tail
            ds_eff = float(downsample_steps) if (
                downsample_steps is not None) else 1.0
            synth_len = (k_true - 1) * a_n1 + 1
            pos_synth = np.arange(min(synth_len, n_out),
                                  dtype=np.float64) * ds_eff / a_n1
            pos = pos_synth
            if n_out > synth_len:  # re-appended tail (remain slices)
                pos = np.concatenate([
                    pos_synth,
                    np.arange(orig_num_slices - (n_out - synth_len),
                              orig_num_slices, dtype=np.float64)])
            src = np.clip(np.floor(pos + 0.5).astype(np.int64), 0,
                          labels.shape[0] - 1)
            upsampled_labels = labels[src]
    return {"upsampled_image": new_volume,
            "upsampled_labels": upsampled_labels,
            "pred_alphas": pred_alphas}


# HBM budget for the MULTI-volume program: B x per-volume in-flight
# decode activations. Larger than the per-volume budget because the
# whole point of batching is to fill the chip (v5e has 16 GB; the
# dominant tensor is the full-res decode stack, budgeted at float32
# with 2x headroom).
_BATCH_ACT_BUDGET_BYTES = 4 << 30


def _batch_volume_cap(k_pad: int, a_n: int, h: int, w: int,
                      depth: int, decode_batch="auto",
                      channels: int = 1) -> tuple:
    """(decode_batch, max_b): per-volume decode chunk + how many
    volumes fit one batched program under _BATCH_ACT_BUDGET_BYTES.

    An explicit ``decode_batch`` (a chunk size, or None = unchunked)
    is honored and max_b is sized from ITS in-flight bytes — sizing it
    from the auto chunk would overcommit HBM when the caller forces a
    larger (or no) chunk. Chunking only bounds the decode ACTIVATIONS:
    the kept input stack, the latent stacks and the full interleaved
    output volume stay resident per volume regardless of the chunk, so
    they are charged per volume too — otherwise a small explicit chunk
    would inflate max_b while the B-scaled resident tensors overcommit
    HBM from the other side."""
    n_dec = k_pad + (k_pad - 1) * a_n
    if decode_batch == "auto":
        decode_batch = _auto_decode_batch(n_dec, h, w, depth)
    in_flight = n_dec if decode_batch is None else min(decode_batch,
                                                       n_dec)
    act = in_flight * h * w * max(depth, 32) * 4 * 2
    # resident (chunk-independent): output volume [n_dec, h, w, c] f32,
    # kept input, and the [n_dec, lw, lw, latent] latent stacks —
    # budgeted together as 3x the output volume's bytes; ``channels``
    # scales it for multichannel (image+label) serving where output
    # and kept carry 2 planes
    resident = n_dec * h * w * max(1, int(channels)) * 4 * 3
    per_vol = act + resident
    return decode_batch, max(1, int(_BATCH_ACT_BUDGET_BYTES
                                    // max(per_vol, 1)))


def create_super_volumes(trainer, images_list: Sequence,
                         alpha_range=None,
                         use_original: bool = False,
                         downsample_steps: Optional[int] = None,
                         generate_inbetween_slices: bool = False,
                         labels_list: Optional[Sequence] = None,
                         pad_to_bucket: bool = True,
                         decode_batch="auto",
                         num_devices: int = 1,
                         tta: Optional[str] = None,
                         latent_interp: str = "linear",
                         readback_dtype: Optional[str] = None
                         ) -> list:
    """Batched multi-volume synthesis: same semantics as calling
    ``create_super_volume`` once per volume, but same-shaped volumes
    (e.g. the frames of a 4D cardiac sequence, or a directory of
    conformed brains) run through ONE vmapped device program per shape
    group — the encoder/decoder see B-fold larger batches (~4x MXU
    throughput at OASIS slice counts) and the per-program dispatch
    cost amortizes over the group. Returns a list of per-volume result
    dicts in input order.

    ``num_devices > 1`` shards the VOLUME axis of each group's program
    over a device mesh (parallel.make_sharded_batched_synthesizer) —
    data-parallel serving: chunk sizes round up to a multiple of the
    mesh size (padding repeats the final volume) and the per-program
    HBM budget scales with the device count. Outputs are identical to
    the single-device batched path.

    Configurations the batched program does not cover fall back to the
    per-volume path transparently: TTA averaging and the AE+CAISR
    combo (``trainer.params_sr``) each orchestrate multiple program
    calls per volume already; lone-shape groups under a mesh route to
    the slice-axis-sharded single-volume path.
    """
    images_list = list(images_list)
    if labels_list is None:
        labels_list = [None] * len(images_list)
    labels_list = list(labels_list)
    if len(labels_list) != len(images_list):
        raise ValueError(
            f"labels_list has {len(labels_list)} entries for "
            f"{len(images_list)} volumes")
    kwargs = dict(alpha_range=alpha_range, use_original=use_original,
                  downsample_steps=downsample_steps,
                  generate_inbetween_slices=generate_inbetween_slices,
                  pad_to_bucket=pad_to_bucket, decode_batch=decode_batch,
                  num_devices=num_devices, tta=tta,
                  latent_interp=latent_interp,
                  readback_dtype=readback_dtype)
    nd = int(num_devices or 1)
    if (tta or getattr(trainer, "params_sr", None) is not None
            or len(images_list) <= 1):
        return [create_super_volume(trainer, img, labels=lbl, **kwargs)
                for img, lbl in zip(images_list, labels_list)]

    if alpha_range is None:
        alpha_range = [0.25, 0.5, 0.75]
    alpha_range = np.asarray(list(alpha_range), np.float32)
    a_n = int(len(alpha_range))
    if generate_inbetween_slices and downsample_steps is None:
        downsample_steps = a_n + 1
    if generate_inbetween_slices and downsample_steps != a_n + 1:
        raise ValueError(
            f"generate_inbetween_slices needs len(alpha_range) "
            f"({a_n}) == downsample_steps-1 ({downsample_steps - 1})")

    needs_label_channel, decodes_labels = model_label_semantics(trainer)
    depth = getattr(getattr(trainer, "model_config", None), "depth", 32)

    # per-volume prep mirrors create_super_volume exactly (same kept
    # grid, label channel, bucket padding and pad mode) so the batched
    # outputs are the single path's outputs
    groups: Dict[tuple, list] = {}
    prepped = []
    for idx, (img, lbl) in enumerate(zip(images_list, labels_list)):
        img = np.asarray(img, np.float32)
        orig_images, orig_num_slices, remain = img, img.shape[0], 0
        if downsample_steps is not None or generate_inbetween_slices:
            img, remain = kept_slice_grid(img, downsample_steps)
        kept = img[..., None]
        if needs_label_channel:
            lbl_in = make_kept_label_channel(
                img, lbl, downsample_steps, remain,
                "create_super_volumes")
            kept = np.concatenate(
                [kept, np.asarray(lbl_in, np.float32)[..., None]],
                axis=-1)
        k_true = kept.shape[0]
        k_pad = bucket_size(k_true) if pad_to_bucket else k_true
        if k_pad > k_true:
            # same pad rule as the single path: edge-replicate for
            # multi-tap schemes (boundary taps read the clamped edge
            # latent), zero-pad for linear (bit-identical legacy)
            kept = np.pad(kept, ((0, k_pad - k_true),) + ((0, 0),) * 3,
                          mode="edge" if latent_interp != "linear"
                          else "constant")
        meta = dict(index=idx, orig_images=orig_images, labels=lbl,
                    remain=remain, k_true=k_true,
                    orig_num_slices=orig_num_slices)
        key = (k_pad,) + kept.shape[1:]
        groups.setdefault(key, []).append((kept, meta))
        prepped.append(meta)

    results: list = [None] * len(images_list)
    alphas_dev = jnp.asarray(alpha_range)
    for (k_pad, h, w, _c), items in groups.items():
        db, max_b = _batch_volume_cap(k_pad, a_n, h, w, depth,
                                      decode_batch=decode_batch,
                                      channels=_c)
        if len(items) == 1:
            # lone shape: the single-volume program (shared cache with
            # create_super_volume) beats compiling a B=1 vmap twin
            kept, meta = items[0]
            if nd > 1:
                # under a mesh the single path already shards the
                # slice axis (and pads kept to the mesh size itself)
                results[meta["index"]] = create_super_volume(
                    trainer, images_list[meta["index"]],
                    labels=meta["labels"], **kwargs)
                continue
            synth = _get_synthesizer(trainer, db, latent_interp)
            params, batch_stats = trainer._ae_params()
            out = synth(params, batch_stats, jnp.asarray(kept),
                        alphas_dev, use_original=use_original,
                        interleave=True)
            vol = out["volume"][:(meta["k_true"] - 1) * (a_n + 1) + 1]
            if readback_dtype == "bfloat16":
                vol = np.asarray(_readback_cast(vol)).astype(np.float32)
            results[meta["index"]] = _finalize_volume_outputs(
                vol, orig_images=meta["orig_images"],
                labels=meta["labels"], alpha_range=alpha_range,
                downsample_steps=downsample_steps,
                generate_inbetween_slices=generate_inbetween_slices,
                remain=meta["remain"], k_true=meta["k_true"],
                decodes_labels=decodes_labels,
                orig_num_slices=meta["orig_num_slices"])
            continue
        params, batch_stats = trainer._ae_params()
        # fixed chunk size B: ONE compiled program shape per group;
        # the last partial chunk pads by repeating its final volume
        if nd > 1:
            # volume axis sharded over the mesh: the device count must
            # divide B (chunks round UP to a multiple of the mesh), and
            # the in-flight budget is per device so the cap scales with
            # the mesh size
            synth = _get_sharded_batched_synthesizer(trainer, nd, db,
                                                     latent_interp)
            b = min(max_b, -(-len(items) // nd)) * nd
        else:
            synth = _get_batched_synthesizer(trainer, db, latent_interp)
            b = min(max_b, len(items))
        for start in range(0, len(items), b):
            part = items[start:start + b]
            pad_n = b - len(part)
            # host numpy stack goes straight to the synthesizer: the
            # sharded path device_puts it against the mesh sharding
            # (host -> per-device shards directly); staging it through
            # jnp.asarray first would park the full mesh-scaled chunk
            # on device 0 before the reshard — a device-0 HBM hotspot
            # at exactly the scale the volume sharding exists for
            stack = np.stack([it[0] for it in part]
                             + [part[-1][0]] * pad_n)
            vols = synth(params, batch_stats, stack,
                         alphas_dev, use_original=use_original)
            # one transfer for the chunk, trimmed to the longest valid
            # prefix (padded tail slices never leave the device)
            s_max = max((it[1]["k_true"] - 1) * (a_n + 1) + 1
                        for it in part)
            vols = vols[:len(part), :s_max]
            if readback_dtype == "bfloat16":
                vols = _readback_cast(vols)
            vols = np.asarray(vols).astype(np.float32)
            for j, (_kept, meta) in enumerate(part):
                s_j = (meta["k_true"] - 1) * (a_n + 1) + 1
                results[meta["index"]] = _finalize_volume_outputs(
                    vols[j, :s_j], orig_images=meta["orig_images"],
                    labels=meta["labels"], alpha_range=alpha_range,
                    downsample_steps=downsample_steps,
                    generate_inbetween_slices=generate_inbetween_slices,
                    remain=meta["remain"], k_true=meta["k_true"],
                    decodes_labels=decodes_labels,
                    orig_num_slices=meta["orig_num_slices"])
    return results


_SYNTH_CACHE: dict = {}


def _get_synthesizer(trainer, decode_batch: Optional[int] = None,
                     latent_interp: str = "linear"):
    from .latent_taps import latent_interp_cache_token

    mdl = trainer._ae_model()
    key = (id(mdl), decode_batch, latent_interp_cache_token(latent_interp))
    if key not in _SYNTH_CACHE:
        _SYNTH_CACHE[key] = make_volume_synthesizer(
            mdl, decode_batch=decode_batch, latent_interp=latent_interp)
    return _SYNTH_CACHE[key]


def _get_batched_synthesizer(trainer, decode_batch: Optional[int] = None,
                             latent_interp: str = "linear"):
    from .latent_taps import latent_interp_cache_token

    mdl = trainer._ae_model()
    key = (id(mdl), "batched", decode_batch,
           latent_interp_cache_token(latent_interp))
    if key not in _SYNTH_CACHE:
        _SYNTH_CACHE[key] = make_batched_synthesizer(
            mdl, decode_batch=decode_batch, latent_interp=latent_interp)
    return _SYNTH_CACHE[key]


def _get_mesh_synthesizer(trainer, tag: str, factory_name: str,
                          num_devices: int,
                          decode_batch: Optional[int],
                          latent_interp: str):
    """Shared cached getter for the mesh-sharded synthesizers: one
    device-count check + mesh-subset rule, cached per
    (model, tag, N, decode_batch, latent_interp)."""
    from .latent_taps import latent_interp_cache_token

    mdl = trainer._ae_model()
    key = (id(mdl), tag, int(num_devices), decode_batch,
           latent_interp_cache_token(latent_interp))
    if key not in _SYNTH_CACHE:
        from .. import parallel

        devices = jax.devices()
        if len(devices) < num_devices:
            raise ValueError(
                f"num_devices={num_devices} but only {len(devices)} "
                f"device(s) attached")
        factory = getattr(parallel, factory_name)
        _SYNTH_CACHE[key] = factory(
            mdl, parallel.create_mesh(devices[:num_devices]),
            decode_batch=decode_batch, latent_interp=latent_interp)
    return _SYNTH_CACHE[key]


def _get_sharded_batched_synthesizer(trainer, num_devices: int,
                                     decode_batch: Optional[int] = None,
                                     latent_interp: str = "linear"):
    """Volume-axis-sharded MULTI-volume synthesizer over the first N
    devices (parallel.make_sharded_batched_synthesizer)."""
    return _get_mesh_synthesizer(trainer, "mesh_batched",
                                 "make_sharded_batched_synthesizer",
                                 num_devices, decode_batch, latent_interp)


def _get_sharded_synthesizer(trainer, num_devices: int,
                             decode_batch: Optional[int] = None,
                             latent_interp: str = "linear"):
    """Slice-axis-sharded synthesizer over the first N devices
    (parallel.make_sharded_synthesizer)."""
    return _get_mesh_synthesizer(trainer, "mesh",
                                 "make_sharded_synthesizer",
                                 num_devices, decode_batch, latent_interp)


# ---------------------------------------------------------------------------
# conventional interpolation baselines (SimpleITK ExpandImageFilter port)
# ---------------------------------------------------------------------------

def _interp_weights(method: str, frac: np.ndarray):
    """Per-output-sample kernel taps (offsets, weights) for 1-D z interp."""
    if method == "nearest":
        # ITK nearest rounds half UP (Math::RoundHalfIntegerUp);
        # np.round's banker's rounding would pick the earlier slice at
        # exact midpoints (every odd output slice for even factors)
        offs = np.floor(frac + 0.5).astype(np.int64)
        return offs[:, None], np.ones((len(frac), 1), np.float32)
    if method == "linear":
        w1 = frac.astype(np.float32)
        return (np.stack([np.zeros_like(w1, dtype=np.int64),
                          np.ones_like(w1, dtype=np.int64)], 1),
                np.stack([1.0 - w1, w1], 1))
    if method == "bspline":
        # cubic B-spline kernel taps at offsets -1..2
        t = frac.astype(np.float64)
        offs = np.stack([np.full_like(t, o, dtype=np.float64)
                         for o in (-1, 0, 1, 2)], 1)
        x = np.abs(offs - t[:, None])
        w = np.where(x < 1, (4 - 6 * x ** 2 + 3 * x ** 3) / 6.0,
                     np.where(x < 2, ((2 - x) ** 3) / 6.0, 0.0))
        return offs.astype(np.int64), (w / w.sum(1, keepdims=True)).astype(np.float32)
    if method == "lanczos":
        radius = 3
        t = frac.astype(np.float64)
        offs = np.stack([np.full_like(t, o)
                         for o in range(-radius + 1, radius + 1)], 1)
        x = offs - t[:, None]

        def lanczos(x):
            x = np.where(x == 0, 1e-12, x)
            px = np.pi * x
            return np.where(np.abs(x) < radius,
                            radius * np.sin(px) * np.sin(px / radius)
                            / (px * px), 0.0)

        w = lanczos(x)
        w = w / w.sum(1, keepdims=True)
        return offs.astype(np.int64), w.astype(np.float32)
    raise ValueError(f"unknown interpolation method {method!r}")


def simple_interpolation(volume: np.ndarray, expand_factor: int,
                         method: str = "lanczos") -> np.ndarray:
    """z-axis expansion by integer factor, matching SimpleITK's
    ExpandImageFilter geometry: output slice j samples input coordinate
    j / expand_factor (reference: evaluate/common.py:114-118).
    Runs as one vectorised gather+weighted-sum.
    """
    s = volume.shape[0]
    out_n = s * expand_factor
    pos = np.arange(out_n, dtype=np.float64) / expand_factor
    base = np.floor(pos).astype(np.int64)
    frac = pos - base
    offs, w = _interp_weights(method, frac)
    if method == "bspline":
        # interpolating B-spline needs the coefficient prefilter
        # (ITK's BSplineInterpolateImageFunction computes spline
        # coefficients first); applying the smoothing kernel to raw
        # samples would blur on-grid slices instead of reproducing them
        import scipy.ndimage
        volume = scipy.ndimage.spline_filter1d(
            np.asarray(volume, np.float64), order=3, axis=0,
            mode="mirror")
    idx = np.clip(base[:, None] + offs, 0, s - 1)     # [out_n, taps]
    taps = volume[idx]                                # [out_n, taps, H, W]
    out = np.einsum("ot,othw->ohw", w.astype(volume.dtype), taps)
    return out.astype(np.float32)


def create_simple_interpolation(images: np.ndarray, expand_factor: int,
                                method: str = "lanczos",
                                generate_inbetween_slices: bool = False
                                ) -> np.ndarray:
    """Conventional-interpolation baseline with the reference's
    strip-tails-then-upsample semantics (evaluate/common.py:74-111)."""
    images = np.asarray(images, np.float32)
    if not generate_inbetween_slices:
        return simple_interpolation(images, expand_factor, method)
    orig = images
    orig_n = images.shape[0]
    ds = int(expand_factor)
    last_slice_id = np.arange(orig_n)[::ds][-1]
    remain = (orig_n - 1) % ds
    kept = images[:-remain] if remain else images
    kept = kept[::ds]
    up = simple_interpolation(kept, ds, method)
    up = up[:last_slice_id + 1]
    if remain > 0:
        up = np.concatenate([up, orig[-remain:]], axis=0)
    return up


def apply_blur_filter(img: np.ndarray, sigma: float = 1.0) -> np.ndarray:
    """Per-slice 2-D gaussian post-blur of an SR volume
    (reference: evaluate/common.py:121-127 apply_blur_filter /
    generate_blurred_sr_image — one vectorised call, not a slice loop)."""
    import scipy.ndimage
    return scipy.ndimage.gaussian_filter(
        np.asarray(img, np.float32), (0.0, sigma, sigma))


def rescale_volume(vol: np.ndarray) -> np.ndarray:
    """Min-max rescale + clamp (reference: evaluate/common.py:129-133
    rescale_tensor)."""
    vol = np.asarray(vol, np.float32)
    rng = vol.max() - vol.min()
    if rng == 0:
        return np.zeros_like(vol)
    return np.clip((vol - vol.min()) / rng, 0.0, 1.0)
