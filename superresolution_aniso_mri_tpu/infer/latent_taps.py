"""Fitted per-alpha latent tap weights — a learned z-mixing scheme.

The fixed multi-tap schemes ('cubic', 'lanczos3' — infer/super_volume.py)
mix neighbouring kept-slice latents with analytic spline weights; every
one of them (including the reference's 2-tap lerp,
kwatsch/img_interpolation.py:58-92) is a fixed point in the same family:
synthesized latent = sum_t W[alpha, t] * z[clip(pair + offset_t)].

'fitted' learns W directly: a tiny [A, n_taps] weight table optimized on
the validation split THROUGH THE FROZEN DECODER against the true
in-between slices — the optimal member of the family for this decoder
and this anatomy, at identical serving cost (same gathers, same decode).
An inference-only lever the reference lacks: no retraining, weights live
in '<exper>/models/latent_taps.npz' next to the checkpoints.

Serving: pass ``latent_interp="fitted:<path>"`` to any synthesis surface
(the CLIs expand bare ``fitted`` to the experiment's table). Rows are
interpolated in alpha, so a table fitted at one downsample factor serves
any other — with boundary rows pinned to the exact delta weights at
alpha 0/1.
"""
from __future__ import annotations

import os
from typing import Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

# default taps match lanczos3's support: radius-3 window around the pair
DEFAULT_OFFSETS = (-2, -1, 0, 1, 2, 3)

FITTED_PREFIX = "fitted"


def is_fitted_mode(mode: str) -> bool:
    return mode == FITTED_PREFIX or mode.startswith(FITTED_PREFIX + ":")


def fitted_table_path(mode: str) -> str:
    """'fitted:<path>' → path (bare 'fitted' is a caller error here —
    surfaces resolve it against the experiment dir first)."""
    if ":" not in mode:
        raise ValueError(
            "latent_interp='fitted' needs a weight table: run "
            "`python fit_latent_taps.py --exper_dir <exper>` to create "
            "<exper>/models/latent_taps.npz, then pass "
            "'fitted:<path>' (the CLIs expand bare 'fitted' to the "
            "experiment's table automatically)")
    return mode.split(":", 1)[1]


def resolve_latent_interp(mode: str, exper_dir: Optional[str] = None) -> str:
    """Expand bare 'fitted' to 'fitted:<exper>/models/latent_taps.npz'.

    Other modes pass through untouched; surfaces that know their
    experiment dir (CLIs, sweep drivers) call this once up front."""
    if mode != FITTED_PREFIX:
        return mode
    if not exper_dir:
        fitted_table_path(mode)  # raises with the how-to message
    path = os.path.join(exper_dir, "models", "latent_taps.npz")
    if not os.path.isfile(path):
        raise FileNotFoundError(
            f"latent_interp='fitted' but no weight table at {path} — "
            f"run `python fit_latent_taps.py --exper_dir {exper_dir}` "
            f"first (fits the tap weights on the validation split)")
    return f"{FITTED_PREFIX}:{path}"


def save_latent_taps(path: str, offsets: Sequence[int],
                     alphas: np.ndarray, weights: np.ndarray,
                     meta: Optional[Dict] = None) -> None:
    """Write the fitted table. Boundary rows for alpha 0/1 are added
    here (exact delta weights on the pair taps) so serving at alphas
    outside the fitted grid interpolates toward identity instead of
    clamping to the outermost fitted row."""
    offsets = np.asarray(offsets, np.int32)
    alphas = np.asarray(alphas, np.float32)
    weights = np.asarray(weights, np.float32)
    if weights.shape != (alphas.shape[0], offsets.shape[0]):
        raise ValueError(f"weights {weights.shape} != "
                         f"(n_alphas={alphas.shape[0]}, "
                         f"n_taps={offsets.shape[0]})")
    for tap_offset in (0, 1):
        if not np.any(offsets == tap_offset):
            raise ValueError(
                f"offsets {tuple(offsets)} must include the pair taps 0 "
                f"and 1 — the alpha-0/1 identity boundary rows place "
                f"their delta weight there")
    rows = [alphas]
    wrows = [weights]
    for boundary, tap_offset in ((0.0, 0), (1.0, 1)):
        if not np.any(np.isclose(alphas, boundary)):
            delta = np.zeros((1, offsets.shape[0]), np.float32)
            delta[0, int(np.where(offsets == tap_offset)[0][0])] = 1.0
            rows.append(np.array([boundary], np.float32))
            wrows.append(delta)
    alphas_full = np.concatenate(rows)
    weights_full = np.concatenate(wrows, axis=0)
    order = np.argsort(alphas_full)
    payload = {"offsets": offsets, "alphas": alphas_full[order],
               "weights": weights_full[order]}
    for k, v in (meta or {}).items():
        payload[f"meta_{k}"] = np.asarray(v)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        np.savez(f, **payload)
    os.replace(tmp, path)


def load_latent_taps(path: str) -> Dict[str, np.ndarray]:
    """Read a fitted table → {'offsets', 'alphas', 'weights', meta...}."""
    with np.load(path) as z:
        out = {k: z[k] for k in z.files}
    for k in ("offsets", "alphas", "weights"):
        if k not in out:
            raise ValueError(f"{path}: not a latent-taps table "
                             f"(missing '{k}')")
    if out["weights"].shape != (out["alphas"].shape[0],
                                out["offsets"].shape[0]):
        raise ValueError(f"{path}: weights {out['weights'].shape} "
                         f"inconsistent with alphas/offsets")
    if not np.all(np.diff(out["alphas"]) > 0):
        # jnp.interp silently mis-reads a non-ascending grid
        raise ValueError(f"{path}: alphas must be strictly ascending "
                         f"(save_latent_taps sorts them; hand-built "
                         f"tables must too)")
    return out


def latent_interp_cache_token(mode: str):
    """Cache-key component for synthesizer caches: analytic modes key on
    the string alone; 'fitted:<path>' additionally keys on the table
    file's mtime/size so refitting in the same process doesn't serve a
    stale compiled table."""
    if is_fitted_mode(mode) and ":" in mode:
        path = fitted_table_path(mode)
        try:
            st = os.stat(path)
            return (mode, st.st_mtime_ns, st.st_size)
        except OSError:
            return (mode, None, None)
    return mode


def fitted_tap_weights(table_alphas, table_weights, alphas) -> jnp.ndarray:
    """[A] requested alphas → [A, n_taps] rows, linearly interpolated in
    alpha from the fitted table (exact at fitted grid points; the
    boundary rows saved by save_latent_taps pin alpha 0/1 to identity)."""
    grid = jnp.asarray(table_alphas, jnp.float32)
    w = jnp.asarray(table_weights, jnp.float32)
    a = jnp.asarray(alphas, jnp.float32)
    interp_col = jax.vmap(lambda col: jnp.interp(a, grid, col),
                          in_axes=1, out_axes=1)
    return interp_col(w)


# ---------------------------------------------------------------------------
# fitting
# ---------------------------------------------------------------------------


def _gather_pairs(trainer, volumes, downsample_steps: int,
                  offsets: Sequence[int]):
    """Precompute the fitting set from validation volumes.

    Returns (taps [P, n_taps, lh, lw, c], targets [P, A, H, W, 1]):
    for every kept-slice pair of every (3-D or per-frame 4-D) volume,
    the edge-clamped neighbour latents and the TRUE slices at the
    in-between positions — the image_hr ground truth when the dataset
    pairs one (the production protocol, evaluate/create_hr_images.py),
    the volume's own removed slices otherwise."""
    from .super_volume import kept_slice_grid, model_label_semantics

    needs_labels, _dec_lbl = model_label_semantics(trainer)
    if needs_labels:
        raise NotImplementedError(
            "fitted latent taps are wired for single-channel encoders; "
            "the multichannel (image+label input) family would need "
            "label-channel supervision in the fitting set")

    ds = int(downsample_steps)
    # trainer.encode: jitted host API with the VAE bottleneck routing;
    # use_sr_model=True so the AE+CAISR combo fits through the SAME
    # model that serves the synthesis (create_super_volume runs the
    # interpolants through params_sr when loaded; a table optimized
    # through the primary AE would be wrong for that decoder);
    # reflect-pad in-plane to the encoder's total stride like the
    # synthesis core (odd sizes would decode back smaller)
    cfg = getattr(trainer._ae_model(), "config", None)
    div = (2 ** cfg.scales) if cfg is not None else 1

    def enc(kept):
        h, w = kept.shape[1], kept.shape[2]
        ph, pw = (-h) % div, (-w) % div
        if ph or pw:
            kept = jnp.pad(kept, ((0, 0), (0, ph), (0, pw), (0, 0)),
                           mode="reflect")
        # chunked: a 500-slice volume must not hold every encoder
        # activation in flight at once
        chunk = 64
        if kept.shape[0] <= chunk:
            return np.asarray(trainer.encode(kept, use_sr_model=True))
        return np.concatenate(
            [np.asarray(trainer.encode(kept[i:i + chunk],
                                       use_sr_model=True))
             for i in range(0, kept.shape[0], chunk)])

    # fitting pairs are stacked into one array, so every volume must
    # share an in-plane shape — ragged datasets (e.g. ACDC) contribute
    # their DOMINANT shape and the rest are skipped with a warning
    # (weights are per-alpha scalars; the dominant-shape pairs carry
    # the same signal)
    taps_by_shape: Dict[tuple, list] = {}
    tgt_by_shape: Dict[tuple, list] = {}
    for vol in volumes:
        img = np.asarray(vol.image, np.float32)
        hr = (np.asarray(vol.image_hr, np.float32)
              if getattr(vol, "image_hr", None) is not None else img)
        frames = img[None] if img.ndim == 3 else img
        hr_frames = hr[None] if hr.ndim == 3 else hr
        for img3d, hr3d in zip(frames, hr_frames):
            kept, _remain = kept_slice_grid(img3d, ds)
            k = kept.shape[0]
            if k < 2:
                continue
            z = enc(jnp.asarray(kept)[..., None])
            pair = np.arange(k - 1)
            taps = np.stack(
                [z[np.clip(pair + o, 0, k - 1)] for o in offsets],
                axis=1)                                # [K-1, n_taps, ...]
            # target at pair j, alpha index m-1 → HR slice j*ds + m
            tgt = np.stack(
                [hr3d[pair * ds + m] for m in range(1, ds)],
                axis=1)[..., None]                     # [K-1, A, H, W, 1]
            shape = img3d.shape[1:]
            taps_by_shape.setdefault(shape, []).append(taps)
            tgt_by_shape.setdefault(shape, []).append(tgt)
    if not taps_by_shape:
        raise ValueError("no kept-slice pairs in the fitting volumes")
    best = max(taps_by_shape,
               key=lambda s: sum(t.shape[0] for t in taps_by_shape[s]))
    if len(taps_by_shape) > 1:
        skipped = sorted(s for s in taps_by_shape if s != best)
        print(f"[fit_taps] WARNING: ragged in-plane shapes — fitting on "
              f"the dominant {best}, skipping volumes of {skipped}",
              flush=True)
    return (np.concatenate(taps_by_shape[best], axis=0),
            np.concatenate(tgt_by_shape[best], axis=0))


def fit_latent_taps(trainer, volumes, downsample_steps: int, *,
                    steps: int = 300, lr: float = 0.02,
                    batch_pairs: int = 16, seed: int = 0,
                    offsets: Sequence[int] = DEFAULT_OFFSETS,
                    l2_to_init: float = 0.0,
                    holdout_frac: float = 0.2,
                    verbose: bool = False) -> Dict:
    """Fit the [A, n_taps] tap-weight table through the frozen decoder.

    Initialized at the lanczos3 rows (the strongest analytic scheme) and
    optimized with Adam on the mean squared error of the decoded
    synthesized slices against the true in-between slices, over every
    kept-slice pair of ``volumes``. Returns {'alphas', 'weights',
    'offsets', 'loss_init', 'loss_final'} — save with save_latent_taps.

    The fitting set is typically a handful of validation volumes and an
    unconstrained fit chases it past what generalizes (measured: val
    +5 dB while held-out test landed below analytic lanczos3). Two
    guards address that:

    - a pair-level holdout (``holdout_frac``): optimize on the rest,
      evaluate the holdout every few steps, and return the
      best-holdout-loss weights seen — with the analytic init always a
      candidate, so the result never generalizes worse than lanczos3
      on data the optimizer never touched;
    - ``l2_to_init``: optional lambda * ||W - W_lanczos3||^2 trust
      region on top (0 = off).

    loss_init/loss_final are holdout losses (the honest pair).
    """
    import optax

    from .super_volume import lanczos3_weights

    ds = int(downsample_steps)
    if ds < 2:
        raise ValueError(f"downsample_steps must be >= 2 to have "
                         f"in-between slices, got {ds}")
    alphas = np.linspace(0.0, 1.0, ds + 1)[1:-1].astype(np.float32)
    if tuple(offsets) != DEFAULT_OFFSETS:
        raise NotImplementedError(
            "custom tap offsets need a matching analytic init; only the "
            f"lanczos3 support {DEFAULT_OFFSETS} is wired up")
    w0 = np.asarray(lanczos3_weights(jnp.asarray(alphas)), np.float32)

    taps_np, tgt_np = _gather_pairs(trainer, volumes, ds, offsets)
    n_pairs = taps_np.shape[0]
    rng = np.random.RandomState(seed)
    # pair-level holdout for generalization-gated selection
    if n_pairs >= 2 and holdout_frac > 0:
        perm = rng.permutation(n_pairs)
        n_hold = min(max(1, int(round(holdout_frac * n_pairs))),
                     n_pairs - 1)
        hold_idx, train_idx = perm[:n_hold], perm[n_hold:]
    else:
        hold_idx = train_idx = np.arange(n_pairs)
    taps = jnp.asarray(taps_np[train_idx])
    targets = jnp.asarray(tgt_np[train_idx])
    taps_ho = jnp.asarray(taps_np[hold_idx])
    tgt_ho = jnp.asarray(tgt_np[hold_idx])
    n_train = taps.shape[0]

    # jitted decode is still differentiable; params/batch_stats are
    # closed over (frozen) so grads flow only to the weight table. The
    # SR-model params serve the synthesis when loaded (AE+CAISR combo)
    # — fit through the same decoder. The multichannel family decodes
    # {'image', 'soft_probs'} — fit on the image head.
    p, bs = trainer._sr_params(use_sr_model=True)
    decode_fn = trainer._decode_fn()

    def dec(zz):
        out = decode_fn(p, bs, zz)
        return out["image"] if isinstance(out, dict) else out

    def batch_loss(w, tap_b, tgt_b):
        # [B, n_taps, ...] x [A, n_taps] → [B, A, ...] mixed latents
        z_mix = jnp.einsum("at,bt...->ba...", w, tap_b)
        flat = z_mix.reshape((-1,) + z_mix.shape[2:])
        out = dec(flat)
        out = out.reshape(tgt_b.shape[:2] + out.shape[1:])
        # decoder output can exceed the target in-plane size when the
        # fitting volumes needed stride padding — crop like the core;
        # supervision is the image channel
        out = out[..., :tgt_b.shape[2], :tgt_b.shape[3], :1]
        return jnp.mean((out - tgt_b) ** 2)

    opt = optax.adam(lr)
    w_init = jnp.asarray(w0)

    def objective(w, tap_b, tgt_b):
        penalty = l2_to_init * jnp.sum((w - w_init) ** 2)
        return batch_loss(w, tap_b, tgt_b) + penalty

    @jax.jit
    def step(w, opt_state, idx):
        loss, g = jax.value_and_grad(objective)(
            w, jnp.take(taps, idx, axis=0), jnp.take(targets, idx, axis=0))
        updates, opt_state = opt.update(g, opt_state)
        return optax.apply_updates(w, updates), opt_state, loss

    def pair_losses(w, tap_b, tgt_b):
        # per-pair mean squared error (mean over alphas/pixels) — the
        # per-item twin of batch_loss, for exact set means under padding
        z_mix = jnp.einsum("at,bt...->ba...", w, tap_b)
        flat = z_mix.reshape((-1,) + z_mix.shape[2:])
        out = dec(flat)
        out = out.reshape(tgt_b.shape[:2] + out.shape[1:])
        out = out[..., :tgt_b.shape[2], :tgt_b.shape[3], :1]
        return jnp.mean((out - tgt_b) ** 2,
                        axis=tuple(range(1, tgt_b.ndim)))

    def make_set_loss(tp_all, tg_all):
        n = tp_all.shape[0]
        chunk = max(1, min(n, 64))
        pad = (-n) % chunk

        @jax.jit
        def set_loss(w):
            # memory-bounded exact mean: per-pair losses, padded tail
            # entries masked out (a chunk-mean reweighting would
            # over-weight the duplicated edge pair)
            tp = jnp.pad(tp_all,
                         ((0, pad),) + ((0, 0),) * (tp_all.ndim - 1),
                         mode="edge")
            tg = jnp.pad(tg_all,
                         ((0, pad),) + ((0, 0),) * (tg_all.ndim - 1),
                         mode="edge")
            tp = tp.reshape((-1, chunk) + tp.shape[1:])
            tg = tg.reshape((-1, chunk) + tg.shape[1:])
            per_pair = jax.lax.map(
                lambda ab: pair_losses(w, ab[0], ab[1]),
                (tp, tg)).reshape(-1)               # [n + pad]
            return jnp.sum(per_pair[:n]) / n

        return set_loss

    holdout_loss = make_set_loss(taps_ho, tgt_ho)

    w = jnp.asarray(w0)
    opt_state = opt.init(w)
    loss_init = float(holdout_loss(w))
    best_w, best_loss = w, loss_init      # analytic init is a candidate
    eval_every = max(1, steps // 20)
    b = min(batch_pairs, n_train)
    for i in range(steps):
        idx = jnp.asarray(rng.randint(0, n_train, size=(b,)))
        w, opt_state, loss = step(w, opt_state, idx)
        if (i + 1) % eval_every == 0 or i == steps - 1:
            ho = float(holdout_loss(w))
            if ho < best_loss:
                best_w, best_loss = w, ho
            if verbose and (i % max(1, steps // 10) < eval_every
                            or i == steps - 1):
                print(f"[fit_taps] step {i}: train batch mse "
                      f"{float(loss):.6f}  holdout mse {ho:.6f}",
                      flush=True)
    return {"alphas": alphas, "weights": np.asarray(best_w, np.float32),
            "offsets": np.asarray(offsets, np.int32),
            "loss_init": loss_init, "loss_final": best_loss,
            "n_pairs": n_pairs, "n_holdout": int(len(hold_idx))}
