#!/usr/bin/env python
"""Build the encoder-backbone perceptual artifact (weights/
perceptual_enc.npz) from a trained experiment.

The backbone is the experiment's frozen SR encoder
(ops/perceptual.py); this tool fits the non-negative per-channel
"lin" weights on a 2AFC-style ranking task over an anatomy-DISJOINT
distortion set (lpips_gap_study's suite at seed_base=1000 — the gap
study itself evaluates at seed_base=0, so fit and gate never share a
phantom), then calibrates the overall scale so the mean distance
matches the mean MSE of the same pairs (drop-in loss magnitude: the
existing loss weights / learning rates keep working).

Oracle for the ranking fit: 1 - MS-SSIM (the best reference-grade
perceptual signal in this environment). The gate in
tools/lpips_gap_study.py --enc_npz is evaluated on held-out slices AND
judged on decorrelation from MSE, so the fit target and the acceptance
criterion are not the same measurement.

Usage:
  python tools/fit_perceptual_head.py --exper_dir <trained exper> \
      [--model_nbr caisr] [--out weights/perceptual_enc.npz] \
      [--lins uniform|fitted]

Reference hooks: lpips/networks_basic.py:19-100 (lin-over-backbone
architecture), lpips/dist_model.py:19-108 (the un-downloadable
pretrained path this replaces).
"""
import argparse
import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

if __name__ == "__main__":
    os.environ.pop("PALLAS_AXON_POOL_IPS", None)
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["JAX_PLATFORM_NAME"] = "cpu"
    import jax
    jax.config.update("jax_platforms", "cpu")


def harvest_encoder(exper_dir: str, model_nbr):
    """(AEConfig, encoder variables) from a trained experiment dir."""
    from superresolution_aniso_mri_tpu.train import get_trainer

    trainer = get_trainer(exper_dir, model_nbr=model_nbr)
    params = trainer.state.params
    if "ae" in params:          # acai/alpha families nest the AE tree
        params = params["ae"]
    if "enc" not in params:
        raise SystemExit(
            f"experiment {exper_dir} has no 'enc' subtree (model "
            f"{trainer.args.get('model')}) — the perceptual backbone "
            f"needs an Encoder-bearing family")
    variables = {"params": params["enc"]}
    bs = trainer.state.batch_stats
    if bs:
        bs = bs.get("ae", bs)
        if isinstance(bs, dict) and bs.get("enc"):
            variables["batch_stats"] = bs["enc"]
    return trainer.model.config, variables, trainer.args.get("model")


def build_fit_set(n_slices: int, size: int, seed_base: int = 1000):
    """(slices, per-slice list of (distorted, 1-msssim oracle))."""
    from lpips_gap_study import distortion_suite, reference_slices
    from superresolution_aniso_mri_tpu.ops.metrics import msssim2d

    rs = np.random.RandomState(7)
    suite = distortion_suite(rs)
    slices = reference_slices(n_slices, size, seed_base=seed_base)
    levels = min(5, int(np.log2(size / 7)) + 1)
    data = []
    for sl in slices:
        dists, oracle, mses = [], [], []
        for _, _, _, fn in suite:
            d = np.clip(fn(sl), 0.0, 1.0).astype(np.float32)
            dists.append(d)
            oracle.append(1.0 - float(msssim2d(sl, d, levels=levels)))
            mses.append(float(np.mean((sl - d) ** 2)))
        data.append((sl, np.stack(dists), np.asarray(oracle),
                     np.asarray(mses)))
    return data


def fit_lins(enc_params, data, iters: int = 400, lr: float = 0.05,
             margin: float = 0.005, seed: int = 0):
    """Non-negative lin weights via pairwise logistic ranking.

    For every within-slice distortion pair whose oracle severities
    differ by > margin, the weighted feature distance must order the
    pair the same way. Returns (w [F], fit diagnostics)."""
    import jax
    import jax.numpy as jnp

    from superresolution_aniso_mri_tpu.ops.perceptual import (
        enc_feature_diff_vectors,
    )

    X, yi, yj, sign = [], [], [], []
    rows = []
    for sl, dists, oracle, _ in data:
        ref = jnp.asarray(sl)[None, :, :, None]
        batch = jnp.asarray(dists)[..., None]
        V = np.asarray(enc_feature_diff_vectors(
            enc_params, jnp.broadcast_to(ref, batch.shape), batch))
        base = len(rows)
        rows.extend(V)
        n = len(oracle)
        for i in range(n):
            for j in range(i + 1, n):
                if abs(oracle[i] - oracle[j]) <= margin:
                    continue
                yi.append(base + i)
                yj.append(base + j)
                sign.append(1.0 if oracle[i] > oracle[j] else -1.0)
    V = jnp.asarray(np.stack(rows))                   # [N, F]
    ii = jnp.asarray(yi, jnp.int32)
    jj = jnp.asarray(yj, jnp.int32)
    sg = jnp.asarray(sign, jnp.float32)

    feat_dim = V.shape[1]
    # parametrize w = softplus(theta): positivity without projection
    theta0 = jnp.zeros((feat_dim,), jnp.float32)

    def loss_fn(theta, scale):
        w = jax.nn.softplus(theta)
        d = V @ w                                     # [N]
        delta = (d[ii] - d[jj]) * sg
        return jnp.mean(jax.nn.softplus(-scale * delta))

    import optax
    opt = optax.adam(lr)
    theta = theta0
    opt_state = opt.init(theta)
    # fixed logistic sharpness chosen from the raw distance scale
    with np.errstate(all="ignore"):
        scale = float(1.0 / (np.quantile(
            np.abs(np.asarray(V @ jax.nn.softplus(theta0))), 0.9)
            + 1e-12))
    grad_fn = jax.jit(jax.value_and_grad(lambda t: loss_fn(t, scale)))
    for it in range(iters):
        val, g = grad_fn(theta)
        updates, opt_state = opt.update(g, opt_state)
        theta = optax.apply_updates(theta, updates)
    w = np.asarray(jax.nn.softplus(theta), np.float32)

    d = np.asarray(V @ jnp.asarray(w))
    delta = (d[np.asarray(yi)] - d[np.asarray(yj)]) * np.asarray(sign)
    diag = {
        "pairs": int(len(sign)),
        "rank_accuracy": float(np.mean(delta > 0)),
        "final_loss": float(val),
    }
    return w, diag


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--exper_dir", required=True)
    p.add_argument("--model_nbr", default="caisr",
                   help="checkpoint to harvest (default: the min-val-"
                        "loss 'caisr' alias)")
    p.add_argument("--out", default=os.path.join(
        REPO, "weights", "perceptual_enc.npz"))
    p.add_argument("--lins", choices=("uniform", "fitted"),
                   default="fitted")
    p.add_argument("--n_slices", type=int, default=12)
    p.add_argument("--size", type=int, default=128)
    p.add_argument("--iters", type=int, default=400)
    args = p.parse_args()

    from superresolution_aniso_mri_tpu.ops.perceptual import (
        enc_lpips_distance, save_enc_perceptual, uniform_lins,
    )

    cfg, variables, family = harvest_encoder(args.exper_dir,
                                             args.model_nbr)
    print(f"[harvest] {family} encoder from {args.exper_dir} "
          f"(depth={cfg.depth}, scales={cfg.scales}, "
          f"bn={cfg.use_batchnorm})", flush=True)

    lins = uniform_lins(cfg)
    chans = [l.shape[0] for l in lins]
    params = {"kind": "enc", "cfg": cfg, "variables": variables,
              "lins": lins, "meta": {}}

    data = build_fit_set(args.n_slices, args.size)
    diag = {"mode": "uniform"}
    if args.lins == "fitted":
        w, diag = fit_lins(params, data, iters=args.iters)
        diag["mode"] = "fitted"
        # split the flat weight vector back into per-tap lins
        out, off = [], 0
        for c in chans:
            out.append(w[off:off + c])
            off += c
        lins = out
        params = dict(params, lins=lins)
        print(f"[fit] {diag['pairs']} ranking pairs, rank accuracy "
              f"{diag['rank_accuracy']:.3f}", flush=True)

    # scale calibration: mean distance over the fit pairs == mean MSE
    # of the same pairs -> drop-in loss magnitude
    import jax.numpy as jnp
    dsum, msum = 0.0, 0.0
    for sl, dists, _, mses in data:
        ref = jnp.asarray(sl)[None, :, :, None]
        batch = jnp.asarray(dists)[..., None]
        d = np.asarray(enc_lpips_distance(
            params, jnp.broadcast_to(ref, batch.shape), batch))
        dsum += float(np.sum(d))
        msum += float(np.sum(mses))
    cal = msum / max(dsum, 1e-12)
    lins = [l * cal for l in lins]
    diag["scale_calibration"] = cal

    meta = {"source_exper": os.path.abspath(args.exper_dir),
            "source_family": family, "model_nbr": str(args.model_nbr),
            "fit": diag, "n_slices": args.n_slices, "size": args.size,
            "seed_base": 1000}
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    save_enc_perceptual(args.out, cfg, variables, lins, meta)
    print(f"[write] {args.out}")
    print(json.dumps(meta, indent=2))


if __name__ == "__main__":
    main()
