"""Roofline probe for the volume-synthesis inference path.

Reports, for the bench.py OASIS configuration (220x220, 30 LR slices,
ds=6 → 175 output slices):
  - XLA cost analysis per volume (FLOPs, bytes accessed)
  - single-volume sync + amortized latency → MFU / HBM utilization
  - compute and bandwidth floors (time at 100% of peak)
  - batched multi-volume throughput (make_batched_synthesizer) at
    several batch sizes — the serving-throughput configuration

Peaks default to TPU v5e (197 bf16 TFLOP/s, 819 GB/s HBM); override
with --peak_tflops / --peak_gbps for other chips.

Usage: python tools/infer_roofline.py [--batches 1 2 4 8]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", type=int, nargs="+", default=[1, 2, 4, 8])
    ap.add_argument("--peak_tflops", type=float, default=197.0,
                    help="bf16 peak TFLOP/s (v5e default)")
    ap.add_argument("--peak_gbps", type=float, default=819.0,
                    help="HBM peak GB/s (v5e default)")
    ap.add_argument("--reps", type=int, default=8)
    ap.add_argument("--split", action="store_true",
                    help="also time encode/decode stages separately")
    ap.add_argument("--packed", action="store_true",
                    help="also time the batched path with the "
                         "space-to-depth packed decoder")
    ap.add_argument("--depth_sweep", action="store_true",
                    help="lane-padding probe: B=8 throughput at depth "
                         "{32, 64, 128} — flat time vs growing logical "
                         "bytes proves the channel-padding floor")
    args = ap.parse_args()

    from superresolution_aniso_mri_tpu.models import AEConfig, VanillaACAI
    from superresolution_aniso_mri_tpu.infer.super_volume import (
        make_batched_synthesizer, make_volume_synthesizer,
    )

    cfg = AEConfig(width=64, latent_width=16, depth=32, latent=128,
                   colors=1, use_batchnorm=True, use_sigmoid=True,
                   compute_dtype="bfloat16")
    model = VanillaACAI(cfg)
    num_lr_slices, hw, ds = 30, 220, 6
    alphas = jnp.asarray(np.linspace(0, 1, ds + 1)[1:-1], jnp.float32)
    rng = np.random.RandomState(0)
    volume = jnp.asarray(rng.rand(num_lr_slices, hw, hw, 1), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), volume[:1], train=False)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    reduce = jax.jit(jnp.sum)

    synth = make_volume_synthesizer(model)
    lowered = jax.jit(lambda p, bs, v, a: synth(
        p, bs, v, a, use_original=False, interleave=True)["volume"])
    compiled = lowered.lower(params, batch_stats, volume, alphas).compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    flops = float(ca.get("flops", float("nan")))
    bytes_acc = float(ca.get("bytes accessed", float("nan")))
    print(f"flops/volume: {flops/1e9:.1f} G")
    print(f"bytes accessed/volume: {bytes_acc/1e9:.3f} GB")
    print(f"compute floor @ {args.peak_tflops:.0f} TF/s: "
          f"{flops/args.peak_tflops/1e9:.2f} ms")
    print(f"bandwidth floor @ {args.peak_gbps:.0f} GB/s: "
          f"{bytes_acc/args.peak_gbps/1e6:.2f} ms")

    out = compiled(params, batch_stats, volume, alphas)
    float(reduce(out))
    # amortized: enqueue reps, read back the last
    t0 = time.perf_counter()
    res = None
    for _ in range(args.reps):
        res = compiled(params, batch_stats, volume, alphas)
    float(reduce(res))
    amort = (time.perf_counter() - t0) / args.reps
    # sync: block per call
    ts = []
    for _ in range(args.reps):
        t0 = time.perf_counter()
        jax.block_until_ready(compiled(params, batch_stats, volume, alphas))
        ts.append(time.perf_counter() - t0)
    sync = float(np.median(ts))
    print(f"single volume: sync {sync*1e3:.2f} ms   "
          f"amortized {amort*1e3:.2f} ms")
    print(f"  MFU {flops/amort/args.peak_tflops/1e12*100:.1f}%   "
          f"HBM util {bytes_acc/amort/args.peak_gbps/1e9*100:.1f}%")

    if args.split:
        # stage split: time encode / decode / mix+interleave separately
        # (amortized over reps) at the batched-B=8 shapes so the "where
        # do the ms go" claim is measured, not asserted
        b = 8
        k, a_n = num_lr_slices, int(alphas.shape[0])
        n_dec = k + (k - 1) * a_n
        vols = jnp.asarray(rng.rand(b, k, hw, hw, 1), jnp.float32)

        def enc(v):
            flat = v.reshape((-1,) + v.shape[2:])
            z = model.apply({"params": params, "batch_stats": batch_stats},
                            flat, train=False, method=model.encode)
            return z.reshape(v.shape[:2] + z.shape[1:])

        encj = jax.jit(enc)
        z8 = encj(vols)
        float(reduce(z8))

        def dec(zz):
            flat = zz.reshape((-1,) + zz.shape[2:])
            y = model.apply({"params": params, "batch_stats": batch_stats},
                            flat, method=model.decode)
            return y.reshape(zz.shape[:2] + y.shape[1:])

        zdec = jnp.asarray(
            rng.rand(b, n_dec, *np.asarray(z8.shape[2:])), z8.dtype)
        decj = jax.jit(dec)
        y8 = decj(zdec)
        float(reduce(y8))

        def stage_time(fn, *xs):
            t0 = time.perf_counter()
            r = None
            for _ in range(args.reps):
                r = fn(*xs)
            float(reduce(r))
            return (time.perf_counter() - t0) / args.reps / b

        t_enc = stage_time(encj, vols)
        t_dec = stage_time(decj, zdec)
        print(f"stage split (B={b}, per volume): "
              f"encode[{k}sl] {t_enc*1e3:.2f} ms   "
              f"decode[{n_dec}sl] {t_dec*1e3:.2f} ms")
        dflops = float(jax.jit(dec).lower(zdec).compile().cost_analysis()
                       .get("flops", float("nan")))
        dbytes = float(jax.jit(dec).lower(zdec).compile().cost_analysis()
                       .get("bytes accessed", float("nan")))
        print(f"  decode alone: {dflops/b/1e9:.1f} GF/vol, "
              f"{dbytes/b/1e9:.2f} GB/vol → "
              f"MFU {dflops/b/t_dec/args.peak_tflops/1e12*100:.1f}%, "
              f"HBM {dbytes/b/t_dec/args.peak_gbps/1e9*100:.1f}%")

    for b in args.batches:
        if b <= 1:
            continue
        vols = jnp.asarray(rng.rand(b, num_lr_slices, hw, hw, 1),
                           jnp.float32)
        for packed in ([False, True] if args.packed else [False]):
            bsynth = make_batched_synthesizer(model, packed=packed)
            out = bsynth(params, batch_stats, vols, alphas)
            float(reduce(out))
            t0 = time.perf_counter()
            res = None
            for _ in range(args.reps):
                res = bsynth(params, batch_stats, vols, alphas)
            float(reduce(res))
            per_vol = (time.perf_counter() - t0) / args.reps / b
            tag = " packed" if packed else ""
            print(f"batched B={b}{tag}: {per_vol*1e3:6.2f} ms/volume  "
                  f"(MFU {flops/per_vol/args.peak_tflops/1e12*100:.1f}%, "
                  f"HBM {bytes_acc/per_vol/args.peak_gbps/1e9*100:.1f}%)")

    if args.depth_sweep:
        # lane-padding probe for the B=8 residual (VERDICT r4 #8): the
        # bench model runs depth-32 NHWC convs on 128-wide vector
        # lanes. If per-volume time is ~flat while logical bytes grow
        # with depth, the physical traffic at depth 32 is already the
        # lane-resident amount — the remaining gap to the LOGICAL
        # bandwidth floor is layout padding, not implementation slack.
        print("\n=== depth sweep @ B=8 (lane-padding probe) ===")
        b = 8
        for depth in (32, 64, 128):
            cfg_d = AEConfig(width=64, latent_width=16, depth=depth,
                             latent=128, colors=1, use_batchnorm=True,
                             use_sigmoid=True, compute_dtype="bfloat16")
            model_d = VanillaACAI(cfg_d)
            vars_d = model_d.init(jax.random.PRNGKey(0), volume[:1],
                                  train=False)
            p_d = vars_d["params"]
            bs_d = vars_d.get("batch_stats", {})
            bsynth = make_batched_synthesizer(model_d)
            vols = jnp.asarray(rng.rand(b, num_lr_slices, hw, hw, 1),
                               jnp.float32)
            out = bsynth(p_d, bs_d, vols, alphas)
            float(reduce(out))
            t0 = time.perf_counter()
            res = None
            for _ in range(args.reps):
                res = bsynth(p_d, bs_d, vols, alphas)
            float(reduce(res))
            per_vol = (time.perf_counter() - t0) / args.reps / b
            lowered_d = jax.jit(lambda p, bs, v, a: bsynth(p, bs, v, a)
                                ).lower(p_d, bs_d, vols, alphas)
            ca_d = lowered_d.compile().cost_analysis()
            if isinstance(ca_d, list):
                ca_d = ca_d[0]
            by = float(ca_d.get("bytes accessed", float("nan"))) / b
            print(f"  depth {depth:3d}: {per_vol*1e3:6.2f} ms/volume, "
                  f"logical {by/1e9:.2f} GB/vol "
                  f"(floor {by/args.peak_gbps/1e6:.2f} ms)")


if __name__ == "__main__":
    main()
