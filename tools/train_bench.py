#!/usr/bin/env python
"""Training-step throughput micro-benchmark on the attached chip.

Measures jitted train-step wall time for the reference's headline
training configs (BASELINE.md): ACDC ae_combined (batch 12 pairs, 128²),
OASIS ae_combined (batch 16 pairs, 64²) and dHCP (batch 8, 256²), in
f32 and bf16. The per-step figure is amortized total/steps (a mean).
"""
import sys
import time

import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


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
    m = t.train(batch)  # compile
    float(m["loss_ae"])  # force completion via readback
    # amortized pipelined timing (a per-step readback would measure the
    # host<->device round trip, not the step)
    t0 = time.perf_counter()
    for _ in range(steps):
        m = t.train(batch)
    float(m["loss_ae"])
    mean_step = (time.perf_counter() - t0) / steps
    print(f"{name:>28} [{compute_dtype:8}]: {mean_step * 1e3:8.3f} ms/step "
          f"({batch_pairs / mean_step:8.1f} pairs/s)")
    return mean_step


def main():
    for dtype in ("float32", "bfloat16"):
        bench_config("ACDC ae_combined 128² b12", 128, 32, 32, 128, 12,
                     dtype)
        bench_config("OASIS ae_combined 64² b16", 64, 16, 32, 128, 16,
                     dtype)
        bench_config("dHCP ae_combined 256² b8", 256, 64, 32, 128, 8,
                     dtype)


if __name__ == "__main__":
    main()
