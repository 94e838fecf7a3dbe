#!/usr/bin/env python
"""Multi-chip scaling quantification WITHOUT multi-chip hardware
(VERDICT r4 #6).

Three measurements on the 8-device virtual CPU mesh:

1. **Comm bytes per step** — lower the ACTUAL sharded data-parallel
   train step (parallel/mesh.make_sharded_train_step) and read every
   `all-reduce` instruction out of the optimized HLO. For pure DP the
   total must equal one gradient tree (= one param tree) in float32
   (+ the handful of scalar metric/batch-stat reductions); the test
   suite pins this accounting (tests/test_scaling_model.py).

2. **Predicted DP scaling efficiency for v5e-8 / v5e-16** — ring
   all-reduce time 2·(N-1)/N · bytes / ICI_BW against the MEASURED
   single-chip step times (docs/train_roofline_r4.json). Reported as
   a no-overlap lower bound and a full-overlap upper bound; XLA
   overlaps the grad all-reduce with backward compute when latency
   hiding is on, so the truth sits between, near the upper bound.
   ICI numbers are the public v5e spec (4 links x 45 GB/s one-way,
   ring uses 2 links per direction on the 2D torus — we charge ONE
   45 GB/s link as the conservative bottleneck).

3. **Input-pipeline throughput at N=8** — drive the real triplet
   sampler + device-side transform path for the production configs on
   the 8-device mesh and compare sustained batches/s against the rate
   the measured TPU step times demand. The data path must not be the
   scaling bottleneck.

Usage: python tools/scaling_model.py [--json_out docs/scaling_model.json]
"""
import argparse
import json
import os
import re
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

if __name__ == "__main__":
    os.environ.pop("PALLAS_AXON_POOL_IPS", None)
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["JAX_PLATFORM_NAME"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()
    import jax
    jax.config.update("jax_platforms", "cpu")

# public v5e per-chip numbers (How to Scale Your Model, jax-ml.github.io/
# scaling-book; Google Cloud v5e spec): 197 TFLOP/s bf16, 819 GB/s HBM,
# ICI 4 links x 45 GB/s one-way
V5E_ICI_ONEWAY_GBS = 45.0e9


def _dtype_bytes(s):
    return {"f32": 4, "bf16": 2, "f16": 2, "s32": 4, "u32": 4, "f64": 8,
            "pred": 1, "s8": 1, "u8": 1, "s64": 8, "u64": 8}.get(s, 4)


def allreduce_bytes_from_hlo(hlo_text: str):
    """Sum the element bytes of every all-reduce result in optimized
    HLO. Returns (total_bytes, [(shape_str, bytes)])."""
    out = []
    # matches e.g.:  %all-reduce.1 = f32[1179648]{0} all-reduce(...)
    # including tuple-shaped variadic all-reduces
    pat = re.compile(
        r"=\s*(\([^)]*\)|[a-z0-9]+\[[0-9,]*\][^ ]*)\s+all-reduce(?:-start)?\(")
    for m in pat.finditer(hlo_text):
        shape = m.group(1)
        total = 0
        for dt, dims in re.findall(r"([a-z0-9]+)\[([0-9,]*)\]", shape):
            n = 1
            for d in dims.split(","):
                if d:
                    n *= int(d)
            total += n * _dtype_bytes(dt)
        out.append((shape if len(shape) < 80 else shape[:77] + "...",
                    total))
    return sum(b for _, b in out), out


def build_sharded_step(width, latent_width, depth, latent, batch_pairs,
                       use_batchnorm=False, n_devices=8):
    import jax
    import jax.numpy as jnp

    from superresolution_aniso_mri_tpu.models import AEConfig, VanillaACAI
    from superresolution_aniso_mri_tpu.parallel import (
        create_mesh, make_sharded_train_step, replicate_state,
        shard_batch,
    )
    from superresolution_aniso_mri_tpu.train import (
        LossConfig, create_train_state,
    )

    devices = jax.devices()[:n_devices]
    mesh = create_mesh(devices)
    cfg = AEConfig(width=width, latent_width=latent_width, depth=depth,
                   latent=latent, colors=1, use_batchnorm=use_batchnorm,
                   use_sigmoid=True)
    model = VanillaACAI(cfg)
    state = create_train_state(
        model, jax.random.PRNGKey(0),
        jnp.zeros((2, width, width, 1)), lr=1e-3)
    loss_cfg = LossConfig(model="ae_combined", recon_loss="mse",
                          image_mix_loss_func="mse")
    step = make_sharded_train_step(model, loss_cfg, None, mesh,
                                   donate=False)
    rs = np.random.RandomState(0)
    b = batch_pairs
    batch = {
        "image": rs.rand(2 * b, width, width, 1).astype(np.float32),
        "slice_between": rs.rand(b, width, width, 1).astype(np.float32),
        "alpha_from": np.full((b,), 0.5, np.float32),
        "alpha_to": np.full((b,), 0.5, np.float32),
    }
    param_bytes = sum(np.prod(x.shape) * 4 for x in
                      jax.tree_util.tree_leaves(state.params))
    with mesh:
        state_r = replicate_state(mesh, state)
        dev_batch = shard_batch(mesh, batch)
        import jax.numpy as jnp
        lowered = jax.jit(step).lower(state_r, dev_batch,
                                      jax.random.PRNGKey(1),
                                      jnp.float32(0.01))
        compiled = lowered.compile()
    return compiled, int(param_bytes), mesh, state_r, dev_batch


def predict_dp_efficiency(step_time_s: float, grad_bytes: int,
                          n_chips: int,
                          ici_gbs: float = V5E_ICI_ONEWAY_GBS):
    """Ring all-reduce over n chips: each chip sends/receives
    2·(N-1)/N · grad_bytes through its bottleneck link."""
    t_ar = 2.0 * (n_chips - 1) / n_chips * grad_bytes / ici_gbs
    no_overlap = step_time_s / (step_time_s + t_ar)
    full_overlap = step_time_s / max(step_time_s, t_ar)
    return {"allreduce_s": t_ar,
            "efficiency_no_overlap": no_overlap,
            "efficiency_full_overlap": full_overlap}


def input_pipeline_throughput(width, num_slices, n_patients, batch_pairs,
                              n_devices=8, seconds=6.0):
    """Sustained batches/s of the REAL host-side input path (triplet
    sampler over synthetic volumes) feeding an 8-device mesh."""
    import jax

    from superresolution_aniso_mri_tpu.data import TripletSampler, Volume
    from superresolution_aniso_mri_tpu.parallel import (
        create_mesh, shard_batch,
    )

    rs = np.random.RandomState(0)
    vols = [Volume(image=rs.rand(num_slices, width, width)
                   .astype(np.float32),
                   spacing=np.array([1.0, 1.0, 1.0]),
                   patient_id=f"P{i:03d}")
            for i in range(n_patients)]
    sampler = TripletSampler(vols, 2, "adjacent_plus", seed=0)
    mesh = create_mesh(jax.devices()[:n_devices])
    n = 0
    with mesh:
        db = shard_batch(mesh, sampler.sample_batch(batch_pairs))
        jax.block_until_ready(db["triplet"])
        t0 = time.perf_counter()
        while time.perf_counter() - t0 < seconds:
            db = shard_batch(mesh, sampler.sample_batch(batch_pairs))
            jax.block_until_ready(db["triplet"])
            n += 1
    dt = time.perf_counter() - t0
    return n / dt


CONFIGS = [
    # name, width, lw, depth, latent, batch_pairs, roofline key
    ("OASIS 64^2 b16", 64, 32, 24, 64, 16, "oasis_b16"),
    ("dHCP 256^2 b8", 256, 128, 24, 64, 8, "dhcp_b8"),
]

# measured single-chip step times (s) from docs/train_roofline_r4.json
# (f32 rows; regenerate with tools/train_bench.py if configs change)
MEASURED_STEP_S = {"oasis_b16": 0.0131, "dhcp_b8": 0.0962}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--json_out", type=str, default=None)
    p.add_argument("--skip_input_bench", action="store_true")
    args = p.parse_args()

    result = {"ici_oneway_gbs": V5E_ICI_ONEWAY_GBS, "configs": {}}
    for name, w, lw, d, lat, b, key in CONFIGS:
        print(f"[lower] {name} sharded step on 8-device mesh", flush=True)
        compiled, param_bytes, mesh, state_r, dev_batch = \
            build_sharded_step(w, lw, d, lat, b)
        hlo = compiled.as_text()
        ar_bytes, ar_list = allreduce_bytes_from_hlo(hlo)
        step_s = MEASURED_STEP_S[key]
        row = {
            "param_bytes": param_bytes,
            "allreduce_bytes": ar_bytes,
            "allreduce_ops": len(ar_list),
            "allreduce_over_param_ratio": round(ar_bytes / param_bytes, 3),
            "measured_step_s_1chip": step_s,
        }
        for n_chips in (8, 16):
            row[f"v5e_{n_chips}"] = {
                k: (round(v, 4) if isinstance(v, float) else v)
                for k, v in predict_dp_efficiency(
                    step_s, ar_bytes, n_chips).items()}
        result["configs"][name] = row
        print(f"  params {param_bytes/1e6:.1f} MB, all-reduced "
              f"{ar_bytes/1e6:.1f} MB in {len(ar_list)} ops "
              f"(ratio {row['allreduce_over_param_ratio']})")
        for n_chips in (8, 16):
            e = row[f"v5e_{n_chips}"]
            print(f"  v5e-{n_chips}: allreduce {e['allreduce_s']*1e3:.2f} ms"
                  f" -> efficiency {e['efficiency_no_overlap']:.1%}"
                  f" (no overlap) .. {e['efficiency_full_overlap']:.1%}"
                  f" (overlapped)")

    if not args.skip_input_bench:
        print("[input] host pipeline throughput on the 8-device mesh",
              flush=True)
        for name, w, lw, d, lat, b, key in CONFIGS:
            bps = input_pipeline_throughput(w, 37, 19, b)
            need = 1.0 / MEASURED_STEP_S[key]
            result["configs"][name]["input_batches_per_s"] = round(bps, 1)
            result["configs"][name]["required_batches_per_s"] = round(
                need, 1)
            result["configs"][name]["input_headroom_x"] = round(
                bps / need, 2)
            print(f"  {name}: {bps:.0f} batches/s sustained vs "
                  f"{need:.0f}/s required -> {bps/need:.1f}x headroom")

    if args.json_out:
        with open(args.json_out, "w") as f:
            json.dump(result, f, indent=1)
        print(f"wrote {args.json_out}")


if __name__ == "__main__":
    main()
