#!/usr/bin/env python
"""End-to-end training-PIPELINE throughput benchmark.

tools/train_bench.py measures the jitted step in isolation; this tool
measures what a user actually gets: the full CLI loop — host sampler,
prefetch thread, device-side augmentation, optimizer step, per-epoch
validation/flush/checkpointing — by fabricating an OASIS-shaped tree
and driving train_brain_aesr.py for a few epochs per variant. It
reports the median steady-state epoch time (epoch 0 is compile) and
the derived ms/step, for the host input path vs the device-resident
dataset cache (data/device_cache.py).

  python tools/pipeline_bench.py            # both variants, default cfg
  python tools/pipeline_bench.py --variants 1   # cache only
"""
import argparse
import os
import re
import shutil
import subprocess
import sys
import tempfile

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tools"))

from _subproc import child_env  # noqa: E402
from real_pipeline_quality import make_textured_oasis_tree  # noqa: E402

EPOCH_RE = re.compile(r"^epoch\s+(\d+)\s.*\(([\d.]+)s\)", re.M)


def run_variant(data_root, cache, args):
    out = tempfile.mkdtemp(prefix=f"sr_pb_{cache}_")
    cmd = [
        sys.executable, "train_brain_aesr.py", "-d", "OASIS",
        "-m", "ae_combined", "--downsample_steps", "3",
        "--width", str(args.inplane),
        "--latent_width", str(args.inplane // 4),
        "--latent", str(args.latent), "--depth", str(args.depth),
        "--aug_patch_size", str(args.inplane),
        "-b", str(args.batch_size), "--lr", "0.002",
        "-e", str(args.epochs), "--epoch_threshold", "999999",
        "--ex_loss_weight1", "0.001", "--volume_preview_interval", "0",
        "--seed", "7", "--image_mix_loss_func", "mse",
        "--use_batchnorm", "0", "--device_data_cache", cache,
        "-o", out, "-id", "pb",
    ]
    try:
        r = subprocess.run(cmd, cwd=REPO, env=child_env(data_root),
                           capture_output=True, text=True, timeout=3600)
        if r.returncode != 0:
            raise SystemExit(f"variant cache={cache} failed:\n"
                             + r.stdout[-2000:] + r.stderr[-2000:])
        times = {int(e): float(s) for e, s in EPOCH_RE.findall(r.stdout)}
        if len(times) < 3:
            raise SystemExit(f"variant cache={cache}: too few epoch "
                             f"lines parsed ({len(times)}):\n"
                             + r.stdout[-2000:])
        # exact steps/epoch from the run's own iteration archive
        iters = np.load(os.path.join(out, "pb", "loss_iters.npz"))
        steps = int(np.diff(iters["loss_iters"]).max())
    finally:
        shutil.rmtree(out, ignore_errors=True)
    steady = [times[e] for e in sorted(times) if e >= 1]
    return float(times[0]), float(np.median(steady)), steps


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--inplane", type=int, default=64)
    p.add_argument("--num_slices", type=int, default=37)
    p.add_argument("--n_patients", type=int, default=24)
    p.add_argument("--batch_size", type=int, default=16)
    p.add_argument("--depth", type=int, default=24)
    p.add_argument("--latent", type=int, default=128)
    p.add_argument("--epochs", type=int, default=10)
    p.add_argument("--variants", nargs="+", default=["0", "1"],
                   choices=["0", "1", "auto"],
                   help="--device_data_cache values to benchmark")
    args = p.parse_args()

    # the parent stays off the device; only the CLI children use it
    import jax
    jax.config.update("jax_platforms", "cpu")

    work = tempfile.mkdtemp(prefix="sr_pb_data_")
    try:
        make_textured_oasis_tree(work, 3, args.n_patients, args.inplane,
                                 args.num_slices)
        results = {}
        for cache in args.variants:
            compile_s, steady_s, steps = run_variant(work, cache, args)
            results[cache] = (compile_s, steady_s)
            print(f"cache={cache:>4}: first epoch {compile_s:7.1f}s "
                  f"(compile) | steady {steady_s:6.2f}s/epoch "
                  f"(~{1e3 * steady_s / max(1, steps):6.1f} ms/step "
                  f"incl. per-epoch val/flush/checkpoint)")
        if "0" in results and "1" in results:
            print(f"device cache speedup: "
                  f"{results['0'][1] / results['1'][1]:.2f}x steady-state")
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
