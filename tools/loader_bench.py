"""Benchmark the native data-loader runtime vs the pure-Python path.

Measures the two host-side hot spots the C++ runtime covers
(native/srloader.cc):
  1. directory ingest: N gzipped NIfTI volumes decoded sequentially with
     utils/nifti.read_nifti vs the native thread pool,
  2. triplet batch assembly: per-item np.stack vs the threaded native
     channel-interleaving gather.

Run: python tools/loader_bench.py
"""
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from superresolution_aniso_mri_tpu.data import native_loader as nl  # noqa: E402
from superresolution_aniso_mri_tpu.utils.nifti import (  # noqa: E402
    read_nifti, write_nifti,
)


def bench_ingest(n_files=12, shape=(40, 220, 220), reps=3):
    rng = np.random.RandomState(0)
    d = tempfile.mkdtemp()
    import atexit
    import shutil
    atexit.register(shutil.rmtree, d, True)  # ~90MB of .nii.gz otherwise
    paths = []
    for i in range(n_files):
        arr = rng.rand(*shape).astype(np.float32)
        p = os.path.join(d, f"vol{i:02d}.nii.gz")
        write_nifti(p, arr, spacing=[6.0, 1.0, 1.0])
        paths.append(p)

    t_py = []
    for _ in range(reps):
        t0 = time.perf_counter()
        for p in paths:
            read_nifti(p)
        t_py.append(time.perf_counter() - t0)
    t_nat = []
    for _ in range(reps):
        t0 = time.perf_counter()
        nl.read_nifti_many(paths)
        t_nat.append(time.perf_counter() - t0)
    py, nat = min(t_py), min(t_nat)
    print(f"ingest {n_files} x {shape} .nii.gz: python {py:.3f}s, "
          f"native {nat:.3f}s ({py / nat:.2f}x)")


def bench_gather(b=64, hw=(220, 220), c=3, reps=20):
    rng = np.random.RandomState(1)
    vol = rng.rand(128, *hw).astype(np.float32)
    items = [[vol[rng.randint(126)], vol[rng.randint(126)],
              vol[rng.randint(126)]][:c] for _ in range(b)]

    t_py = []
    for _ in range(reps):
        t0 = time.perf_counter()
        np.stack([np.stack(ch, axis=-1) for ch in items])
        t_py.append(time.perf_counter() - t0)
    t_nat = []
    for _ in range(reps):
        t0 = time.perf_counter()
        nl.gather_triplets(items)
        t_nat.append(time.perf_counter() - t0)
    py, nat = min(t_py), min(t_nat)
    print(f"gather [{b}, {hw[0]}x{hw[1]}, c={c}]: python {py * 1e3:.2f}ms, "
          f"native {nat * 1e3:.2f}ms ({py / nat:.2f}x)")


if __name__ == "__main__":
    if not nl.available():
        print("native runtime unavailable")
        sys.exit(1)
    bench_ingest()
    bench_gather()
