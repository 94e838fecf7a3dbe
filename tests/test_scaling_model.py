"""Comm-bytes accounting for the sharded DP step (VERDICT r4 #6).

Pins that the data-parallel train step's compiled HLO all-reduces
exactly what DP theory says it must: one gradient tree (~= one param
tree, f32) plus small metric reductions — no hidden weight
re-broadcasts or activation collectives that would wreck ICI scaling.
"""
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tools"))


def test_dp_step_allreduce_bytes_are_one_gradient_tree():
    from scaling_model import (
        allreduce_bytes_from_hlo, build_sharded_step,
    )

    compiled, param_bytes, *_ = build_sharded_step(
        width=32, latent_width=16, depth=8, latent=8, batch_pairs=8,
        n_devices=8)
    ar_bytes, ar_list = allreduce_bytes_from_hlo(compiled.as_text())
    assert ar_bytes > 0, "no all-reduce found in the sharded step HLO"
    ratio = ar_bytes / param_bytes
    # grads (1.0x params) + metric scalars / loss terms; anything >1.6x
    # means XLA started moving activations or re-reducing weights
    assert 1.0 <= ratio <= 1.6, (
        f"all-reduced bytes = {ratio:.2f}x param bytes "
        f"({ar_bytes} vs {param_bytes}): not one gradient tree")
    # XLA fuses the gradient tree into a handful of variadic
    # all-reduces; dozens would mean per-leaf reductions (latency-bound)
    assert len(ar_list) <= 8, [s for s, _ in ar_list]


def test_predicted_dp_efficiency_formula():
    from scaling_model import V5E_ICI_ONEWAY_GBS, predict_dp_efficiency

    # 10 ms step, 0.4 MB gradients: all-reduce time is microseconds,
    # efficiency ~1 on any pod slice
    e = predict_dp_efficiency(0.010, 400_000, 8)
    assert e["efficiency_no_overlap"] > 0.99
    assert e["efficiency_full_overlap"] == 1.0
    # sanity: the ring term really is 2(N-1)/N * B / BW
    expect = 2 * 7 / 8 * 400_000 / V5E_ICI_ONEWAY_GBS
    np.testing.assert_allclose(e["allreduce_s"], expect, rtol=1e-9)


def test_scaling_model_json_recorded():
    import json

    path = os.path.join(REPO, "docs", "scaling_model.json")
    with open(path) as f:
        r = json.load(f)
    for name, row in r["configs"].items():
        assert row["allreduce_bytes"] > 0
        assert 1.0 <= row["allreduce_over_param_ratio"] <= 1.6
        assert row["v5e_8"]["efficiency_no_overlap"] > 0.99, name
        assert row["input_headroom_x"] > 2.0, (
            f"{name}: input pipeline would bottleneck an 8-chip mesh")
