"""Experiment/model registries for paper-style evaluations.

Reference: evaluate/cardiac_model_list.py:11-84 and
evaluate/brain_model_list.py — dicts mapping experiment names →
(experiment path, checkpoint id). Here a yaml-backed registry so model
lists live next to the experiments instead of in code.

yaml format:
  my_caisr_acdc:
    path: ~/expers/sr/ACDC/ae_combined/f0_128
    checkpoint: caisr        # or an epoch number
    downsample_steps: 2
"""
from __future__ import annotations

import os
from typing import Dict

import yaml

# built-in empty registries, extended at runtime or from yaml
CARDIAC_MODEL_SPECS: Dict[str, Dict] = {}
BRAIN_MODEL_SPECS: Dict[str, Dict] = {}


def load_model_specs(path: str) -> Dict[str, Dict]:
    with open(os.path.expanduser(path)) as fp:
        specs = yaml.safe_load(fp) or {}
    for name, spec in specs.items():
        if not isinstance(spec, dict):
            raise ValueError(
                f"{path}: registry entry {name!r} must be a mapping "
                f"with a 'path' key (got {type(spec).__name__})")
        if "path" not in spec:
            raise ValueError(
                f"{path}: registry entry {name!r} has no 'path'")
        spec.setdefault("checkpoint", "caisr")
        spec["path"] = os.path.expanduser(str(spec["path"]))
    return specs


def register_model(registry: Dict[str, Dict], name: str, path: str,
                   checkpoint="caisr", **extra) -> None:
    registry[name] = {"path": os.path.expanduser(path),
                      "checkpoint": checkpoint, **extra}


def get_trainer_for_spec(spec: Dict):
    """Rehydrate the trainer referenced by a registry entry."""
    from ..train import get_trainer

    # an empty/null 'checkpoint:' yaml field parses as None, and
    # get_trainer(model_nbr=None) would skip loading entirely —
    # silently evaluating RANDOM weights; fall back to the default
    # alias. Explicit None test: `or` would also swallow the VALID
    # epoch-0 checkpoint.
    ckpt = spec.get("checkpoint", "caisr")
    if ckpt is None:
        ckpt = "caisr"
    if isinstance(ckpt, str) and ckpt.isdigit():
        ckpt = int(ckpt)
    return get_trainer(spec["path"], model_nbr=ckpt, eval_mode=True)
