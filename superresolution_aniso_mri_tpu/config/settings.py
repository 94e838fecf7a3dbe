"""Experiment settings persistence (settings.yaml round trip).

Reference: kwatsch/common.py:45-69 saveExperimentSettings/loadExperimentSettings
and the rehydration defaults of kwatsch/get_trainer.py:61-64,115-117.
An experiment directory is fully described by its settings.yaml — every
eval/inference tool reconstructs the trainer from it.
"""
from __future__ import annotations

import os
from typing import Any, Dict

import numpy as np
import yaml


def _to_plain(obj):
    if isinstance(obj, dict):
        return {k: _to_plain(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return [_to_plain(v) for v in obj]
    if isinstance(obj, np.generic):
        return obj.item()
    if isinstance(obj, np.ndarray):
        return obj.tolist()
    return obj


def save_experiment_settings(args: Dict[str, Any], fname: str) -> None:
    os.makedirs(os.path.dirname(fname) or ".", exist_ok=True)
    with open(fname, "w") as fp:
        yaml.safe_dump(_to_plain(dict(args)), fp, sort_keys=True)


def load_settings(fname: str) -> Dict[str, Any]:
    with open(fname, "r") as fp:
        args = yaml.safe_load(fp)
    if not isinstance(args, dict):
        raise ValueError(
            f"{fname}: empty or corrupt settings.yaml "
            f"(parsed as {type(args).__name__}, expected a mapping)")
    return apply_setting_defaults(args)


def apply_setting_defaults(args: Dict[str, Any]) -> Dict[str, Any]:
    """Backward-compat defaulting when rehydrating old experiments
    (reference: get_trainer.py:61-64,115-117).

    use_sigmoid/use_batchnorm default FALSE here on purpose: the
    reference's model layer applies exactly these fallbacks when the
    keys are missing from a rehydrated args dict
    (reference: networks/acai_multi_channel.py:74-77) — the
    architecture-layer True defaults (net_config) apply only when a NEW
    training merges them, and a post-merge settings.yaml always carries
    the keys explicitly."""
    defaults = {
        "use_sigmoid": False,
        "use_batchnorm": False,
        "n_res_block": None,
        "colors": 1,
        "use_laploss": False,
        "use_percept_loss": False,
        "image_mix_loss_func": None,
        "use_extra_latent_loss": False,
        "use_loss_annealing": False,
        "get_masks": False,
        "ex_loss_weight1": 0.001,
        "lamb_reg_acai": 0.5,
        "vae_beta": 0.0,
        "lamb": 1.0,
        "ae_class": "VanillaACAI",
        "slice_selection": "adjacent_plus",
        "momentum": 0.9,
        "weight_decay": 0.0,
        "epoch_threshold": 100,
        "lr_warmup_steps": 0,
        "compute_dtype": "float32",
        "nclasses": 4,
        "ema_decay": 0.0,
        "stem_pad_parity": False,
    }
    for k, v in defaults.items():
        args.setdefault(k, v)
    return args
