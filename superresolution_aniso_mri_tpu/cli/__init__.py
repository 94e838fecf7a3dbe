"""CLI layer: shared training loop + entry points."""
from .train_loop import run_training, build_augment_config

__all__ = ["run_training", "build_augment_config"]
