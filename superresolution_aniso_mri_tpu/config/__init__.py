"""Configuration: settings persistence, CLI arguments, routing."""
from .settings import (save_experiment_settings, load_settings,
                       apply_setting_defaults)

__all__ = ["save_experiment_settings", "load_settings",
           "apply_setting_defaults"]
