"""Model zoo: registry maps `ae_class` names (as used in settings.yaml)
to Flax modules — the TPU-native replacement of the reference's
string-module-path dynamic import (reference: networks/net_config.py:2-7,
kwatsch/get_trainer.py:67-78)."""
from .config import AEConfig
from .acai import VanillaACAI, Encoder, Decoder, Discriminator, lerp, swap_halves
from .vae import VAE, VAE2
from .multi_channel import MultiChannelAE
from .variants import LargerAE, VanillaACAIStrided
from .alpha import make_alpha_probe, AlphaDecoder, SELayer
from .legacy import (LegacyAE, LegacyAEAdv, DiscriminatorSpatial,
                     DiscriminatorFakeReal)

MODEL_REGISTRY = {
    "VanillaACAI": VanillaACAI,
    "VAE": VAE,
    "VAE2": VAE2,
    "MultiChannelAE": MultiChannelAE,
    "LargerAE": LargerAE,
    "VanillaACAIStrided": VanillaACAIStrided,
}


def build_model(ae_class: str, config: AEConfig):
    """Instantiate a model by its `ae_class` registry name."""
    try:
        cls = MODEL_REGISTRY[ae_class]
    except KeyError:
        raise ValueError(
            f"unknown ae_class {ae_class!r}; known: {sorted(MODEL_REGISTRY)}"
        ) from None
    return cls(config)


__all__ = [
    "AEConfig", "VanillaACAI", "Encoder", "Decoder", "Discriminator",
    "VAE", "VAE2", "MultiChannelAE", "LargerAE", "VanillaACAIStrided",
    "MODEL_REGISTRY", "build_model", "make_alpha_probe", "AlphaDecoder",
    "SELayer", "lerp", "swap_halves", "LegacyAE", "LegacyAEAdv",
    "DiscriminatorSpatial", "DiscriminatorFakeReal",
]
