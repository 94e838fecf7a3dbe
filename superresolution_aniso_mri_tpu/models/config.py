"""Model architecture configuration.

Mirrors the hyper-parameter surface of the reference's model zoo
(reference: networks/acai_vanilla.py:112-138, networks/net_config.py:10-92)
but as an explicit dataclass instead of a raw arg dict.
"""
from __future__ import annotations

import dataclasses
import math
from typing import Optional

import jax.numpy as jnp

_DTYPES = {
    "float32": jnp.float32,
    "bfloat16": jnp.bfloat16,
}


@dataclasses.dataclass(frozen=True)
class AEConfig:
    """Architecture hyper-parameters shared by all autoencoder variants.

    ``scales`` is derived exactly like the reference
    (``round(log2(width / latent_width))``, networks/acai_vanilla.py:116).
    Unlike the reference's encoder stem (a 1x1 conv with padding=1 that
    grows H/W by 2 and relies on AvgPool flooring), our encoder is
    shape-exact: ``latent_width == width >> scales`` always holds, which
    keeps every shape static for XLA.
    """

    width: int = 128
    latent_width: int = 16
    depth: int = 32
    latent: int = 16
    colors: int = 1
    use_batchnorm: bool = True
    use_sigmoid: bool = True
    n_res_block: Optional[int] = None
    # nearest-neighbour upsample (True) vs ConvTranspose decoder blocks
    # (reference: acai_vanilla.py:75 use_upsample)
    use_upsample: bool = True
    nclasses: int = 4  # only used by MultiChannelAE
    # compute dtype for conv stacks; params are always float32.
    compute_dtype: str = "float32"
    # Reference-faithful stem geometry: the reference's 1x1 stem conv
    # uses padding=1 (networks/acai_vanilla.py:51, acai_multi_channel.
    # py:25), growing H/W by 2 before the pools floor it back — with
    # scales >= 2 the latent shape is unchanged, but every intermediate
    # activation (and any imported BatchNorm running stat) corresponds
    # to that padded grid. Enable when evaluating IMPORTED reference
    # torch checkpoints so activations match the network they were
    # trained in; the default shape-exact stem is the better TPU design
    # for fresh trainings (no odd intermediate sizes).
    stem_pad_parity: bool = False

    def __post_init__(self):
        # fail fast on non-power-of-2 width ratios: the docstring's
        # shape-exact invariant (latent_width == width >> scales) is
        # what alpha probes / VAE unflatten rely on — a rounded scales
        # value would mis-shape latents far from the root cause.
        # (scales < 0 — swapped width/latent_width — must hit THIS
        # message too, not a cryptic 'negative shift count' from <<)
        if self.scales < 0 or self.width != (self.latent_width
                                             << self.scales):
            raise ValueError(
                f"width ({self.width}) must be latent_width "
                f"({self.latent_width}) * a power of 2 — got ratio "
                f"{self.width / self.latent_width:g}")
        if self.stem_pad_parity and self.scales < 2:
            raise ValueError(
                "stem_pad_parity needs scales >= 2 (two pools absorb "
                "the +2 stem padding; at scales < 2 the reference "
                "latent grid is genuinely larger and incompatible with "
                "the shape-exact latent invariant)")

    @property
    def scales(self) -> int:
        return int(round(math.log2(self.width / self.latent_width)))

    @property
    def dtype(self):
        return _DTYPES[self.compute_dtype]

    @classmethod
    def from_args(cls, args: dict) -> "AEConfig":
        """Build from a flat experiment-settings dict (settings.yaml)."""
        return cls(
            width=int(args["width"]),
            latent_width=int(args["latent_width"]),
            depth=int(args["depth"]),
            latent=int(args["latent"]),
            colors=int(args.get("colors", 1)),
            use_batchnorm=bool(args.get("use_batchnorm", False)),
            use_sigmoid=bool(args.get("use_sigmoid", False)),
            n_res_block=(int(args["n_res_block"])
                         if args.get("n_res_block") not in (None, "")
                         else None),
            use_upsample=bool(args.get("use_upsample", True)),
            nclasses=int(args.get("nclasses", 4)),
            compute_dtype=str(args.get("compute_dtype", "float32")),
            stem_pad_parity=bool(args.get("stem_pad_parity", False)),
        )
