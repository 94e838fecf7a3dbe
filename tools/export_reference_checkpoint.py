#!/usr/bin/env python
"""Export a framework experiment checkpoint to the reference's torch
``.models`` format — the inverse of tools/convert_reference_checkpoint.py.

A model trained HERE becomes loadable by the ORIGINAL PyTorch codebase
(qurAI-amsterdam/SuperResolution_aniso_MRI): the output pickle holds
``{'model_dict_ae', 'optimizer_dict_ae', 'epoch'}`` with the NCHW
Sequential state dict its Encoder/Decoder generators expect
(networks/acai_vanilla.py:49-102, kwatsch/base_trainer.py:358-362).

  python tools/export_reference_checkpoint.py \
      --exper_dir /path/to/exper --model_nbr caisr --out caisr_ref.models

Architecture flags are read from the experiment's settings.yaml; works
for the VanillaACAI/LargerAE-shaped families the reference persists
(multichannel / strided-transpose variants are rejected with a clear
error, mirroring the importer's scope).
"""
import argparse
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--exper_dir", type=str, required=True)
    p.add_argument("--model_nbr", type=str, default="caisr",
                   help="epoch number or 'ae'/'caisr'/'last'")
    p.add_argument("--out", type=str, required=True,
                   help="output .models path (torch pickle)")
    args = p.parse_args()

    import jax
    jax.config.update("jax_platforms", "cpu")  # host-side conversion

    from superresolution_aniso_mri_tpu.train import get_trainer
    from superresolution_aniso_mri_tpu.train.export_torch import (
        save_reference_checkpoint,
    )

    trainer = get_trainer(os.path.expanduser(args.exper_dir),
                          model_nbr=args.model_nbr, eval_mode=True)
    cfg = trainer.model_config  # AEConfig parsed from settings.yaml
    state = trainer.state
    save_reference_checkpoint(
        os.path.expanduser(args.out),
        jax.device_get(state.params),
        jax.device_get(state.batch_stats or {}),
        width=cfg.width, latent_width=cfg.latent_width,
        depth=cfg.depth, latent=cfg.latent, colors=cfg.colors,
        use_batchnorm=cfg.use_batchnorm, use_sigmoid=cfg.use_sigmoid,
        n_res_block=cfg.n_res_block,
        epoch=int(getattr(trainer, "epoch", 0) or 0),
        lr=float(trainer.args.get("lr", 0.0001) or 0.0001))
    print(f"exported {args.exper_dir} [{args.model_nbr}] -> {args.out}")


if __name__ == "__main__":
    main()
