#!/usr/bin/env python
"""Convert a reference (PyTorch) experiment into framework format.

The reference stores experiments as a ``settings.yaml`` plus
``models/<epoch>.models`` torch pickles holding
``{'model_dict_ae', 'optimizer_dict_ae', 'epoch'}``
(reference: kwatsch/base_trainer.py:353-367, kwatsch/get_trainer.py:42-78).
This tool rewrites every checkpoint as the framework's msgpack format so
an existing reference experiment directory drops straight into the
evaluation / inference CLIs. (Conversion is optional for loading — the
Trainer auto-detects torch pickles — but converted files load without
torch installed and carry optimizer state forward consistently.)

  python tools/convert_reference_checkpoint.py \
      --exper_dir ~/expers/ref_run --output_dir ~/expers/ref_run_tpu

Single files work too:

  python tools/convert_reference_checkpoint.py \
      --exper_dir ~/expers/ref_run --files ae.models caisr.models
"""
import argparse
import glob
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _load_settings_lenient(path):
    """Reference settings.yaml are yaml.dump'd argparse namespaces — they
    may carry non-safe tags (e.g. python/tuple); fall back to FullLoader."""
    from superresolution_aniso_mri_tpu.config.settings import (
        apply_setting_defaults, load_settings,
    )
    try:
        return load_settings(path)
    except Exception:
        import yaml
        with open(path) as fp:
            args = yaml.load(fp, Loader=yaml.FullLoader)
        if not isinstance(args, dict):
            raise
        return apply_setting_defaults(args)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--exper_dir", required=True,
                   help="reference experiment dir (settings.yaml + models/)")
    p.add_argument("--output_dir", default=None,
                   help="destination experiment dir (default: convert "
                        "in place, writing <name>.models alongside with "
                        "the originals preserved as <name>.models.torch)")
    p.add_argument("--files", nargs="*", default=None,
                   help="specific checkpoint filenames under models/ "
                        "(default: all *.models)")
    args = p.parse_args()

    from superresolution_aniso_mri_tpu.config.settings import (
        save_experiment_settings,
    )
    from superresolution_aniso_mri_tpu.train import Trainer
    from superresolution_aniso_mri_tpu.train.checkpoint import (
        save_checkpoint,
    )
    from superresolution_aniso_mri_tpu.train.import_torch import (
        is_torch_checkpoint, load_torch_reference,
    )

    src = os.path.expanduser(args.exper_dir)
    settings = _load_settings_lenient(os.path.join(src, "settings.yaml"))
    settings["output_dir"] = None       # no experiment-dir side effects
    settings.pop("device", None)        # reference-only key
    trainer = Trainer(settings, eval_mode=True)

    names = args.files or sorted(
        os.path.basename(f)
        for f in glob.glob(os.path.join(src, "models", "*.models")))
    if not names:
        raise SystemExit(f"no *.models files under {src}/models")

    dst = os.path.expanduser(args.output_dir) if args.output_dir else src
    same_dir = os.path.abspath(dst) == os.path.abspath(src)
    os.makedirs(os.path.join(dst, "models"), exist_ok=True)
    n_done = 0
    for name in names:
        fsrc = os.path.join(src, "models", name)
        if not is_torch_checkpoint(fsrc):
            print(f"skip {name}: already framework format")
            continue
        state, epoch = load_torch_reference(fsrc, trainer.state)
        fdst = os.path.join(dst, "models", name)
        if os.path.abspath(fdst) == os.path.abspath(fsrc):
            os.replace(fsrc, fsrc + ".torch")
        save_checkpoint(fdst, state, epoch)
        print(f"converted {name} (epoch {epoch})")
        n_done += 1

    if not same_dir:
        save_experiment_settings(settings,
                                 os.path.join(dst, "settings.yaml"))
        for aux in ("loss_iters.npz", "losses_train.npz",
                    "losses_test.npz"):
            a = os.path.join(src, aux)
            if os.path.isfile(a):
                import shutil
                shutil.copy2(a, os.path.join(dst, aux))
    print(f"done: {n_done} checkpoint(s) converted into {dst}")


if __name__ == "__main__":
    main()
