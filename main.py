#!/usr/bin/env python
"""The flagship end-to-end augmentation experiment (reference main.py).

Trains a class-conditional DDPM on half the train set, a ResNet classifier on the
other half, generates a synthetic dataset by sampling the DDPM with classifier-free
guidance, then retrains the classifier on five real/synthetic mixes and reports
test F1 for each (report.pdf Table 6).

Usage: python main.py <config.yaml> [--cpu] [--mesh] [--per-class N] [--save-png]
"""

from __future__ import annotations

import argparse
import json
import sys

sys.path.insert(0, ".")


def main() -> None:
    from ldm_tpu.utils.cli import add_runtime_args, runtime_setup

    ap = argparse.ArgumentParser()
    ap.add_argument("config")
    add_runtime_args(ap)
    ap.add_argument("--per-class", type=int, default=None,
                    help="synthetic images per class (default: |diffusion half| / 10)")
    ap.add_argument("--save-png", action="store_true",
                    help="also write the synthetic set as an ImageFolder PNG tree")
    ap.add_argument("--classifier-epochs", type=int, default=None)
    # capability-plus: few-step generation for Phase C.  Default None defers
    # to the family default in run_augmentation_experiment: ancestral DDPM
    # for eps-prediction families (the reference protocol), Heun-25 for
    # rectified flow (measurement-aligned, perf/probe35.json).
    ap.add_argument("--sampler", choices=("ddpm", "ddim", "dpmpp"),
                    default=None)
    ap.add_argument("--ddim-steps", type=int, default=None)
    ap.add_argument("--negative-control", action="store_true",
                    help="also generate a deliberately broken synthetic set "
                         "(5-step, cfg=0) and report its FID proxies plus an "
                         "exp2_broken classifier — evidence the quality "
                         "metrics can fail")
    ap.add_argument("--diffusion-checkpoint", default=None,
                    help="skip Phase A: restore the diffusion TrainState from "
                         "this .msgpack (e.g. a previous protocol run's "
                         "best_state.msgpack) and go straight to generation")
    ap.add_argument("--generator-config", default=None,
                    help="capability-plus: drive Phases A/C with the LATENT "
                         "family — path to a latent config (frozen-VAE "
                         "checkpoint + latent UNet); combine with "
                         "--diffusion-checkpoint to reuse a trained latent "
                         "TrainState. Latent sampling is ~5-14x cheaper per "
                         "image at matched quality (RESULTS.md)")
    args = ap.parse_args()

    from ldm_tpu.config import load_config
    from ldm_tpu.experiments.augmentation import run_augmentation_experiment
    from ldm_tpu.utils.seed import apply_runtime_flags, set_seed

    config = load_config(args.config)
    mesh, logger = runtime_setup(args, config)
    set_seed(config.seed)
    apply_runtime_flags(config)
    result = run_augmentation_experiment(
        config,
        mesh=mesh,
        n_per_class=args.per_class,
        save_png=args.save_png,
        classifier_epochs=args.classifier_epochs,
        logger=logger,
        strict_data=args.strict_data,
        sampler=args.sampler,
        ddim_steps=args.ddim_steps,
        negative_control=args.negative_control,
        diffusion_checkpoint=args.diffusion_checkpoint,
        generator_config=args.generator_config,
    )
    out = {"test_f1": result.test_f1,
           "synthetic_size": result.synthetic_size,
           "fid_pixel": result.fid_pixel,
           "fid_classifier": result.fid_classifier}
    if result.fid_pixel_broken is not None:
        out["fid_pixel_broken"] = result.fid_pixel_broken
        out["fid_classifier_broken"] = result.fid_classifier_broken
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
