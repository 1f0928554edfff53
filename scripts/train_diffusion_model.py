#!/usr/bin/env python
"""Config-driven diffusion training (reference train_diffusion_model.py).

Usage: python scripts/train_diffusion_model.py <config.yaml> [--resume] [--cpu]

Accepts this repo's configs/ or the reference's config_files/*.yaml verbatim.
"""

from __future__ import annotations

import argparse
import sys

sys.path.insert(0, ".")


def main() -> None:
    from ldm_tpu.utils.cli import add_runtime_args, runtime_setup

    ap = argparse.ArgumentParser()
    ap.add_argument("config")
    ap.add_argument("--resume", action="store_true",
                    help="resume from the latest full-state checkpoint")
    add_runtime_args(ap)
    ap.add_argument("--epochs", type=int, default=None,
                    help="override the config's epoch count (smoke runs)")
    ap.add_argument("--profile", default=None, metavar="DIR",
                    help="capture a jax.profiler trace of the run under DIR")
    args = ap.parse_args()

    from ldm_tpu.config import load_config
    from ldm_tpu.data.loader import create_dataloaders
    from ldm_tpu.factory import build_diffusion, build_model
    from ldm_tpu.training.diffusion_trainer import DiffusionTrainer
    from ldm_tpu.utils.seed import apply_runtime_flags, set_seed

    import dataclasses

    from ldm_tpu.utils.profiling import trace

    config = load_config(args.config)
    if args.epochs is not None:
        config = dataclasses.replace(config, epochs=args.epochs)
    mesh, logger = runtime_setup(args, config)
    set_seed(config.seed)
    apply_runtime_flags(config)
    train_loader, val_loader, _test_loader, classes = create_dataloaders(
        config, allow_synthetic_fallback=not args.strict_data
    )

    trainer = DiffusionTrainer(
        config, build_model(config), build_diffusion(config),
        train_loader, val_loader, classes, mesh=mesh, logger=logger,
    )
    if args.resume and trainer.resume_latest():
        print(f"resumed from step {int(trainer.state.step)}")
    with trace(args.profile):
        trainer.train()


if __name__ == "__main__":
    main()
