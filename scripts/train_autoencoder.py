#!/usr/bin/env python
"""VAE autoencoder training (the reference's train_autoencoder.py crashes on import
— SURVEY.md §2.16; this is the working equivalent).

Usage: python scripts/train_autoencoder.py <config.yaml> [--cpu] [--mesh]
"""

from __future__ import annotations

import argparse
import sys

sys.path.insert(0, ".")


def main() -> None:
    from ldm_tpu.utils.cli import add_runtime_args, runtime_setup

    ap = argparse.ArgumentParser()
    ap.add_argument("config")
    add_runtime_args(ap)
    args = ap.parse_args()

    from ldm_tpu.config import load_config
    from ldm_tpu.data.loader import create_dataloaders
    from ldm_tpu.registry import instantiate_from_config
    from ldm_tpu.factory import compute_dtype
    from ldm_tpu.training.autoencoder_trainer import AutoencoderTrainer
    from ldm_tpu.utils.seed import apply_runtime_flags, set_seed

    config = load_config(args.config)
    mesh, logger = runtime_setup(args, config)
    set_seed(config.seed)
    apply_runtime_flags(config)
    train_loader, val_loader, _test, _classes = create_dataloaders(
        config, allow_synthetic_fallback=not args.strict_data
    )
    model = instantiate_from_config(
        {"target": config.model.target, "params": config.model.params},
        dtype=compute_dtype(config),
    )
    trainer = AutoencoderTrainer(
        config, model, train_loader, val_loader, mesh=mesh, logger=logger,
    )
    trainer.train()


if __name__ == "__main__":
    main()
