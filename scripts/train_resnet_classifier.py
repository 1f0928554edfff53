#!/usr/bin/env python
"""ResNet classifier training with optional synthetic-data pretraining
(reference train_resnet_classifier.py:33-70).

Usage: python scripts/train_resnet_classifier.py <config.yaml>
           [--pretrain-dir DIR] [--cpu] [--mesh]

``--pretrain-dir`` points at an ImageFolder-layout PNG tree (class-per-subdir), as
written by scripts/generate_images.py or the augmentation experiment.
"""

from __future__ import annotations

import argparse
import sys

sys.path.insert(0, ".")


def main() -> None:
    from ldm_tpu.utils.cli import add_runtime_args, runtime_setup

    ap = argparse.ArgumentParser()
    ap.add_argument("config")
    ap.add_argument("--pretrain-dir", default=None)
    add_runtime_args(ap)
    args = ap.parse_args()

    from ldm_tpu.config import load_config
    from ldm_tpu.data.loader import DataLoader, create_dataloaders
    from ldm_tpu.factory import build_classifier
    from ldm_tpu.training.resnet_trainer import ResNetTrainer
    from ldm_tpu.utils.images import load_image_folder
    from ldm_tpu.utils.seed import apply_runtime_flags, set_seed

    config = load_config(args.config)
    if config.loss_fn == "mse":
        config.loss_fn = "cross-entropy"
    mesh, logger = runtime_setup(args, config)
    set_seed(config.seed)
    apply_runtime_flags(config)
    train_loader, val_loader, test_loader, classes = create_dataloaders(
        config, allow_synthetic_fallback=not args.strict_data
    )
    model = build_classifier(
        config, config.data.image_channels, len(classes)
    )
    trainer = ResNetTrainer(
        config, model, train_loader, val_loader, classes,
        test_loader=test_loader, mesh=mesh, logger=logger,
    )
    if args.pretrain_dir:
        # grayscale ImageFolder pretraining pass (reference :37-44, :56-61)
        pre = load_image_folder(
            args.pretrain_dir, config.data.image_size,
            grayscale=config.data.image_channels == 1,
        )
        trainer.run("pretrain", DataLoader(pre, config.batch_size, seed=config.seed))
    trainer.train()
    stats = trainer.test()
    print(f"test F1 (micro): {stats['f1_micro']:.4f}  "
          f"(macro): {stats['f1_macro']:.4f}  loss: {stats['loss']:.4f}")


if __name__ == "__main__":
    main()
