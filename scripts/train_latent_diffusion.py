#!/usr/bin/env python
"""Latent diffusion training: DDPM over frozen-VAE latents.

Completes the reference's aspirational latent path (src/LatentDiffusionModel.py has
no working trainer/entry point, SURVEY.md §2.16).  The config must carry an
``autoencoder:`` block (arch) and ``ae_checkpoint`` (params saved by
scripts/train_autoencoder.py); the ``model:`` block is the latent-space UNet.

Usage: python scripts/train_latent_diffusion.py <config.yaml> [--cpu] [--mesh]
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

    import jax
    import jax.numpy as jnp

    from ldm_tpu.config import load_config
    from ldm_tpu.data.loader import create_dataloaders
    from ldm_tpu.factory import build_model, compute_dtype
    from ldm_tpu.models.latent import LatentDiffusionModel
    from ldm_tpu.parallel.mesh import create_mesh
    from ldm_tpu.registry import instantiate_from_config
    from ldm_tpu.training import checkpoint as ckpt
    from ldm_tpu.training.latent_trainer import LatentDiffusionTrainer
    from ldm_tpu.utils.seed import apply_runtime_flags, set_seed

    config = load_config(args.config)
    assert config.autoencoder is not None, "config needs an autoencoder: block"
    mesh, logger = runtime_setup(args, config)
    set_seed(config.seed)
    apply_runtime_flags(config)

    ae = instantiate_from_config(
        {"target": config.autoencoder.target, "params": config.autoencoder.params},
        dtype=compute_dtype(config),
    )
    d = config.data
    ae_template = jax.jit(ae.init)(
        jax.random.key(0),
        jnp.zeros((1, d.image_size, d.image_size, d.image_channels)),
        jax.random.key(1),
    )
    if config.ae_checkpoint:
        ae_params = ckpt.load_params(config.ae_checkpoint, ae_template)
        print(f"loaded frozen autoencoder from {config.ae_checkpoint}")
    else:
        print("WARNING: no ae_checkpoint configured — using random-init autoencoder")
        ae_params = ae_template

    train_loader, val_loader, _test, classes = create_dataloaders(
        config, allow_synthetic_fallback=not args.strict_data
    )
    from ldm_tpu.training.latent_trainer import resolve_latent_scaling

    scaling = resolve_latent_scaling(config, ae, ae_params, train_loader)
    if config.diffusion.latent_scaling_factor == "auto":
        print(f"calibrated latent_scaling_factor = {scaling:.5f} (1/std of latents)")

    dc = config.diffusion
    ldm = LatentDiffusionModel(
        eps_model=build_model(config),
        autoencoder=ae,
        latent_scaling_factor=scaling,
        n_steps=dc.n_steps,
        linear_start=dc.beta_start,
        linear_end=dc.beta_end,
    )
    trainer = LatentDiffusionTrainer(
        config, ldm, ae_params, train_loader, val_loader, classes,
        mesh=mesh, logger=logger,
    )
    trainer.train()


if __name__ == "__main__":
    main()
