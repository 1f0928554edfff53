"""Config → component builders (the composition root).

The reference composes everything through importlib reflection on YAML ``target:``
strings (src/utils.py:48-104, used by train_diffusion_model.py:30-31).  Here the
same config surface drives the typed registry, and the AMP flag (torch GradScaler in
the reference, src/Trainer.py:43) maps to bf16 compute dtype — the TPU-native mixed
precision, which needs no loss scaling.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp

from ldm_tpu.config import Config
from ldm_tpu.diffusion.ddpm import GaussianDiffusion
from ldm_tpu.registry import instantiate_from_config


def compute_dtype(config: Config):
    return jnp.bfloat16 if config.use_amp else jnp.float32


def build_model(config: Config):
    """Instantiate the eps-model (UNet) from the ``model:`` block."""
    mc = config.model
    return instantiate_from_config(
        {"target": mc.target, "params": mc.params}, dtype=compute_dtype(config)
    )


def build_diffusion(config: Config) -> GaussianDiffusion:
    """Instantiate the diffusion process from the ``diffusion:`` block."""
    dc = config.diffusion
    return instantiate_from_config(
        {
            "target": dc.target,
            "params": {
                "n_steps": dc.n_steps,
                "n_samples": dc.n_samples,
                "schedule": dc.schedule,
                "beta_start": dc.beta_start,
                "beta_end": dc.beta_end,
            },
        }
    )


def build_classifier(config: Config, img_channels: int, num_classes: int = 10):
    """ResNet-18-shaped classifier exactly as the experiment pipeline hardcodes it
    (reference main.py:75-87)."""
    from ldm_tpu.models.resnet import ResNetBase

    return ResNetBase(
        img_channels=img_channels,
        out_channels=num_classes,
        n_blocks=(2, 2, 2, 2),
        n_channels=(64, 128, 256, 512),
        dtype=compute_dtype(config),
    )


def config_summary(config: Config) -> dict:
    return dataclasses.asdict(config)
