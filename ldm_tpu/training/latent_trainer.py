"""Latent diffusion trainer: DDPM over frozen-VAE latents.

The reference's latent path is aspirational — ``LatentDiffusionModel`` exists
(src/LatentDiffusionModel.py) but no trainer or entry point drives it, and its
decode is broken (SURVEY.md §2.16).  This trainer completes the capability:

* the frozen autoencoder's encode runs INSIDE the jitted train step — images go
  host→HBM once, latents never leave the device (BASELINE.json: "latents
  HBM-resident end-to-end");
* the autoencoder params are closed over as constants (not part of TrainState), the
  idiomatic JAX way to freeze a first stage;
* sampling draws latents with the lax.scan ancestral loop and decodes to images in
  the same jitted program.
"""

from __future__ import annotations

from typing import Optional

import jax

import numpy as np

from ldm_tpu.config import Config
from ldm_tpu.models.latent import LatentDiffusionModel
from ldm_tpu.training.diffusion_trainer import DiffusionTrainer
from ldm_tpu.utils.logging import MetricsLogger

Array = jax.Array


def resolve_latent_scaling(config: Config, autoencoder, ae_params, train_loader) -> float:
    """Resolve ``diffusion.latent_scaling_factor`` — a float, or ``"auto"`` to
    calibrate 1/std on a deterministic batch of training images (the first
    ≤512, transformed like training batches, keyed by the config seed).
    Train- and sample-time callers resolve to the identical constant."""
    factor = config.diffusion.latent_scaling_factor
    if factor != "auto":
        return float(factor)
    import jax.numpy as jnp

    from ldm_tpu.models.latent import calibrate_latent_scaling

    images = train_loader.transform(train_loader.dataset.images[:512])
    return calibrate_latent_scaling(
        autoencoder, ae_params, jnp.asarray(images),
        jax.random.key(config.seed),
    )


def _persist_latent_scaling(config: Config, factor: float) -> None:
    """Write the resolved scaling constant next to the checkpoints.

    ``latent_scaling_factor: auto`` is calibrated on TRAINING data
    (resolve_latent_scaling); inference-time consumers that don't hold the
    training set (ldm_tpu/serving/builder.py) must reuse the identical
    constant — a mismatched decode scale is this family's authentic failure
    mode (RESULTS.md, probe22 vs probe23).  Process-0-only like every other
    checkpoint write."""
    import json
    import os

    if jax.process_index() != 0:
        return
    os.makedirs(config.checkpoints, exist_ok=True)
    path = os.path.join(config.checkpoints, "latent_scaling.json")
    with open(path, "w") as f:
        json.dump({"latent_scaling_factor": float(factor)}, f)


def latent_shape_of(autoencoder, image_size: int):
    """Spatial downsampling is 2^(n_resolutions - 1) (reference Encoder downsamples
    after every top-level block except the last, src/Autoencoder.py:241-244)."""
    factor = 2 ** (len(autoencoder.channel_multipliers) - 1)
    z = image_size // factor
    return (z, z, autoencoder.z_channels)


class LatentDiffusionTrainer(DiffusionTrainer):
    def __init__(
        self,
        config: Config,
        ldm: LatentDiffusionModel,
        ae_params,  # trained (frozen) autoencoder params
        train_loader,
        val_loader,
        classes,
        mesh=None,
        logger: Optional[MetricsLogger] = None,
    ):
        self.ldm = ldm
        self.ae_params = ae_params
        _persist_latent_scaling(config, ldm.latent_scaling_factor)
        z_shape = latent_shape_of(ldm.autoencoder, config.data.image_size)
        super().__init__(
            config, ldm.eps_model, ldm.diffusion, train_loader, val_loader,
            classes, mesh=mesh, logger=logger, input_shape=z_shape,
        )

    @property
    def output_image_shape(self):
        """Decoded image geometry (sampling returns VAE-decoded images, not
        the 4x4xz latents the diffusion scan runs over)."""
        d = self.config.data
        return (d.image_size, d.image_size, d.image_channels)

    def _encode(self, key: Array, image: Array) -> Array:
        """scale * encode(image).sample() inside the jitted step
        (reference src/LatentDiffusionModel.py:57-65)."""
        return self.ldm.autoencoder_encode(self.ae_params, key, image)

    def _postprocess(self, z0: Array, decode_scale_override: float = 0.0) -> Array:
        """Decode sampled latents to images inside the same jitted program —
        latents never leave HBM (BASELINE.json north star).

        ``decode_scale_override`` != 0 decodes with that scale instead of the
        calibrated one — the latent family's AUTHENTIC failure mode (the
        reference hardcodes Stable Diffusion's 0.18215 for every VAE,
        src/LatentDiffusionModel.py:28; measured classifier-FID 5.98 vs 0.97
        calibrated, perf/probe22.json).  Used as the protocol's latent
        negative control: the pixel family's few-step/unguided break does not
        degrade this family (unguided sampling IS the true conditional
        distribution — RESULTS.md probe25 table)."""
        if decode_scale_override:
            return self.ldm.autoencoder.apply(
                self.ae_params, z0 / decode_scale_override, method="decode"
            )
        return self.ldm.autoencoder_decode(self.ae_params, z0)
