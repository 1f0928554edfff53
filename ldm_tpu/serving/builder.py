"""Config + checkpoint → a ready :class:`GenerationService`.

Mirrors the composition the one-shot CLI does (scripts/generate_images.py) for
the pixel family, and the latent trainer's wiring (training/latent_trainer.py)
for the latent family — but produces a long-lived serving object instead of a
single sampling run.

Serving defaults to the deterministic DDIM sampler (eta=0): besides being
5-40x cheaper per image than the T-step ancestral loop (RESULTS.md), it is
the sampler whose outputs are bit-reproducible per request seed regardless of
how the batcher packed the request (see service.py's per-slot x_T design).
``sampler="ddpm"`` serves the full ancestral loop when sample quality at
lightly-trained checkpoints matters more than latency; ``sampler="dpmpp"``
(DPM-Solver++ 2M) is also deterministic and reaches DDIM-50-class quality at
~10-15 steps; ``sampler="consistency"`` serves a DISTILLED student
(scripts/distill_consistency.py — checkpoint default switches to
``consistency_model_ema.msgpack``) at 1-4 guidance-free forwards per image,
with per-slot re-noise keys so multistep sampling stays batching-invariant.
"""

from __future__ import annotations

import os
from typing import Optional

from ldm_tpu.config import Config
from ldm_tpu.serving.service import GenerationService


def build_generation_service(
    config: Config,
    checkpoint: Optional[str] = None,
    *,
    use_ema: bool = True,
    sampler: str = "ddim",
    ddim_steps: int = 50,
    eta: float = 0.0,
    cfg_scale: Optional[float] = None,
    batch_size: int = 64,
    max_delay_s: float = 0.02,
    base_seed: Optional[int] = None,
    mesh=None,
    use_native: bool = True,
) -> GenerationService:
    """Build (not start) a GenerationService for a pixel or latent config.

    Args:
      config: a framework config; ``type: latent`` configs must carry the
        ``autoencoder:`` block + ``ae_checkpoint`` like the latent trainer.
      checkpoint: eps-model params path; defaults to the config run dir's
        best checkpoint (EMA weights when ``use_ema``).
      cfg_scale: guidance scale; defaults to ``config.diffusion.cfg_scale``.
      mesh: optional ``jax.sharding.Mesh`` — params replicated over it,
        batch slots data-sharded (DP serving; see GenerationService).
    """
    import jax
    import jax.numpy as jnp

    from ldm_tpu.factory import build_diffusion, build_model, compute_dtype
    from ldm_tpu.training import checkpoint as ckpt

    if sampler not in ("ddim", "ddpm", "dpmpp", "consistency"):
        raise ValueError(
            f"sampler must be ddim, ddpm, dpmpp or consistency, got {sampler!r}"
        )
    cfg = config.diffusion.cfg_scale if cfg_scale is None else cfg_scale
    d = config.data
    pixel_shape = (d.image_size, d.image_size, d.image_channels)
    model = build_model(config)

    if checkpoint is None:
        stem = "consistency_model" if sampler == "consistency" else "diffusion_model"
        name = f"{stem}_ema.msgpack" if use_ema else f"{stem}.msgpack"
        checkpoint = os.path.join(config.checkpoints, name)

    if config.type == "latent":
        from ldm_tpu.models.latent import LatentDiffusionModel
        from ldm_tpu.registry import instantiate_from_config
        from ldm_tpu.training.latent_trainer import latent_shape_of

        assert config.autoencoder is not None, "latent config needs autoencoder:"
        ae = instantiate_from_config(
            {"target": config.autoencoder.target,
             "params": config.autoencoder.params},
            dtype=compute_dtype(config),
        )
        ae_template = jax.jit(ae.init)(
            jax.random.key(0), jnp.zeros((1,) + pixel_shape), jax.random.key(1),
        )
        if config.ae_checkpoint:
            ae_params = jax.device_put(
                ckpt.load_params(config.ae_checkpoint, ae_template))
        else:  # tests / smoke
            ae_params = ae_template
        ae_params = _place(ae_params, mesh)
        factor = config.diffusion.latent_scaling_factor
        if factor == "auto":
            # train-time calibration needs the training data; serving loads
            # the constant the trainer resolved (stored next to the weights).
            factor = _load_calibrated_scaling(config)
        dc = config.diffusion
        ldm = LatentDiffusionModel(
            eps_model=model, autoencoder=ae, latent_scaling_factor=float(factor),
            n_steps=dc.n_steps, linear_start=dc.beta_start, linear_end=dc.beta_end,
        )
        z_shape = latent_shape_of(ae, d.image_size)
        params = _load_params(model, z_shape, checkpoint, mesh)
        diffusion = ldm.diffusion

        def sample_fn(key, classes, x_init, slot_keys=None):
            z0 = _run_sampler(
                diffusion, model, params, key, classes, z_shape, x_init,
                sampler, ddim_steps, eta, cfg, slot_keys,
            )
            return ldm.autoencoder_decode(ae_params, z0)

        return GenerationService(
            sample_fn, image_shape=z_shape, out_shape=pixel_shape,
            num_classes=d.num_classes, batch_size=batch_size,
            max_delay_s=max_delay_s,
            base_seed=config.seed if base_seed is None else base_seed,
            mesh=mesh, per_slot_keys=(sampler == "consistency"),
            use_native=use_native,
        )

    diffusion = build_diffusion(config)
    params = _load_params(model, pixel_shape, checkpoint, mesh)

    def sample_fn(key, classes, x_init, slot_keys=None):
        return _run_sampler(
            diffusion, model, params, key, classes, pixel_shape, x_init,
            sampler, ddim_steps, eta, cfg, slot_keys,
        )

    return GenerationService(
        sample_fn, image_shape=pixel_shape, num_classes=d.num_classes,
        batch_size=batch_size, max_delay_s=max_delay_s,
        base_seed=config.seed if base_seed is None else base_seed,
        mesh=mesh, per_slot_keys=(sampler == "consistency"),
        use_native=use_native,
    )


def _run_sampler(diffusion, model, params, key, classes, shape, x_init,
                 sampler, ddim_steps, eta, cfg, slot_keys=None):
    if sampler == "consistency":
        # distilled student: guidance-free, ``ddim_steps`` doubles as the
        # consistency step count (1-4 is the useful range); per-slot keys
        # keep the multistep re-noise batching-invariant (service contract)
        from ldm_tpu.diffusion.consistency import sample_consistency
        from ldm_tpu.training.consistency_trainer import sampling_timesteps

        return sample_consistency(
            diffusion, model.apply, params, key, classes, shape,
            ts=sampling_timesteps(diffusion.n_steps, ddim_steps),
            x_init=x_init, slot_keys=slot_keys,
        )
    if sampler == "ddim":
        return diffusion.sample_ddim(
            model.apply, params, key, classes, shape,
            n_sample_steps=ddim_steps, eta=eta, cfg_scale=cfg,
            null_label=model.num_classes, x_init=x_init,
        )
    if sampler == "dpmpp":
        # deterministic like DDIM eta=0 — per-request reproducibility under
        # dynamic batching holds for it too (service.py per-slot x_T design)
        return diffusion.sample_dpmpp(
            model.apply, params, key, classes, shape,
            n_sample_steps=ddim_steps, cfg_scale=cfg,
            null_label=model.num_classes, x_init=x_init,
        )
    return diffusion.sample(
        model.apply, params, key, classes, shape, cfg_scale=cfg,
        null_label=model.num_classes, x_init=x_init,
    )


def _load_params(model, input_shape, checkpoint: str, mesh=None):
    """Load eps-model params and place them on device ONCE (a host tree fed to
    a jitted sampler re-uploads ~81 MB per dispatch over the tunnel —
    scripts/generate_images.py learned this the hard way).  With a mesh the
    params are replicated across it (DP serving)."""
    import jax
    import jax.numpy as jnp

    from ldm_tpu.training import checkpoint as ckpt

    template = jax.jit(model.init)(
        jax.random.key(0), jnp.zeros((1,) + tuple(input_shape)),
        jnp.zeros((1,), jnp.int32), jnp.zeros((1,), jnp.int32),
    )
    if not os.path.exists(checkpoint):
        raise FileNotFoundError(
            f"diffusion checkpoint not found: {checkpoint} "
            "(train first, or pass --checkpoint)"
        )
    return _place(jax.device_put(ckpt.load_params(checkpoint, template)), mesh)


def _place(tree, mesh):
    """Replicate a param tree over a serving mesh (no-op without one)."""
    if mesh is None:
        return tree
    import jax

    from ldm_tpu.parallel.mesh import replicated

    return jax.device_put(tree, replicated(mesh))


def _load_calibrated_scaling(config: Config) -> float:
    """Read the trainer-resolved latent scaling constant from the run dir.

    ``latent_scaling_factor: auto`` is calibrated on training data the serving
    host may not have; the latent trainer writes the resolved constant to
    ``<checkpoints>/latent_scaling.json`` at train start so inference-time
    consumers reuse the identical number.
    """
    import json

    path = os.path.join(config.checkpoints, "latent_scaling.json")
    if not os.path.exists(path):
        raise FileNotFoundError(
            f"latent_scaling_factor is 'auto' but {path} does not exist — "
            "train the latent model first (the trainer writes it), or set a "
            "numeric latent_scaling_factor in the config"
        )
    with open(path) as f:
        return float(json.load(f)["latent_scaling_factor"])
