"""ldm_tpu — a TPU-native (JAX / XLA / Pallas / pjit) latent-diffusion framework.

A from-scratch rebuild of the capabilities of
``JohanLundberg12/latent-diffusion-models`` (reference mounted read-only at
``/root/reference``): class-conditional DDPM training and classifier-free-guidance
sampling on MNIST/CIFAR-10, a Stable-Diffusion-style VAE autoencoder plus latent
diffusion wiring, a ResNet image classifier, and the end-to-end synthetic-data
augmentation experiment.

Unlike the reference's single-device, Python-loop PyTorch design, everything here is
built TPU-first:

* the full ancestral sampling loop (reference: ``src/DDPM.py:98-130``, a Python loop
  with two UNet calls and a host sync per step) is ONE on-device ``lax.scan`` with
  batched classifier-free guidance;
* training steps are single jitted functions (bf16 compute, fp32 params) that are
  data-parallel over an ICI device mesh via ``jax.sharding`` — no GradScaler needed;
* metrics (loss, micro-F1) are accumulated on device, not via per-batch host syncs.

Layout::

    ldm_tpu/
      config.py       YAML config system (schema-compatible with the reference's
                      config_files/*.yaml) + typed dataclasses
      registry.py     registry-based model factory (replaces importlib reflection,
                      reference src/utils.py:48-104)
      diffusion/      schedules + the DDPM process (pure functions, lax.scan sampler)
      models/         UNet, Autoencoder (VAE), ResNet classifier, latent wrapper (flax)
      training/       TrainState (params+opt+EMA+PRNG), trainers, early stopping,
                      atomic msgpack checkpointing
      data/           MNIST/CIFAR-10 readers, transforms, host-sharded batch iterator
      parallel/       device mesh + sharding helpers (DP over ICI)
      ops/            Pallas TPU kernels and their jnp fallbacks
      utils/          metrics logging (JSONL/stdout), image IO, timing, visualization
"""

__version__ = "0.1.0"
