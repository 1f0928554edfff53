"""Seeding (reference ``set_seed``, src/utils.py:144-151, pinned to 42).

In JAX, randomness is explicit: the seed becomes a ``jax.random.key`` that threads
through the TrainState; numpy RNGs (data shuffling) are seeded per-loader.  This
helper exists for API parity and to seed host-side numpy."""

from __future__ import annotations

import random

import numpy as np


def set_seed(seed: int = 42) -> int:
    random.seed(seed)
    np.random.seed(seed)
    return seed


def apply_runtime_flags(config) -> None:
    """Apply config-driven JAX runtime flags (entry points call this once).

    * ``debug_nans`` — abort at the first op producing a NaN (jax_debug_nans),
      the numeric sanitizer the reference lacks (SURVEY.md §5).  Applied BOTH
      ways so a long-lived process honors each loaded config.
    * persistent compilation cache under ``<workdir>/.jax_cache`` — verified
      effective in this environment (a 60 s scan compile replays in <1 s), so
      repeat runs skip the multi-minute UNet/sampler compiles."""
    import os

    import jax

    jax.config.update("jax_debug_nans", bool(getattr(config, "debug_nans", False)))
    workdir = getattr(config, "workdir", None)
    if workdir and not jax.config.jax_compilation_cache_dir:
        cache = os.path.join(workdir, ".jax_cache")
        os.makedirs(cache, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
