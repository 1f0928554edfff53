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
