"""Forward-process visualization (reference root utils.py:16-85).

``forward_diffusion_at`` noises an image at a chosen t and reverse-transforms it
(reference ``test_forward_diffusion``); ``forward_process_grid`` sweeps t (step 10
like ``viz_of_forward_process``) and tiles the result into one PNG — PIL-based, no
matplotlib dependency.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ldm_tpu.data.transforms import reverse_transform
from ldm_tpu.diffusion.ddpm import GaussianDiffusion
from ldm_tpu.utils.images import image_grid, save_images


def forward_diffusion_at(
    diffusion: GaussianDiffusion,
    image: np.ndarray,  # (H, W, C) float in [-1, 1]
    t: int,
    key: Optional[jax.Array] = None,
) -> np.ndarray:
    """q_sample the image at step t; return uint8 HWC (utils.py:16-44)."""
    key = key if key is not None else jax.random.key(0)
    x0 = jnp.asarray(image)[None]
    eps = jax.random.normal(key, x0.shape, x0.dtype)
    xt = diffusion.q_sample(x0, jnp.array([t], jnp.int32), eps)
    return reverse_transform(np.asarray(xt))[0]


def forward_process_grid(
    diffusion: GaussianDiffusion,
    image: np.ndarray,
    ts: Optional[Sequence[int]] = None,
    out_path: Optional[str] = None,
) -> np.ndarray:
    """Sweep t (default: every 10th step, utils.py:71-85) into one grid image."""
    if ts is None:
        ts = list(range(0, diffusion.n_steps, 10))
    # one batched q_sample over all t values — not a per-t Python loop
    key = jax.random.key(0)
    x0 = jnp.broadcast_to(jnp.asarray(image)[None], (len(ts),) + image.shape)
    eps = jax.random.normal(key, x0.shape, x0.dtype)
    xt = diffusion.q_sample(x0, jnp.asarray(ts, jnp.int32), eps)
    grid = image_grid(reverse_transform(np.asarray(xt)))
    if out_path:
        save_images([grid], [out_path])
    return grid
