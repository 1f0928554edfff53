"""Consistency distillation — 1-4-step sampling from a trained DDPM.

Capability-plus over the reference (whose only sampler is the T-step
ancestral loop, src/DDPM.py:98-130) and over this framework's own DDIM /
DPM-Solver++ few-step samplers: a *student* copy of the eps-UNet is trained
so that one forward pass maps any point of the guided probability-flow ODE
trajectory straight to its x_0 endpoint (Song et al. 2023, "Consistency
Models", arXiv:2303.01469 — the distillation variant; guidance baked in as
in "Latent Consistency Models", Luo et al. 2023, arXiv:2310.04378).

TPU-first shape of the implementation:

* the student IS the existing UNet (same params tree, eps-output head) —
  the consistency function is a reparameterization *around* it, so every
  tuned attention kernel / layout decision carries over unchanged;
* the teacher's guided ODE step inside the distillation loss is the fused
  2B-batch CFG forward + the deterministic DDIM update already used by the
  samplers (one dispatch, MXU-shaped);
* after distillation, sampling needs NO guidance pass: one B-batch forward
  per step (vs 2B per step for every CFG sampler) — a 2x per-step saving on
  top of the step-count reduction;
* multistep sampling (2-4 steps) is a tiny unrolled loop of
  ``f → re-noise → f`` inside one jit, deterministic per key.

Boundary parameterization (the discrete-timestep form used by LCM,
arXiv:2310.04378 eq. 5-6, sigma_data=0.5, timestep scaling 10):

    f(x, t) = c_skip(t) * x + c_out(t) * x0_pred(x, t)
    c_skip(t) = sd^2 / ((10 t)^2 + sd^2),  c_out(t) = 10 t / sqrt((10 t)^2 + sd^2)

so ``f(x, 0) == x`` exactly (the consistency boundary condition) and
``f ~= x0_pred`` everywhere else; ``x0_pred`` is the usual eps→x0 map.
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ldm_tpu.diffusion.ddpm import GaussianDiffusion, gather

Array = jax.Array


def boundary_scalings(
    t: Array, sigma_data: float = 0.5, t_scale: float = 10.0
) -> Tuple[Array, Array]:
    """(c_skip, c_out) per sample, broadcastable over NHWC; exact at t=0."""
    st = (t.astype(jnp.float32) * t_scale).reshape(-1, 1, 1, 1)
    denom2 = st * st + sigma_data * sigma_data
    c_skip = (sigma_data * sigma_data) / denom2
    c_out = st * jax.lax.rsqrt(denom2)
    return c_skip, c_out


def consistency_fn(
    diffusion: GaussianDiffusion,
    apply_fn: Callable[..., Array],
    params,
    x: Array,
    t: Array,
    y: Array,
    sigma_data: float = 0.5,
    t_scale: float = 10.0,
) -> Array:
    """f(x, t): one student forward → the trajectory's x_0 estimate (fp32)."""
    eps = apply_fn(params, x, t, y).astype(jnp.float32)
    ab = gather(diffusion.schedule.alpha_bars, t)
    x32 = x.astype(jnp.float32)
    x0_pred = (x32 - jnp.sqrt(1.0 - ab) * eps) * jax.lax.rsqrt(ab)
    c_skip, c_out = boundary_scalings(t, sigma_data, t_scale)
    return c_skip * x32 + c_out * x0_pred


def boundary_timesteps(n_steps: int, skip: int) -> np.ndarray:
    """Ascending distillation boundaries 0, skip, 2*skip, ..., n_steps-1.

    Adjacent pairs (sub[i] → sub[i+1]) are the teacher-ODE segments the
    student learns to collapse; the top boundary is pinned to n_steps-1 so
    inference can start from the same prior as the other samplers.
    """
    if not 0 < skip < n_steps:
        raise ValueError(f"skip must be in (0, {n_steps}), got {skip}")
    sub = np.arange(0, n_steps, skip, dtype=np.int32)
    if sub[-1] != n_steps - 1:
        sub = np.append(sub, np.int32(n_steps - 1))
    return sub


def sample_consistency(
    diffusion: GaussianDiffusion,
    apply_fn: Callable[..., Array],
    params,
    key: Array,
    classes: Array,
    image_shape: Tuple[int, int, int],
    ts: Sequence[int] = (),
    x_init: Optional[Array] = None,
    sigma_data: float = 0.5,
    t_scale: float = 10.0,
    clip: float = 1.0,
    slot_keys: Optional[Array] = None,
) -> Array:
    """Multistep consistency sampling (Song et al. 2023, alg. 1).

    ``ts`` is the descending timestep sequence; its first entry is where x_T
    is injected (default: the top trained timestep).  One model forward per
    entry — NO guidance pass (guidance was distilled into the student) — so
    a 2-step consistency sample costs 2 B-batch forwards where DDIM-50+CFG
    costs 50 2B-batch forwards.  Deterministic given (params, key, classes).

    ``slot_keys`` (B,) typed PRNG keys: draw each sample's re-noising stream
    from ITS key instead of the batch key — the serving batcher passes the
    per-request keys here so a request's images do not depend on how the
    batch was packed (service.py's per-slot determinism contract; without
    this only 1-step sampling would be batching-invariant).
    """
    b = classes.shape[0]
    shape = (b,) + tuple(image_shape)
    ts = list(ts) or [diffusion.n_steps - 1]
    xt = jax.random.normal(key, shape, jnp.float32) if x_init is None else x_init

    def renoise_eps(t: int) -> Array:
        if slot_keys is None:
            return jax.random.normal(jax.random.fold_in(key, t), shape,
                                     jnp.float32)
        return jax.vmap(
            lambda k: jax.random.normal(jax.random.fold_in(k, t),
                                        tuple(image_shape), jnp.float32)
        )(slot_keys)

    t_vec = jnp.full((b,), int(ts[0]), jnp.int32)
    x0 = consistency_fn(diffusion, apply_fn, params, xt, t_vec, classes,
                        sigma_data, t_scale)
    for t in ts[1:]:
        if clip:
            x0 = jnp.clip(x0, -clip, clip)
        t_vec = jnp.full((b,), int(t), jnp.int32)
        xt = diffusion.q_sample(x0, t_vec, renoise_eps(int(t)))
        x0 = consistency_fn(diffusion, apply_fn, params, xt, t_vec, classes,
                            sigma_data, t_scale)
    return x0
