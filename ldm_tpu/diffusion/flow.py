"""Rectified flow / flow matching — a first-class generative family.

Capability-plus over the reference (whose only process is the discrete-time
DDPM, src/DDPM.py:22-149): the continuous-time linear-interpolation flow of
Liu et al. 2022 ("Rectified Flow", arXiv:2209.03003) / Lipman et al. 2022
("Flow Matching", arXiv:2210.02747) — the objective behind SD3-class systems.

    x_t = (1 - t) x_0 + t eps,          t ~ U(0, 1),  eps ~ N(0, I)
    target velocity  v = dx_t/dt = eps - x_0
    loss             E || v_theta(x_t, t, y) - (eps - x_0) ||^2

Sampling integrates the ODE dx/dt = v_theta from t=1 (pure noise) to t=0 with
Euler or Heun (2nd order) steps; classifier-free guidance applies to the
velocity exactly as it does to eps.

TPU-first shape (identical to the DDPM samplers in this package):

* the velocity model IS the existing UNet — every tuned attention kernel and
  layout decision carries over; time conditioning reuses the sinusoidal
  embedding with ``t * (n_steps - 1)`` as a FLOAT timestep (the embedding is
  float-native, models/unet.py:46-52), so a flow config and a DDPM config are
  interchangeable at the model level;
* the whole ODE solve is ONE ``lax.scan``; CFG is the fused 2B-batch forward;
* deterministic given (params, key, classes) — per-request reproducibility
  under the serving batcher's dynamic batching holds exactly like DDIM eta=0.

Drop-in integration: :class:`RectifiedFlow` duck-types the
:class:`~ldm_tpu.diffusion.ddpm.GaussianDiffusion` surface the trainers,
orchestrator, CLIs and serving consume — ``noise_batch`` returns
(target, x_t, t) with the VELOCITY as the regression target, and the few-step
sampler slots map ``sample_ddim → Euler`` and ``sample_dpmpp → Heun`` (both
deterministic few-step solvers of this family; the aliases keep
``--sampler ddim/dpmpp`` and the serving builder working verbatim on flow
checkpoints).
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp

from ldm_tpu.registry import register

Array = jax.Array
VelocityModelFn = Callable[..., Array]


@register("ldm_tpu.diffusion.flow.RectifiedFlow")
class RectifiedFlow:
    """Continuous-time rectified flow with the GaussianDiffusion duck-type.

    Args:
      n_steps: time-embedding scale — ``t in [0, 1]`` is fed to the model as
        ``t * (n_steps - 1)`` so the sinusoidal embedding operates in the same
        frequency band as a T-step DDPM UNet (and DDPM checkpoints' embedding
        tables stay shape-compatible).  Also the default Euler step count for
        :meth:`sample`.
      n_samples: images to generate after training (reference Diffusion
        surface, src/DDPM.py:23-43).
      schedule / beta_start / beta_end: accepted for construction-surface
        parity with ``build_diffusion`` (factory.py) — a linear-interpolation
        flow has no beta schedule; they are ignored.
    """

    def __init__(
        self,
        n_steps: int = 1000,
        n_samples: int = 1,
        schedule: str = "linear",
        beta_start: float = 1e-4,
        beta_end: float = 0.02,
    ):
        del schedule, beta_start, beta_end  # no beta schedule in a flow
        self.n_steps = int(n_steps)
        self.n_samples = int(n_samples)

    # ------------------------------------------------------------- time scale
    def _t_embed(self, t: Array) -> Array:
        """Map continuous t in [0, 1] to the model's timestep input."""
        return t.astype(jnp.float32) * (self.n_steps - 1)

    # ------------------------------------------------------------ forward (q)
    def q_sample(self, x0: Array, t: Array, eps: Array) -> Array:
        """x_t on the straight path: (1-t) x_0 + t eps; ``t`` in [0, 1], (B,)."""
        tb = t.astype(jnp.float32).reshape(-1, 1, 1, 1)
        return (1.0 - tb) * x0 + tb * eps.astype(x0.dtype)

    def noise_batch(self, key: Array, x0: Array) -> Tuple[Array, Array, Array]:
        """Draw t ~ U(0, 1), eps ~ N(0, I); return (v_target, x_t, t_embed).

        Same contract as ``GaussianDiffusion.noise_batch`` (the trainers'
        hot-loop hook, training/diffusion_trainer.py:215-237) with the
        VELOCITY ``eps - x_0`` in the target slot — the generic
        ``mean((target - model_out)^2)`` loss then IS the flow-matching
        objective, no trainer changes needed.
        """
        kt, ke = jax.random.split(key)
        b = x0.shape[0]
        t = jax.random.uniform(kt, (b,), jnp.float32)
        eps = jax.random.normal(ke, x0.shape, x0.dtype)
        v = eps.astype(jnp.float32) - x0.astype(jnp.float32)
        return v, self.q_sample(x0, t, eps), self._t_embed(t)

    # --------------------------------------------------------------- sampling
    def _cfg_v(self, model, params, xt, t_vec, y_in, cfg_scale, use_cfg) -> Array:
        """One velocity prediction, CFG fused as a single 2B-batch forward
        (the same design as GaussianDiffusion._cfg_eps, ddpm.py:112-125)."""
        if use_cfg:
            x_in = jnp.concatenate([xt, xt], axis=0)
            t_in = jnp.concatenate([t_vec, t_vec], axis=0)
            v_both = model(params, x_in, t_in, y_in)
            v_cond, v_uncond = jnp.split(v_both, 2, axis=0)
            return v_uncond.astype(jnp.float32) + cfg_scale * (
                v_cond.astype(jnp.float32) - v_uncond.astype(jnp.float32)
            )
        return model(params, xt, t_vec, y_in).astype(jnp.float32)

    def _prep_cfg(self, classes: Array, cfg_scale, null_label):
        use_cfg = cfg_scale is not None and cfg_scale > 0
        if use_cfg:
            if null_label is None:
                raise ValueError("null_label is required when cfg_scale > 0")
            b = classes.shape[0]
            y_in = jnp.concatenate(
                [classes, jnp.full((b,), null_label, classes.dtype)]
            )
        else:
            y_in = classes
        return use_cfg, y_in

    def _solve(
        self,
        model: VelocityModelFn,
        params,
        key: Array,
        classes: Array,
        image_shape: Tuple[int, int, int],
        n_sample_steps: int,
        cfg_scale: float,
        null_label: Optional[int],
        x_init: Optional[Array],
        solver: str,
        ode_direction: float = 1.0,
    ) -> Array:
        """Integrate dx/dt = v_theta from t=1 to t=0 as one ``lax.scan``.

        ``solver="euler"``: one model eval per step.  ``solver="heun"``: the
        explicit trapezoidal rule — a predictor Euler step, a second velocity
        eval at the endpoint, then the averaged update (2 evals per step,
        2nd-order accurate; the final step's endpoint is t=0 which is in the
        trained range, so no lower-order fallback is needed).

        ``ode_direction=-1.0`` integrates the ODE the WRONG WAY (x ← x + dt·v
        while the time grid still walks t: 1 → 0) — the flow family's
        NEGATIVE-CONTROL knob.  It reproduces this family's authentic bug
        class: a sign-convention mistake between the two velocity conventions
        in the literature (v = x1 − x0 with t: 0→data vs v = eps − x0 with
        t: 1→noise; Liu et al. 2209.03003 vs Lipman et al. 2210.02747 differ
        exactly this way), the flow analogue of the latent family's hardcoded
        SD scale (perf/probe22.json).  The broken integrator walks the state
        TOWARD the noise end of the path instead of toward data.
        """
        b = classes.shape[0]
        shape = (b,) + tuple(image_shape)
        xt = (
            jax.random.normal(key, shape, jnp.float32)
            if x_init is None else x_init
        )
        use_cfg, y_in = self._prep_cfg(classes, cfg_scale, null_label)
        n = max(1, int(n_sample_steps))
        dt = float(ode_direction) / n

        def step(carry, t):
            xt = carry
            t_vec = jnp.full((b,), t, jnp.float32) * (self.n_steps - 1)
            v1 = self._cfg_v(model, params, xt, t_vec, y_in, cfg_scale, use_cfg)
            x_pred = xt - dt * v1
            if solver == "heun":
                t2 = jnp.full((b,), t - 1.0 / n, jnp.float32) * (self.n_steps - 1)
                v2 = self._cfg_v(model, params, x_pred, t2, y_in, cfg_scale,
                                 use_cfg)
                return xt - dt * 0.5 * (v1 + v2), None
            return x_pred, None

        ts = jnp.arange(n, 0, -1, jnp.float32) / n  # 1, 1-1/n, ..., 1/n
        x0, _ = jax.lax.scan(step, xt, ts)
        return x0

    def sample(
        self,
        model: VelocityModelFn,
        params,
        key: Array,
        classes: Array,
        image_shape: Tuple[int, int, int],
        cfg_scale: float = 3.0,
        null_label: Optional[int] = None,
        x_init: Optional[Array] = None,
        n_sample_steps: Optional[int] = None,
        ode_direction: float = 1.0,
    ) -> Array:
        """Euler ODE sampling at ``n_sample_steps`` (default: ``n_steps``,
        mirroring the DDPM full-loop slot the trainers call for
        ``method="ddpm"``)."""
        return self._solve(
            model, params, key, classes, image_shape,
            self.n_steps if n_sample_steps is None else n_sample_steps,
            cfg_scale, null_label, x_init, "euler", ode_direction,
        )

    def sample_euler(self, *args, **kw) -> Array:
        """Few-step Euler sampling; same signature as :meth:`sample_ddim`."""
        return self.sample_ddim(*args, **kw)

    def sample_ddim(
        self,
        model: VelocityModelFn,
        params,
        key: Array,
        classes: Array,
        image_shape: Tuple[int, int, int],
        n_sample_steps: int = 50,
        eta: float = 0.0,
        cfg_scale: float = 3.0,
        null_label: Optional[int] = None,
        x_init: Optional[Array] = None,
        ode_direction: float = 1.0,
    ) -> Array:
        """The family's deterministic few-step sampler slot → Euler.

        Named for surface parity with ``GaussianDiffusion.sample_ddim`` so
        trainers/CLIs/serving drive flow checkpoints with ``--sampler ddim``
        unchanged; ``eta`` is meaningless for an ODE and must be 0.
        """
        if eta:
            raise ValueError("rectified flow is deterministic; eta must be 0")
        return self._solve(model, params, key, classes, image_shape,
                           n_sample_steps, cfg_scale, null_label, x_init,
                           "euler", ode_direction)

    def sample_heun(self, *args, **kw) -> Array:
        """2nd-order few-step sampling; same signature as :meth:`sample_dpmpp`."""
        return self.sample_dpmpp(*args, **kw)

    def sample_dpmpp(
        self,
        model: VelocityModelFn,
        params,
        key: Array,
        classes: Array,
        image_shape: Tuple[int, int, int],
        n_sample_steps: int = 15,
        cfg_scale: float = 3.0,
        null_label: Optional[int] = None,
        x_init: Optional[Array] = None,
        order: int = 2,
        ode_direction: float = 1.0,
    ) -> Array:
        """The family's higher-order few-step sampler slot → Heun.

        Named for surface parity with ``GaussianDiffusion.sample_dpmpp``
        (trainers/serving pass ``method="dpmpp"`` for "the better few-step
        solver"); ``order=1`` degenerates to Euler.  NOTE: Heun costs 2 model
        evals per step — ``n_sample_steps=15`` ≈ a 30-eval budget.
        """
        return self._solve(model, params, key, classes, image_shape,
                           n_sample_steps, cfg_scale, null_label, x_init,
                           "heun" if order >= 2 else "euler", ode_direction)
