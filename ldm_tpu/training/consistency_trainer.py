"""Consistency-distillation trainer: teacher DDPM → 1-4-step student.

Distills a trained (EMA) eps-UNet into a consistency student
(diffusion/consistency.py) with guidance baked in: per sample, a random
boundary segment (t_n → t_{n+1}) is drawn, the teacher takes ONE guided
DDIM step down the segment (fused-2B CFG — the samplers' hot-path form),
and the student is trained so its consistency output at t_{n+1} matches the
EMA student's output at the teacher's landing point (Song et al. 2023 alg. 2;
guidance embedding per LCM, arXiv:2310.04378).

Reuses the framework's training machinery wholesale: TrainState (the EMA
that consistency distillation needs is the state's existing EMA stream, run
at the CD-typical faster decay), epoch-as-``lax.scan`` over the
device-resident dataset, and the same checkpoint format — so a distilled
student loads into every downstream surface (generate_images.py, serving)
unchanged.
"""

from __future__ import annotations

import os
import time
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ldm_tpu.config import Config
from ldm_tpu.diffusion.consistency import (
    boundary_timesteps,
    consistency_fn,
    sample_consistency,
)
from ldm_tpu.diffusion.ddpm import GaussianDiffusion
from ldm_tpu.training import checkpoint as ckpt
from ldm_tpu.training.scan_epochs import build_epoch_scan
from ldm_tpu.training.state import TrainState, make_optimizer
from ldm_tpu.utils.logging import MetricsLogger

Array = jax.Array


class ConsistencyDistillTrainer:
    """Distill ``teacher_params`` (an eps-model EMA tree) into a student.

    Args:
      config: the TEACHER's config (schedule/model/data hyperparameters).
      model: the UNet (architecture shared by teacher and student).
      diffusion: the teacher's GaussianDiffusion process.
      teacher_params: frozen teacher weights (typically the EMA checkpoint).
      train_loader: real-data loader; only images+labels are consumed.
      skip_steps: boundary spacing k — segments (t, t+k) along the ODE.
      cfg_scale: guidance strength distilled into the student
        (default: the config's sampling scale).
      ema_decay: target-network decay (CD wants a much faster EMA than
        the 0.9999 used for diffusion weights; 0.95 is the CM paper's
        small-data setting).
      huber_c: pseudo-Huber constant (iCT, arXiv:2310.14189) — 0 = pure MSE.
      lr: distillation learning rate (default: config.lr).
    """

    def __init__(
        self,
        config: Config,
        model,
        diffusion: GaussianDiffusion,
        teacher_params,
        train_loader,
        classes,
        mesh=None,
        logger: Optional[MetricsLogger] = None,
        *,
        skip_steps: int = 20,
        cfg_scale: Optional[float] = None,
        ema_decay: float = 0.95,
        huber_c: float = 0.03,
        lr: Optional[float] = None,
    ):
        assert mesh is None, "distillation is single-replica for now (DP-ready loss)"
        self.config = config
        self.model = model
        # Student gradients route through the tuned Pallas fwd+bwd attention
        # (the diffusion trainer's measured-fastest configuration); the
        # teacher/EMA forwards are not differentiated, so they keep the plain
        # forward-optimized impl.
        self._train_model = (
            model.clone(attention_impl="auto_grads")
            if getattr(model, "attention_impl", "auto_grads") != "auto_grads"
            else model
        )
        self.diffusion = diffusion
        self.train_loader = train_loader
        self.classes = np.asarray(classes, np.int32)
        self.logger = logger or MetricsLogger(
            config.dirpath, f"{config.project_name}_consistency"
        )
        config.create_dirs()
        self.cfg_scale = (
            config.diffusion.cfg_scale if cfg_scale is None else cfg_scale
        )
        self.huber_c = float(huber_c)

        d = config.data
        self.image_shape = (d.image_size, d.image_size, d.image_channels)
        self.sub = boundary_timesteps(diffusion.n_steps, skip_steps)

        # Teacher stays frozen on device; the student starts AS the teacher
        # (the standard CD init) — deep-copied so state donation can never
        # invalidate the teacher's buffers.
        self.teacher_params = jax.device_put(teacher_params)
        student = jax.tree.map(jnp.copy, self.teacher_params)
        self.state = TrainState.create(
            student,
            make_optimizer(config.lr if lr is None else lr),
            jax.random.key(config.seed + 7),
            ema_decay=ema_decay,
        )

        self._train_step = jax.jit(self._step_body, donate_argnums=(0,))
        self._epoch_scan = build_epoch_scan(
            self._step_body, train_loader,
            enabled=getattr(config, "scan_epochs", True),
        )
        self._sample = jax.jit(
            lambda params, key, classes, ts: sample_consistency(
                self.diffusion, self.model.apply, params, key, classes,
                self.image_shape, ts=ts,
            ),
            static_argnums=(3,),
        )

    # ------------------------------------------------------------- loss body
    def _step_body(self, state: TrainState, batch) -> Tuple[TrainState, dict]:
        key = state.step_key()
        k_n, k_eps = jax.random.split(key)
        x0 = batch["image"].astype(jnp.float32)
        y = batch["label"]
        b = x0.shape[0]

        sub = jnp.asarray(self.sub)
        n = jax.random.randint(k_n, (b,), 0, len(self.sub) - 1, jnp.int32)
        t0, t1 = sub[n], sub[n + 1]

        eps = jax.random.normal(k_eps, x0.shape, jnp.float32)
        x_t1 = self.diffusion.q_sample(x0, t1, eps)

        # Teacher: one guided DDIM step t1 → t0 (deterministic, not
        # differentiated — outside the student's grad closure).
        null = jnp.full((b,), self.model.num_classes, y.dtype)
        teach_eps = self.diffusion._cfg_eps(
            self.model.apply, self.teacher_params, x_t1, t1,
            jnp.concatenate([y, null]), self.cfg_scale, True,
        )
        x_t0 = self.diffusion.ddim_step(
            x_t1, t1, t0, teach_eps, jnp.zeros_like(x_t1), eta=0.0
        )
        target = jax.lax.stop_gradient(
            consistency_fn(self.diffusion, self.model.apply,
                           state.ema_params, x_t0, t0, y)
        )

        def loss_fn(params):
            pred = consistency_fn(self.diffusion, self._train_model.apply,
                                  params, x_t1, t1, y)
            d2 = (pred - target) ** 2
            if self.huber_c > 0:  # pseudo-Huber (iCT): robust near-0 gradient
                c = self.huber_c
                return jnp.mean(jnp.sqrt(d2 + c * c) - c)
            return jnp.mean(d2)

        import optax

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        gnorm = optax.global_norm(grads)
        return state.apply_gradients(grads), {"loss": loss, "grad_norm": gnorm}

    # ----------------------------------------------------------------- train
    def train(self, epochs: Optional[int] = None) -> dict:
        epochs = self.config.epochs if epochs is None else epochs
        history = []
        for epoch in range(epochs):
            t0 = time.monotonic()
            if self._epoch_scan is not None:
                self.state, outs = self._epoch_scan(self.state, epoch)
                loss = float(jnp.mean(outs["loss"]))
                n_steps = self._epoch_scan.n_batches
            else:
                losses = []
                for batch in self.train_loader:
                    batch = {
                        "image": jnp.asarray(batch["image"]),
                        "label": jnp.asarray(batch["label"]),
                    }
                    self.state, out = self._train_step(self.state, batch)
                    losses.append(out["loss"])
                loss = float(jnp.mean(jnp.stack(losses)))
                n_steps = len(losses)
            dt = time.monotonic() - t0
            history.append(loss)
            self.logger.log(
                {"epoch": epoch, "distill_loss": loss,
                 "steps_per_sec": n_steps / dt if dt > 0 else 0.0},
                step=int(self.state.step),
            )
        self.save()
        return {"loss": history[-1] if history else float("nan"),
                "history": history}

    def save(self) -> None:
        base = self.config.checkpoints
        os.makedirs(base, exist_ok=True)
        ckpt.save_params(os.path.join(base, "consistency_model.msgpack"),
                         self.state.params)
        ckpt.save_params(os.path.join(base, "consistency_model_ema.msgpack"),
                         self.state.ema_params)

    # ---------------------------------------------------------------- sample
    def sample(self, key, classes, n_sample_steps: int = 2,
               use_ema: bool = True) -> Array:
        """Few-step consistency sampling from the (EMA) student."""
        ts = sampling_timesteps(self.diffusion.n_steps, n_sample_steps)
        params = self.state.ema_params if use_ema else self.state.params
        return self._sample(params, key, jnp.asarray(classes, jnp.int32), ts)


def sampling_timesteps(n_steps: int, n_sample_steps: int) -> tuple:
    """Descending inference timesteps: top-down greedy halving (CM-style).

    1 step → (T-1,); k steps → T-1 plus k-1 geometric re-noising points
    (e.g. T=400, 4 steps → (399, 199, 99, 49)): early steps fix global
    structure, late small-t steps sharpen — the schedule multistep
    consistency sampling responds to best (Song et al. 2023 §6.1).
    """
    if n_sample_steps < 1:
        raise ValueError(f"n_sample_steps must be >= 1, got {n_sample_steps}")
    ts = [n_steps - 1]
    t = n_steps
    for _ in range(n_sample_steps - 1):
        t = t // 2
        ts.append(max(t - 1, 1))
    return tuple(ts)
