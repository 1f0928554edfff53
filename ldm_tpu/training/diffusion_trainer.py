"""Diffusion model trainer.

Rebuild of the reference ``DiffusionModelTrainer`` (src/DiffusionModelTrainer.py),
TPU-first:

* the per-batch hot loop (src/DiffusionModelTrainer.py:27-77) is ONE jitted,
  state-donated function: noising (q_sample), classifier-free-guidance label drop,
  UNet forward, MSE, Adam update, and EMA all fuse into a single XLA program — the
  reference's ``np.random`` label drop (:44-45) moves inside the step as
  ``jax.random.bernoulli`` so the step is deterministic given the state;
* no per-step host sync: the reference calls ``loss.item()`` every batch (:67);
  here per-batch losses stay on device and transfer once per epoch;
* validation applies the CFG lerp exactly like the reference's ``_val_epoch``
  (:99-104);
* every 2 epochs a per-class sample grid is generated (:140-143) — with the
  lax.scan sampler on EMA params — and saved under ``results/``;
* early stopping on val loss saves best params (+ full state for resume), same
  semantics as src/EarlyStopping.py.

Data parallelism: pass a ``Mesh`` and the jitted step consumes a batch sharded on
the ``data`` axis against replicated params; XLA inserts the gradient all-reduce
over ICI (no NCCL, no GradScaler — bf16 compute needs no loss scaling).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ldm_tpu.config import Config
from ldm_tpu.diffusion.ddpm import GaussianDiffusion
from ldm_tpu.parallel.mesh import (
    data_sharding, global_batch_multiple, replicated, shard_batch,
)
from ldm_tpu.training import checkpoint as ckpt
from ldm_tpu.training.early_stopping import EarlyStopping
from ldm_tpu.training.state import TrainState, make_optimizer
from ldm_tpu.utils.logging import MetricsLogger
from ldm_tpu.data.transforms import reverse_transform

Array = jax.Array


class DiffusionTrainer:
    def __init__(
        self,
        config: Config,
        model,  # ldm_tpu.models.unet.UNet
        diffusion: GaussianDiffusion,
        train_loader,
        val_loader,
        classes,
        mesh=None,
        logger: Optional[MetricsLogger] = None,
        cfg_scale: Optional[float] = None,
        input_shape: Optional[Tuple[int, int, int]] = None,
    ):
        assert config.loss_fn == "mse", "diffusion training uses MSE (src/Trainer.py:62)"
        self.config = config
        # Tensor parallelism shards attention heads over the mesh's model
        # axis; the fused Pallas kernel is a custom call GSPMD cannot
        # partition, and the lane-native XLA form hides the head structure in
        # a block-diagonal mask (probe27: activation-sized collectives at
        # every site), so a model-parallel mesh forces the EXPLICIT-heads XLA
        # attention everywhere (parallel/tp.py NOTE; ops/linear_attention.py
        # linear_attention_block_xla_heads).
        self._tp_active = (
            mesh is not None and dict(mesh.shape).get("model", 1) > 1
        )
        if self._tp_active and getattr(model, "attention_impl", None) != "xla_heads":
            model = model.clone(attention_impl="xla_heads")
        self.model = model
        # Gradient programs get their own attention impl UNCONDITIONALLY
        # (incl. explicit attention_impl="pallas" configs, ADVICE round 2):
        # "auto_grads" picks the round-3 fused Pallas forward + hand-written
        # Pallas backward at the measured shapes (+8% full train step vs
        # all-XLA, perf/probe18.json — and unlike the round-2 XLA-recompute
        # VJP, it compiles cleanly inside the epoch scan) and XLA elsewhere
        # (CPU, untabled shapes).  Forward-only programs (eval, sampling)
        # keep the plain fused kernel via the model's own impl.
        self._train_model = (
            model.clone(attention_impl="auto_grads")
            if not self._tp_active
            and getattr(model, "attention_impl", "auto_grads") != "auto_grads"
            else model
        )
        self.diffusion = diffusion
        self.train_loader = train_loader
        self.val_loader = val_loader
        self.classes = np.asarray(classes, np.int32)
        self.mesh = mesh
        self.cfg_scale = config.diffusion.cfg_scale if cfg_scale is None else cfg_scale
        self.logger = logger or MetricsLogger(config.dirpath, config.project_name)
        config.create_dirs()

        d = config.data
        # The space the diffusion runs in: pixels by default; the latent trainer
        # passes the latent shape instead (SURVEY.md §7 step 8).
        self.image_shape = input_shape or (d.image_size, d.image_size, d.image_channels)
        key = jax.random.key(config.seed)
        k_init, k_state = jax.random.split(key)
        dummy_x = jnp.zeros((1,) + self.image_shape, jnp.float32)
        dummy_t = jnp.zeros((1,), jnp.int32)
        dummy_y = jnp.zeros((1,), jnp.int32)
        params = jax.jit(model.init)(k_init, dummy_x, dummy_t, dummy_y)
        self.state = TrainState.create(
            params, make_optimizer(config.lr), k_state, ema_decay=config.ema_decay
        )
        # Parameter placement on the mesh: replicated (plain DP, default) or
        # FSDP (ZeRO-3-style, parallel/fsdp.py). `_state_sh` is what every
        # jitted program declares for the state argument; `_params_sh` is its
        # params/ema subtree (the sampler's params argument).
        self.param_sharding = getattr(config, "param_sharding", "replicated")
        if mesh is not None:
            from ldm_tpu.parallel.fsdp import state_shardings

            self._state_sh = state_shardings(mesh, self.state,
                                             self.param_sharding)
            self._params_sh = (
                self._state_sh.params
                if self.param_sharding != "replicated" else self._state_sh
            )
            if self.param_sharding != "replicated":
                from ldm_tpu.parallel.fsdp import put_global

                self.state = put_global(self.state, self._state_sh)
        else:
            self._state_sh = self._params_sh = None

        # Spatial partitioning of activations: the SAMPLER uses the
        # annotation path (parallel/sp.py — one sharding constraint, GSPMD
        # halo exchange; forward-exact); GRADIENT programs (train/eval) use
        # the EXPLICIT path (parallel/sp_explicit.py — shard_map with
        # hand-placed ppermute halos / psum GroupNorm stats / gathered
        # attention), because this jaxlib's GSPMD partitioned transpose
        # corrupts the annotation path's grads (perf/probe28_RESULTS.md)
        # while explicit collectives have exact AD transposes.
        from ldm_tpu.parallel.sp import spatial_axis_size

        self._spatial = (
            spatial_axis_size(mesh) > 1
            and getattr(config, "activation_sharding", "batch") == "spatial"
        )
        self._sp_apply = None
        if self._spatial:
            from ldm_tpu.parallel.sp_explicit import (
                make_unet_sp_apply, supports_spatial_training,
            )

            if self.param_sharding != "replicated":
                raise ValueError(
                    "activation_sharding='spatial' composes with "
                    "param_sharding='replicated' only (the explicit shard_map "
                    f"path consumes replicated params), got "
                    f"{self.param_sharding!r}"
                )
            if not supports_spatial_training(
                mesh, self.image_shape[0], len(model.channel_multipliers)
            ):
                raise ValueError(
                    "activation_sharding='spatial' needs the height to split "
                    "into even per-rank rows at every pooled level: "
                    f"H={self.image_shape[0]} % (model_axis * "
                    f"2^{len(model.channel_multipliers)}) != 0"
                )
            self._sp_apply = make_unet_sp_apply(mesh, model)

        self._train_step = self._build_train_step()
        self._eval_step = self._build_eval_step()
        self._sampler = self._build_sampler()
        self._setup_scan_epochs()
        self.early_stopping = EarlyStopping(
            patience=config.early_stopping_patience,
            verbose=True,
            save_fn=self._save_best,
            min_delta_rel=getattr(config, "early_stopping_min_delta_rel", 0.0),
        )

    # ------------------------------------------------------------- jit builds
    def _dropped_labels(self, key: Array, y: Array) -> Array:
        """CFG label drop → null label (reference drops the whole batch with
        p=0.1 via np.random, src/DiffusionModelTrainer.py:44-45)."""
        p = self.config.diffusion.label_drop_prob
        null = jnp.int32(self.model.num_classes)
        if self.config.diffusion.label_drop_mode == "sample":
            drop = jax.random.bernoulli(key, p, y.shape)
        else:
            drop = jax.random.bernoulli(key, p)
        return jnp.where(drop, null, y)

    def _jit(self, fn, donate_state: bool = False):
        kw = {"donate_argnums": (0,)} if donate_state else {}
        if self.mesh is None:
            return jax.jit(fn, **kw)
        # State replicated (plain DP: XLA inserts the gradient all-reduce over
        # ICI) or FSDP-sharded (XLA inserts all-gather/reduce-scatter pairs);
        # batch sharded on the data axis either way.  State-returning programs
        # PIN the output state to the same sharding tree: left free, GSPMD may
        # pick a different placement for some updated leaf (e.g. shard a small
        # embedding the FSDP rule replicates), and the next program's
        # in_shardings would then reject the state.
        dat = data_sharding(self.mesh)
        if donate_state:  # fn: (state, batch) -> (state, metrics)
            kw["out_shardings"] = (self._state_sh, replicated(self.mesh))
        return jax.jit(fn, in_shardings=(self._state_sh, dat), **kw)

    def _encode(self, key: Array, image: Array) -> Array:
        """Map a data batch into the diffusion space — identity for pixel DDPM;
        the latent trainer overrides with the frozen-VAE encode."""
        return image

    def _step_body(self, state: TrainState, batch) -> Tuple[TrainState, Array]:
        """One optimization step: noising → CFG label drop → UNet fwd/bwd → Adam
        → EMA, all fused into whichever jitted program calls it (the per-batch
        step or the whole-epoch scan)."""
        key = state.step_key()
        k_noise, k_drop, k_enc = jax.random.split(key, 3)
        x0 = self._encode(k_enc, batch["image"])
        eps, xt, t = self.diffusion.noise_batch(k_noise, x0)
        y = self._dropped_labels(k_drop, batch["label"])

        apply_fn = self._sp_apply or self._train_model.apply

        def loss_fn(params):
            eps_theta = apply_fn(params, xt, t, y)
            return jnp.mean((eps.astype(jnp.float32) - eps_theta) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        # grad global-norm rides along as a per-step scalar — the TPU-native
        # stand-in for wandb.watch's gradient logging (reference main.py:184-186)
        import optax

        gnorm = optax.global_norm(grads)
        return state.apply_gradients(grads), {"loss": loss, "grad_norm": gnorm}

    def _build_train_step(self):
        def train_step(state: TrainState, batch) -> Tuple[TrainState, dict]:
            return self._step_body(state, batch)

        train_step.__name__ = "_train_step"
        return self._jit(train_step, donate_state=True)

    def _setup_scan_epochs(self) -> None:
        """Epoch-as-lax.scan fast path (see ldm_tpu/training/scan_epochs.py)."""
        from ldm_tpu.training.scan_epochs import build_epoch_scan

        self._epoch_scan = build_epoch_scan(
            self._step_body, self.train_loader, mesh=self.mesh,
            enabled=getattr(self.config, "scan_epochs", True),
            state_sharding=self._state_sh,
        )

    def _build_eval_step(self):
        model, diffusion = self.model, self.diffusion
        cfg = self.cfg_scale
        null = self.model.num_classes
        apply_fn = self._sp_apply or model.apply

        def eval_step(state: TrainState, batch) -> dict:
            # deterministic eval stream, disjoint from training (salted fold_in)
            key = jax.random.fold_in(
                jax.random.fold_in(state.key, 0x5EED), batch["index"][0]
            )
            k_noise, k_enc = jax.random.split(key)
            x0 = self._encode(k_enc, batch["image"])
            eps, xt, t = diffusion.noise_batch(k_noise, x0)
            y = batch["label"]
            eps_theta = apply_fn(state.params, xt, t, y)
            if cfg > 0:
                eps_uncond = apply_fn(
                    state.params, xt, t, jnp.full_like(y, null)
                )
                # torch.lerp(uncond, cond, cfg) (src/DiffusionModelTrainer.py:99-104)
                eps_theta = eps_uncond + cfg * (eps_theta - eps_uncond)
            loss = jnp.mean((eps.astype(jnp.float32) - eps_theta) ** 2)
            return {"loss": loss}

        eval_step.__name__ = "_eval_step"
        return self._jit(eval_step)

    def _postprocess(self, x0: Array, decode_scale_override: float = 0.0) -> Array:
        """Map sampled diffusion-space tensors to image space — identity for pixel
        DDPM; the latent trainer decodes through the frozen VAE.
        ``decode_scale_override`` (latent family only) decodes with a WRONG
        latent scale — the negative-control knob that reproduces the
        reference's hardcoded-SD-constant failure mode
        (src/LatentDiffusionModel.py:28; perf/probe22.json). Ignored here."""
        return x0

    @property
    def output_image_shape(self) -> Tuple[int, int, int]:
        """Shape of ``sample()``'s per-image output AFTER _postprocess — equals
        the diffusion-space shape for pixel DDPM; the latent trainer overrides
        (it samples 4x4xz latents but returns decoded HxWxC images)."""
        return self.image_shape

    def _build_sampler(self):
        model, diffusion = self.model, self.diffusion
        apply_fn = model.apply
        if self._spatial:
            # every scan step's x_t re-pins to P(data, model) — SP rides the
            # whole T-step sampler, not just training (parallel/sp.py)
            from ldm_tpu.parallel.sp import wrap_apply_spatial

            apply_fn = wrap_apply_spatial(self.mesh, apply_fn)

        def _sample(params, key, classes, cfg_scale, method="ddpm",
                    ddim_steps=50, eta=0.0, decode_scale_override=0.0,
                    ode_direction=1.0):
            # ode_direction != 1 is the FLOW family's negative-control knob
            # (wrong-way ODE integration, flow.py _solve) — only RectifiedFlow
            # samplers accept it, so it is forwarded conditionally (passing it
            # to GaussianDiffusion would be a hard TypeError, which is the
            # right failure for a nonsensical family/knob pairing).
            brk = {} if ode_direction == 1.0 else {"ode_direction": ode_direction}
            if method == "ddim":
                # capability-plus few-step sampler (ddpm.py sample_ddim) —
                # same fused-CFG scan design at ddim_steps/T of the cost
                x0 = diffusion.sample_ddim(
                    apply_fn, params, key, classes, self.image_shape,
                    n_sample_steps=ddim_steps, eta=eta, cfg_scale=cfg_scale,
                    null_label=model.num_classes, **brk,
                )
            elif method == "dpmpp":
                # second-order multistep (ddpm.py sample_dpmpp): DDIM-50
                # quality at ~10-15 model evals; `ddim_steps` names the
                # step budget for both few-step samplers
                x0 = diffusion.sample_dpmpp(
                    apply_fn, params, key, classes, self.image_shape,
                    n_sample_steps=ddim_steps, cfg_scale=cfg_scale,
                    null_label=model.num_classes, **brk,
                )
            else:
                x0 = diffusion.sample(
                    apply_fn, params, key, classes, self.image_shape,
                    cfg_scale=cfg_scale, null_label=model.num_classes, **brk,
                )
            return self._postprocess(x0, decode_scale_override)

        static = ("cfg_scale", "method", "ddim_steps", "eta",
                  "decode_scale_override", "ode_direction")
        if self.mesh is None:
            return jax.jit(_sample, static_argnames=static)
        # DP generation: classes sharded on the data axis, params/key replicated —
        # the whole T-step scan then runs batch-parallel across the mesh with no
        # collectives on the step path (each chip samples its shard of the batch).
        from jax.sharding import NamedSharding, PartitionSpec as P

        rep = replicated(self.mesh)
        cls_sh = NamedSharding(self.mesh, P("data"))
        kw = {}
        if jax.process_count() > 1:
            # multi-host: replicate the output so process 0 can fetch the full
            # grid (device_get of a non-addressable sharded array would fail)
            kw["out_shardings"] = rep
        return jax.jit(
            _sample,
            static_argnames=static,
            in_shardings=(self._params_sh, NamedSharding(self.mesh, P()),
                          cls_sh),
            **kw,
        )

    # ----------------------------------------------------------- persistence
    def _save_best(self, state: TrainState) -> None:
        """Val-improvement hook: keep the best state as a cheap ON-DEVICE copy
        (a host round-trip per improvement dominates epoch time on small
        models); flushed to disk at the checkpoint cadence and at train() end."""
        self._best_state = jax.tree.map(jnp.copy, state)
        self._best_dirty = True

    def _flush_best(self) -> None:
        if not getattr(self, "_best_dirty", False):
            return
        state = self._best_state
        ckpt.save_params(
            f"{self.config.checkpoints}/diffusion_model.msgpack", state.params
        )
        ckpt.save_params(
            f"{self.config.checkpoints}/diffusion_model_ema.msgpack", state.ema_params
        )
        ckpt.save_state(f"{self.config.checkpoints}/best_state.msgpack", state)
        self._best_dirty = False

    def save_latest(self) -> None:
        ckpt.save_state(f"{self.config.checkpoints}/state.msgpack", self.state)

    def resume_latest(self) -> bool:
        path = ckpt.latest_checkpoint(self.config.checkpoints)
        if path is None:
            return False
        self.load_state(path)
        return True

    def load_state(self, path: str) -> None:
        """Restore a full-TrainState checkpoint and re-place it on the mesh.

        ``restore_state`` returns HOST arrays; under fsdp/tp/fsdp_tp the
        jitted programs declare sharded in_shardings, so the state is
        re-sharded here (parallel/fsdp.py put_global — works even when the
        sharding spans other processes' devices; each process keeps only its
        shards).
        """
        self.state = ckpt.restore_state(path, self.state)
        if self._state_sh is not None:
            from ldm_tpu.parallel.fsdp import put_global

            self.state = put_global(self.state, self._state_sh)

    # ----------------------------------------------------------------- epochs
    def _divisible(self, batch) -> bool:
        """Mesh-sharded steps need the batch to split evenly across devices."""
        return len(batch["label"]) % global_batch_multiple(self.mesh) == 0

    def _train_epoch(self, epoch: int) -> float:
        from ldm_tpu.utils.profiling import Throughput

        tput = Throughput()
        if self._epoch_scan is not None:
            # one dispatch for the whole epoch (shuffle + all steps on device).
            # The shuffle-epoch index derives from the optimizer step, not the
            # loop counter, so a resumed run continues the permutation stream
            # instead of replaying epoch 0's (ADVICE.md round 1).
            epoch_idx = int(self.state.step) // self._epoch_scan.n_batches
            self.state, outs = self._epoch_scan(self.state, epoch_idx)
            outs = jax.device_get(outs)
            for _ in range(self._epoch_scan.n_batches):
                tput.update(self._epoch_scan.batch_size)
            self._set_rates(tput)
            self._last_grad_norm = float(np.mean(outs["grad_norm"]))
            return float(np.mean(outs["loss"]))
        losses, gnorms = [], []
        for batch in self.train_loader:
            if not self._divisible(batch):
                continue
            n = len(batch["label"])
            batch = shard_batch(self.mesh, batch)
            self.state, m = self._train_step(self.state, batch)
            losses.append(m["loss"])  # device scalar; no per-step host sync
            gnorms.append(m["grad_norm"])
            tput.update(n)
        if not losses:
            raise ValueError("train loader yielded no (mesh-divisible) batches")
        self._set_rates(tput)
        self._last_grad_norm = float(np.mean(jax.device_get(gnorms)))
        return float(np.mean(jax.device_get(losses)))

    def _set_rates(self, tput) -> None:
        """Record epoch throughput — except for the first epoch of the process,
        whose wall-clock is dominated by XLA compilation and would report a
        misleadingly low rate (VERDICT.md round 1, weak #7)."""
        if getattr(self, "_warmed_up", False):
            self._last_rates = tput.rates()
        else:
            self._warmed_up = True
            self._last_rates = {}

    def _val_epoch(self, epoch: int) -> float:
        losses = []
        for i, batch in enumerate(self.val_loader):
            if not self._divisible(batch):
                continue
            batch["index"] = np.full((len(batch["label"]),), i, np.int32)
            batch = shard_batch(self.mesh, batch)
            losses.append(self._eval_step(self.state, batch)["loss"])
        if not losses:
            raise ValueError(
                "validation loader yielded no (mesh-divisible) batches — "
                "use drop_last=False or a larger val split"
            )
        return float(np.mean(jax.device_get(losses)))

    def train(self) -> dict:
        """Epoch loop with metric logging, periodic sampling grid, early stopping
        (reference ``train``, src/DiffusionModelTrainer.py:120-149)."""
        # wandb.define_metric parity (reference main.py:185-186) — min summaries
        # tracked locally in summary.json too (utils/logging.py)
        self.logger.define_summaries({
            "diffusion_model train_loss": "min",
            "diffusion_model val_loss": "min",
        })
        history = {"train_loss": [], "val_loss": []}
        for epoch in range(self.config.epochs):
            train_loss = self._train_epoch(epoch)
            val_loss = self._val_epoch(epoch)
            history["train_loss"].append(train_loss)
            history["val_loss"].append(val_loss)
            self.logger.log(
                {
                    "diffusion_model train_loss": train_loss,
                    "diffusion_model val_loss": val_loss,
                    "grad_global_norm": getattr(self, "_last_grad_norm", 0.0),
                    "epoch": epoch,
                    **{k: round(v, 3)
                       for k, v in getattr(self, "_last_rates", {}).items()},
                },
                step=epoch,
            )
            self.logger.log_norms("params", self.state.params, step=epoch)
            we = getattr(self.config, "watch_histograms_every", 0)
            if we > 0 and (epoch + 1) % we == 0:
                # the reference's wandb.watch(log="all") equivalent (main.py:184)
                self.logger.log_histograms("params", self.state.params, step=epoch)
            se = getattr(self.config, "sample_every", 2)
            # 0 = never; skip epoch 0 — the grid would show untrained noise
            if se > 0 and epoch > 0 and epoch % se == 0:
                images = self.sample(self.classes, cfg_scale=self.cfg_scale)
                self.logger.log_images(
                    images, step=epoch, mode="sample", dirpath=self.config.results
                )
            self.early_stopping(val_loss, self.state)
            ce = getattr(self.config, "checkpoint_every", 1)
            if ce > 0 and (epoch + 1) % ce == 0:
                self.save_latest()
                self._flush_best()
            if self.early_stopping.early_stop:
                print("Early stopping")
                break
        # Always leave both the best AND the latest state on disk — with
        # checkpoint_every > 1 an early stop (or a final epoch off the cadence)
        # must not strand --resume on a stale state.msgpack (ADVICE.md round 1).
        self.save_latest()
        self._flush_best()
        return history

    # ----------------------------------------------------------------- sample
    def sample(
        self,
        classes,
        cfg_scale: float = 0.0,
        key: Optional[Array] = None,
        use_ema: bool = True,
        method: str = "ddpm",
        ddim_steps: int = 50,
        eta: float = 0.0,
        decode_scale_override: float = 0.0,
        ode_direction: float = 1.0,
    ) -> np.ndarray:
        """Generate one image per entry of ``classes``; returns uint8 NHWC
        (reference ``sample`` + reverse transform,
        src/DiffusionModelTrainer.py:161-180).  ``method="ddim"`` switches to
        the few-step DDIM sampler (capability-plus).
        ``decode_scale_override`` != 0 mis-scales the latent decode (negative
        control; no-op for the pixel family — see ``_postprocess``);
        ``ode_direction=-1`` integrates the flow ODE the wrong way (the FLOW
        family's negative control, flow.py _solve)."""
        key = key if key is not None else jax.random.fold_in(
            self.state.key, 0x5A7712  # fixed salt: sampling stream ≠ training stream
        )
        params = self.state.ema_params if use_ema else self.state.params
        classes = np.asarray(classes, np.int32)
        n = len(classes)
        # a mesh-sharded sampler needs the batch divisible across the data axis —
        # pad with class 0 and trim (the pad images are discarded)
        mult = global_batch_multiple(self.mesh)
        pad = (-n) % mult
        if pad:
            classes = np.concatenate([classes, np.zeros((pad,), np.int32)])
        if self.mesh is not None:
            classes = shard_batch(self.mesh, {"y": classes})["y"]
        else:
            classes = jnp.asarray(classes)
        x0 = self._sampler(params, key, classes, float(cfg_scale), method,
                           int(ddim_steps), float(eta),
                           float(decode_scale_override), float(ode_direction))
        return reverse_transform(jax.device_get(x0)[:n])
