"""ResNet classifier trainer.

Rebuild of the reference ``ResNetTrainer`` (src/ResNetTrainer.py): a unified
``run(mode, loader)`` for train/pretrain/valid/test plus an epoch-loop ``train()``
with early stopping, reporting loss and micro-F1.

TPU-first changes:

* one jitted train step (donated state) carrying BatchNorm ``batch_stats`` through
  the TrainState — the torch mutable-module state becomes explicit pytree state;
* cross-entropy on LOGITS via optax (the reference double-softmaxes: Softmax in the
  model then F.cross_entropy, src/ResNetClassifier.py:243 + src/Trainer.py:64 —
  fixed here, PARITY.md);
* F1 from an on-device confusion-matrix accumulator instead of per-batch sklearn
  host syncs (src/ResNetTrainer.py:143-148);
* the reference's loss-return bug (last-batch loss instead of the epoch total,
  src/ResNetTrainer.py:166-167) and epoch-average bug (divide by ``epoch`` instead
  of the count, :73-76) are NOT reproduced.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ldm_tpu.config import Config
from ldm_tpu.ops.metrics import confusion_matrix, f1_from_confusion
from ldm_tpu.parallel.mesh import data_sharding, replicated, shard_batch
from ldm_tpu.training import checkpoint as ckpt
from ldm_tpu.training.early_stopping import EarlyStopping
from ldm_tpu.training.state import TrainState, make_optimizer
from ldm_tpu.utils.logging import MetricsLogger


class ResNetTrainer:
    def __init__(
        self,
        config: Config,
        model,  # ldm_tpu.models.resnet.ResNetBase
        train_loader,
        val_loader,
        classes,
        test_loader=None,
        mesh=None,
        logger: Optional[MetricsLogger] = None,
        name: str = "resnet",
        pad_train_to: Optional[int] = None,
    ):
        self.config = config
        self.model = model
        self.train_loader = train_loader
        self.val_loader = val_loader
        self.test_loader = test_loader
        self.num_classes = len(classes)
        self.mesh = mesh
        self.name = name
        self.logger = logger or MetricsLogger(config.dirpath, config.project_name)
        config.create_dirs()

        self._init_state(config.seed)
        self._train_step = self._build_train_step()
        self._eval_step = self._build_eval_step()
        if pad_train_to is not None and getattr(config, "scan_epochs", True):
            # ONE epoch program reused across datasets up to `pad_train_to`
            # samples (the augmentation protocol retrains this classifier on
            # five different-size mixes; per-mix epoch-scan recompiles were
            # ~38 min of the round-2 protocol, VERDICT round 2 weak #1)
            from ldm_tpu.training.scan_epochs import PaddedEpochScan

            d = config.data
            ds = self.train_loader.dataset
            self._epoch_scan = PaddedEpochScan(
                self._train_body, self.train_loader.batch_size, pad_train_to,
                image_shape=(d.image_size, d.image_size, d.image_channels),
                mesh=self.mesh, shuffle=bool(self.train_loader.shuffle),
            )
            self._epoch_scan.set_data(ds.images, ds.labels)
        else:
            from ldm_tpu.training.scan_epochs import build_epoch_scan

            self._epoch_scan = build_epoch_scan(
                self._train_body, self.train_loader, mesh=self.mesh,
                enabled=getattr(config, "scan_epochs", True),
            )
        self._reset_early_stopping()

    def _init_state(self, seed: int) -> None:
        d = self.config.data
        dummy = jnp.zeros((1, d.image_size, d.image_size, d.image_channels))
        variables = jax.jit(lambda k, x: self.model.init(k, x, train=False))(
            jax.random.key(seed), dummy
        )
        params = {"params": variables["params"]}
        batch_stats = variables.get("batch_stats", {})
        self.state = TrainState.create(
            params, make_optimizer(self.config.lr), jax.random.key(seed + 1),
            ema_decay=self.config.ema_decay, batch_stats=batch_stats,
        )

    def _reset_early_stopping(self) -> None:
        self.early_stopping = EarlyStopping(
            patience=self.config.early_stopping_patience, verbose=True,
            save_fn=self._save_best,
            min_delta_rel=getattr(
                self.config, "early_stopping_min_delta_rel", 0.0
            ),
        )

    def reset(self, seed: Optional[int] = None, name: Optional[str] = None) -> None:
        """Fresh-start the trainer for a new experiment WITHOUT rebuilding (and
        recompiling) any program: re-init params/opt/EMA/BatchNorm state, reset
        early stopping, clear the best-state cache.  Pair with
        ``set_train_data`` to retrain from scratch on a different dataset with
        zero recompiles (the augmentation protocol's exp1..exp5 loop)."""
        self._init_state(seed if seed is not None else self.config.seed)
        self._reset_early_stopping()
        self._best_dirty = False
        if hasattr(self, "_best_state"):
            del self._best_state
        if name is not None:
            self.name = name

    def set_train_data(self, dataset) -> None:
        """Swap the training dataset (padded-scan mode only) — no recompile."""
        from ldm_tpu.training.scan_epochs import PaddedEpochScan

        if not isinstance(self._epoch_scan, PaddedEpochScan):
            raise RuntimeError(
                "set_train_data requires pad_train_to (PaddedEpochScan) mode"
            )
        self._epoch_scan.set_data(dataset.images, dataset.labels)
        self.train_loader.dataset = dataset

    # ------------------------------------------------------------------- jit
    def _jit(self, fn, donate_state: bool = False):
        kw = {"donate_argnums": (0,)} if donate_state else {}
        if self.mesh is None:
            return jax.jit(fn, **kw)
        rep, dat = replicated(self.mesh), data_sharding(self.mesh)
        return jax.jit(fn, in_shardings=(rep, dat), **kw)

    def _train_body(self, state: TrainState, batch) -> Tuple[TrainState, dict]:
        model, nc = self.model, self.num_classes

        def loss_fn(params):
            logits, updates = model.apply(
                {"params": params["params"], "batch_stats": state.batch_stats},
                batch["image"], train=True, mutable=["batch_stats"],
            )
            loss = optax.softmax_cross_entropy_with_integer_labels(
                logits, batch["label"]
            ).mean()
            return loss, (logits, updates["batch_stats"])

        (loss, (logits, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        state = state.apply_gradients(grads, batch_stats=new_stats)
        cm = confusion_matrix(jnp.argmax(logits, -1), batch["label"], nc)
        return state, {"loss": loss, "cm": cm}

    def _build_train_step(self):
        def train_step(state: TrainState, batch) -> Tuple[TrainState, dict]:
            return self._train_body(state, batch)

        return self._jit(train_step, donate_state=True)

    def _build_eval_step(self):
        model, nc = self.model, self.num_classes

        def eval_step(state: TrainState, batch) -> dict:
            logits = model.apply(
                {"params": state.params["params"], "batch_stats": state.batch_stats},
                batch["image"], train=False,
            )
            loss = optax.softmax_cross_entropy_with_integer_labels(
                logits, batch["label"]
            ).mean()
            cm = confusion_matrix(jnp.argmax(logits, -1), batch["label"], nc)
            return {"loss": loss, "cm": cm}

        return self._jit(eval_step)

    # ----------------------------------------------------------- persistence
    def _save_best(self, state: TrainState) -> None:
        """Val-improvement hook: on-device copy, flushed at epoch cadence / end
        (host round-trips per improvement dominate epoch time otherwise)."""
        self._best_state = jax.tree.map(jnp.copy, state)
        self._best_dirty = True

    def _flush_best(self) -> None:
        if not getattr(self, "_best_dirty", False):
            return
        state = self._best_state
        ckpt.save_params(
            f"{self.config.checkpoints}/{self.name}.msgpack",
            {"params": state.params["params"], "batch_stats": state.batch_stats},
        )
        ckpt.save_state(f"{self.config.checkpoints}/{self.name}_state.msgpack", state)
        self._best_dirty = False

    def load_best(self) -> None:
        """Reload best weights for testing (reference reloads the best checkpoint
        before run('test'), main.py:262-289).

        Fast path: the ON-DEVICE best copy kept by ``_save_best`` — no disk
        round trip at all.  Disk fallback (test() without train()) places the
        loaded tree on device immediately: ``load_params`` returns host numpy
        arrays, and jitted eval steps re-upload HOST params on EVERY call —
        over the tunnel that turned each protocol test pass into ~7 minutes
        of transfers (196 batches x 45 MB, round-3 finding; the same gotcha
        the verify skill documents for generate_images)."""
        if hasattr(self, "_best_state"):
            best = self._best_state
            self.state = self.state.replace(
                params=best.params, batch_stats=best.batch_stats
            )
            return
        template = {
            "params": self.state.params["params"],
            "batch_stats": self.state.batch_stats,
        }
        loaded = ckpt.load_params(
            f"{self.config.checkpoints}/{self.name}.msgpack", template
        )
        if self.mesh is not None:
            from ldm_tpu.parallel.mesh import replicated
            loaded = jax.device_put(loaded, replicated(self.mesh))
        else:
            loaded = jax.device_put(loaded)
        self.state = self.state.replace(
            params={"params": loaded["params"]}, batch_stats=loaded["batch_stats"]
        )

    # ------------------------------------------------------------- embeddings
    def features(self, images_m11: np.ndarray, batch_size: int = 256) -> np.ndarray:
        """Penultimate pooled embeddings of the trained classifier — the feature
        space for FID (ops.fid.classifier_fid).  ``images_m11``: float NHWC in
        [-1, 1]."""
        if not hasattr(self, "_features_fn"):  # jit once, reuse across calls
            self._features_fn = jax.jit(
                lambda v, x: self.model.apply(v, x, train=False, features=True)
            )
        fn = self._features_fn
        variables = {
            "params": self.state.params["params"],
            "batch_stats": self.state.batch_stats,
        }
        n = len(images_m11)
        batch_size = min(batch_size, n)  # pad source must cover a full batch
        pad = (-n) % batch_size  # one compile per batch size: pad tail, trim
        if pad:
            images_m11 = np.concatenate([images_m11, images_m11[:pad]])
        outs = [
            np.asarray(fn(variables, jnp.asarray(images_m11[i : i + batch_size])))
            for i in range(0, len(images_m11), batch_size)
        ]
        return np.concatenate(outs)[:n]

    # ------------------------------------------------------------------ run
    def run(self, mode: str, dataloader=None) -> Dict[str, float]:
        """One pass over a loader (reference ``run``, src/ResNetTrainer.py:86-169).

        mode: "train" | "pretrain" (alias of train) | "valid" | "test".
        Returns {"loss", "f1_micro", "f1_macro", "accuracy"} averaged over the pass.
        """
        if dataloader is None:
            dataloader = {
                "train": self.train_loader, "pretrain": self.train_loader,
                "valid": self.val_loader, "test": self.test_loader,
            }[mode]
        training = mode in ("train", "pretrain")
        if training and dataloader is self.train_loader and self._epoch_scan:
            # one dispatch for the whole epoch (scan_epochs.py); the shuffle-epoch
            # index derives from the optimizer step so a resumed/re-created trainer
            # continues the permutation stream (ADVICE.md round 1)
            epoch_idx = int(self.state.step) // self._epoch_scan.n_batches
            self.state, outs = self._epoch_scan(self.state, epoch_idx)
            outs = jax.device_get(outs)
            stats = {
                k: float(v)
                for k, v in f1_from_confusion(
                    jnp.asarray(outs["cm"].sum(axis=0))
                ).items()
                if k != "f1_per_class"
            }
            if "valid" in outs:  # padded scan: masked steps contribute zeros
                n_valid = max(1, int(outs["valid"].sum()))
                stats["loss"] = float(outs["loss"].sum() / n_valid)
            else:
                stats["loss"] = float(np.mean(outs["loss"]))
            return stats
        from ldm_tpu.parallel.mesh import global_batch_multiple

        n_div = global_batch_multiple(self.mesh)
        losses, cm_total = [], np.zeros((self.num_classes, self.num_classes), np.int64)
        for batch in dataloader:
            if len(batch["label"]) % n_div:
                continue  # mesh-sharded steps need evenly splittable batches
            batch = shard_batch(self.mesh, batch)
            if training:
                self.state, m = self._train_step(self.state, batch)
            else:
                m = self._eval_step(self.state, batch)
            losses.append(m["loss"])
            cm_total += np.asarray(jax.device_get(m["cm"]), np.int64)
        if not losses:
            raise ValueError(f"{mode} loader yielded no (mesh-divisible) batches")
        stats = {
            k: float(v)
            for k, v in f1_from_confusion(jnp.asarray(cm_total)).items()
            if k != "f1_per_class"
        }
        stats["loss"] = float(np.mean(jax.device_get(losses)))
        return stats

    # ---------------------------------------------------------------- train
    def train(self) -> dict:
        """Epoch loop with early stopping (reference src/ResNetTrainer.py:14-84)."""
        # wandb.define_metric parity (reference main.py:232-235 per experiment)
        self.logger.define_summaries({
            f"{self.name} train_loss": "min",
            f"{self.name} valid_loss": "min",
            f"{self.name} train_f1": "max",
            f"{self.name} valid_f1": "max",
        })
        history = {"train": [], "valid": []}
        for epoch in range(self.config.epochs):
            tr = self.run("train")
            va = self.run("valid")
            history["train"].append(tr)
            history["valid"].append(va)
            self.logger.log(
                {
                    f"{self.name} train_loss": tr["loss"],
                    f"{self.name} train_f1": tr["f1_micro"],
                    f"{self.name} valid_loss": va["loss"],
                    f"{self.name} valid_f1": va["f1_micro"],
                    "epoch": epoch,
                },
                step=epoch,
            )
            self.early_stopping(va["loss"], self.state)
            ce = getattr(self.config, "checkpoint_every", 1)
            if ce > 0 and (epoch + 1) % ce == 0:
                self._flush_best()
            if self.early_stopping.early_stop:
                print("Early stopping")
                break
        self._flush_best()
        return history

    def test(self) -> Dict[str, float]:
        """Best-checkpoint test pass (reference main.py:262-289)."""
        self._flush_best()  # in case test() is called without train()
        self.load_best()
        return self.run("test")
