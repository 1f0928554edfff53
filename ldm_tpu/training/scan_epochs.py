"""Epoch-as-``lax.scan``: one dispatch per training epoch.

The reference's epoch loop pays a host→device copy and a ``loss.item()`` host sync
per batch (src/DiffusionModelTrainer.py:37,67; src/ResNetTrainer.py:103).  Here the
whole epoch is ONE jitted program over a device-resident uint8 dataset:

    shuffle (jax.random.permutation) → per-step gather + [-1,1] scaling →
    step_body (noising/loss/backward/optimizer/EMA) → stacked per-step metrics

On a mesh the dataset is replicated and each step's gathered batch is
sharding-constrained to the ``data`` axis, so every chip gathers its own shard
with zero step-path collectives (the gradient all-reduce XLA inserts is the only
communication, same as per-batch DP).

Used by the diffusion, classifier, and autoencoder trainers; they fall back to
per-batch stepping for custom loaders/transforms or ``config.scan_epochs=False``.
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ldm_tpu.data.transforms import scale_to_minus_one_one
from ldm_tpu.parallel.mesh import data_sharding, global_batch_multiple, replicated

StepBody = Callable[[Any, dict], Tuple[Any, Any]]  # (state, batch) -> (state, out)


class EpochScan:
    """A compiled one-dispatch epoch. Call with (state, epoch index) →
    (state, stacked step outputs).  Owns the shuffle-key derivation: the epoch
    index is folded into a salted stream of the state's (constant) key, so the
    per-step keys (``state.step_key()``, unsalted) can never collide with it."""

    SHUFFLE_SALT = 0xE70C

    def __init__(self, fn, data, n_batches: int, batch_size: int):
        self._fn = fn
        self._data = data
        self.n_batches = n_batches
        self.batch_size = batch_size

    def __call__(self, state, epoch: int):
        epoch_key = jax.random.fold_in(
            jax.random.fold_in(state.key, self.SHUFFLE_SALT), epoch
        )
        return self._fn(state, *self._data, epoch_key)


def build_epoch_scan(
    step_body: StepBody,
    loader,
    mesh=None,
    enabled: bool = True,
) -> Optional[EpochScan]:
    """Compile ``loader``'s epoch into one scan, or return None if the loader
    isn't the standard in-memory kind (custom transform, no drop_last, batch not
    divisible across the mesh)."""
    ds = getattr(loader, "dataset", None)
    if (
        not enabled
        or ds is None
        or getattr(loader, "transform", None) is not scale_to_minus_one_one
        or not getattr(loader, "drop_last", False)
    ):
        return None
    b = loader.batch_size
    n_batches = len(ds) // b
    if n_batches == 0 or b % global_batch_multiple(mesh) != 0:
        return None

    if mesh is not None:
        # replicated across all devices (multi-process-safe placement)
        from ldm_tpu.parallel.distributed import host_to_global

        rep = replicated(mesh)
        imgs = host_to_global(rep, np.asarray(ds.images))
        labels = host_to_global(rep, np.asarray(ds.labels, np.int32))
    else:
        imgs = jnp.asarray(ds.images)  # uint8, 4x smaller than fp32 in HBM
        labels = jnp.asarray(np.asarray(ds.labels, np.int32))
    shuffle = bool(getattr(loader, "shuffle", True))

    def epoch_fn(state, images, labels, epoch_key):
        n = images.shape[0]
        perm = jax.random.permutation(epoch_key, n) if shuffle else jnp.arange(n)
        idx = perm[: n_batches * b].reshape(n_batches, b)

        def step(state, ib):
            img = images[ib].astype(jnp.float32) / 255.0 * 2.0 - 1.0
            batch = {"image": img, "label": labels[ib]}
            if mesh is not None:
                batch = jax.lax.with_sharding_constraint(
                    batch, data_sharding(mesh)
                )
            return step_body(state, batch)

        return jax.lax.scan(step, state, idx)

    kw = {"donate_argnums": (0,)}
    if mesh is not None:
        rep = replicated(mesh)
        kw["in_shardings"] = (rep, rep, rep, rep)
    return EpochScan(jax.jit(epoch_fn, **kw), (imgs, labels), n_batches, b)
