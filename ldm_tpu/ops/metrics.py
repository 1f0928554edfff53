"""On-device classification metrics.

The reference computes micro-F1 with sklearn on the CPU once per batch
(src/ResNetTrainer.py:143-148) — a device→host sync in the middle of the hot loop.
Here a jitted confusion-matrix accumulator keeps the counts on device; F1 is derived
once per epoch from the aggregated matrix (and micro-F1 over the epoch equals
accuracy for single-label multiclass, which is also what per-batch-averaged sklearn
micro-F1 approximates).
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

Array = jax.Array


def confusion_matrix(preds: Array, labels: Array, num_classes: int) -> Array:
    """(N,) int preds/labels → (C, C) int32 matrix, rows = true class."""
    idx = labels.astype(jnp.int32) * num_classes + preds.astype(jnp.int32)
    flat = jnp.zeros((num_classes * num_classes,), jnp.int32).at[idx].add(1)
    return flat.reshape(num_classes, num_classes)


def f1_from_confusion(cm: Array) -> Dict[str, Array]:
    """micro/macro F1 + accuracy from a confusion matrix (float32 scalars)."""
    cm = cm.astype(jnp.float32)
    tp = jnp.diag(cm)
    support = cm.sum(axis=1)  # true counts
    predicted = cm.sum(axis=0)
    total = cm.sum()
    precision = tp / jnp.maximum(predicted, 1.0)
    recall = tp / jnp.maximum(support, 1.0)
    f1 = 2 * precision * recall / jnp.maximum(precision + recall, 1e-12)
    micro = tp.sum() / jnp.maximum(total, 1.0)  # == accuracy for multiclass
    return {
        "f1_micro": micro,
        "f1_macro": f1.mean(),
        "accuracy": micro,
        "f1_per_class": f1,
    }
