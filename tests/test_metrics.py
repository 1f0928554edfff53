"""On-device metrics vs sklearn ground truth."""

import jax.numpy as jnp
import numpy as np
import pytest

from ldm_tpu.ops.metrics import confusion_matrix, f1_from_confusion

sklearn = pytest.importorskip("sklearn.metrics")


def test_confusion_matrix_matches_sklearn():
    rng = np.random.default_rng(0)
    labels = rng.integers(0, 5, 200)
    preds = rng.integers(0, 5, 200)
    ours = np.asarray(confusion_matrix(jnp.asarray(preds), jnp.asarray(labels), 5))
    theirs = sklearn.confusion_matrix(labels, preds, labels=range(5))
    np.testing.assert_array_equal(ours, theirs)


def test_f1_matches_sklearn():
    rng = np.random.default_rng(1)
    labels = rng.integers(0, 10, 500)
    preds = np.where(rng.random(500) < 0.7, labels, rng.integers(0, 10, 500))
    cm = confusion_matrix(jnp.asarray(preds), jnp.asarray(labels), 10)
    stats = f1_from_confusion(cm)
    # micro-F1 == accuracy == sklearn micro (reference uses sklearn micro,
    # src/ResNetTrainer.py:143-148)
    assert np.isclose(
        float(stats["f1_micro"]),
        sklearn.f1_score(labels, preds, average="micro"),
        atol=1e-6,
    )
    assert np.isclose(
        float(stats["f1_macro"]),
        sklearn.f1_score(labels, preds, average="macro"),
        atol=1e-6,
    )


def test_throughput_counters():
    from ldm_tpu.utils.profiling import Throughput

    t = Throughput(n_chips=2)
    t.update(16)
    t.update(16)
    r = t.rates()
    assert r["steps_per_sec"] > 0
    # per-chip rate = steps/sec * batch / n_chips (same elapsed denominator)
    assert abs(r["samples_per_sec_per_chip"] - r["steps_per_sec"] * 16 / 2) < 1e-6
