"""ResNet classifier model + trainer tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ldm_tpu.config import Config, DataConfig
from ldm_tpu.data.datasets import synthetic_dataset
from ldm_tpu.data.loader import DataLoader
from ldm_tpu.models.resnet import ResNetBase
from ldm_tpu.training.resnet_trainer import ResNetTrainer


@pytest.fixture(scope="module")
def tiny_resnet():
    model = ResNetBase(
        img_channels=1, out_channels=10, n_blocks=(1, 1), n_channels=(8, 16),
    )
    x = jnp.zeros((2, 16, 16, 1))
    variables = jax.jit(lambda k, x: model.init(k, x, train=False))(
        jax.random.key(0), x
    )
    return model, variables


def test_logits_shape_and_probs(tiny_resnet):
    model, variables = tiny_resnet
    x = jax.random.normal(jax.random.key(1), (4, 16, 16, 1))
    logits = model.apply(variables, x, train=False)
    assert logits.shape == (4, 10)
    probs = model.apply(variables, x, train=False, probs=True)
    np.testing.assert_allclose(np.asarray(probs.sum(-1)), 1.0, rtol=1e-5)


def test_batchnorm_stats_update(tiny_resnet):
    model, variables = tiny_resnet
    x = jax.random.normal(jax.random.key(2), (4, 16, 16, 1))
    _, updates = model.apply(variables, x, train=True, mutable=["batch_stats"])
    before = jax.tree.leaves(variables["batch_stats"])
    after = jax.tree.leaves(updates["batch_stats"])
    assert any(
        not np.allclose(np.asarray(a), np.asarray(b)) for a, b in zip(before, after)
    )


@pytest.mark.slow
def test_resnet_trainer_learns_synthetic(tmp_path):
    """The classifier must fit the class-conditional synthetic data well above
    chance in a few epochs — end-to-end train/valid/test via the trainer."""
    cfg = Config(
        project_name="rn", workdir=str(tmp_path), type="classifier",
        epochs=4, batch_size=32, lr=1e-3, use_amp=False, loss_fn="cross-entropy",
        data=DataConfig(dataset="SYNTHETIC", image_size=16, image_channels=1),
    )
    tr_ds = synthetic_dataset(512, 16, 1, seed=0)
    va_ds = synthetic_dataset(128, 16, 1, seed=1)
    te_ds = synthetic_dataset(128, 16, 1, seed=2, train=False)
    model = ResNetBase(img_channels=1, out_channels=10,
                       n_blocks=(1, 1), n_channels=(8, 16))
    trainer = ResNetTrainer(
        cfg, model,
        DataLoader(tr_ds, 32, seed=0),
        DataLoader(va_ds, 32, seed=1),
        classes=list(range(10)),
        test_loader=DataLoader(te_ds, 32, shuffle=False, drop_last=False),
    )
    hist = trainer.train()
    assert hist["train"][-1]["f1_micro"] > 0.5  # well above 0.1 chance
    stats = trainer.test()
    # 4 tiny epochs: generalization lags training — just require well above chance
    assert stats["f1_micro"] > 0.25
    assert 0 <= stats["f1_macro"] <= 1
