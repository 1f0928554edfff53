"""VAE autoencoder model + trainer tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ldm_tpu.config import Config, DataConfig
from ldm_tpu.data.datasets import synthetic_dataset
from ldm_tpu.data.loader import DataLoader
from ldm_tpu.models.autoencoder import Autoencoder
from ldm_tpu.training.autoencoder_trainer import (
    AutoencoderTrainer,
    elbo_bce,
    kl_divergence,
)


@pytest.fixture(scope="module")
def tiny_vae():
    model = Autoencoder(
        in_channels=1, out_channels=1, channels=8, channel_multipliers=(1, 2),
        n_resnet_blocks=1, z_channels=4,
    )
    img = jnp.zeros((2, 16, 16, 1))
    params = jax.jit(model.init)(jax.random.key(0), img, jax.random.key(1))
    return model, params


def test_forward_shapes(tiny_vae):
    model, params = tiny_vae
    img = jax.random.normal(jax.random.key(2), (2, 16, 16, 1))
    recon, mu, log_var = model.apply(params, img, jax.random.key(3))
    assert recon.shape == img.shape
    # 2 resolutions → one downsample → 8x8 latent grid, z_channels=4
    assert mu.shape == (2, 8, 8, 4) and log_var.shape == mu.shape


def test_encode_decode_roundtrip_shapes(tiny_vae):
    model, params = tiny_vae
    img = jax.random.normal(jax.random.key(4), (2, 16, 16, 1))
    moments = model.apply(params, img, method="encode_moments")
    assert moments.shape == (2, 8, 8, 8)  # 2 * z_channels
    z = Autoencoder.sample_latent(moments, jax.random.key(5))
    assert z.shape == (2, 8, 8, 4)
    out = model.apply(params, z, method="decode")
    assert out.shape == img.shape


def test_latent_sampling_uses_reparameterization(tiny_vae):
    moments = jnp.concatenate(
        [jnp.ones((1, 2, 2, 3)), jnp.full((1, 2, 2, 3), -20.0)], axis=-1
    )  # mu=1, log_var=-20 → sigma≈0 → z≈mu
    z = Autoencoder.sample_latent(moments, jax.random.key(0))
    np.testing.assert_allclose(np.asarray(z), 1.0, atol=1e-3)


def test_kl_divergence_zero_at_standard_normal():
    mu = jnp.zeros((4, 3))
    log_var = jnp.zeros((4, 3))
    assert float(kl_divergence(mu, log_var)) == 0.0
    assert float(kl_divergence(jnp.ones((1, 1)), log_var[:1, :1])) > 0.0


def test_elbo_bce_matches_hand_computed():
    logits = jnp.zeros((1, 1, 1, 1))  # sigmoid = 0.5
    target = jnp.full((1, 1, 1, 1), 0.5)
    mu = jnp.zeros((1, 1)); lv = jnp.zeros((1, 1))
    # BCE(0.5 pred, 0.5 target) = -(0.5*log0.5 + 0.5*log0.5) = log 2
    assert np.isclose(float(elbo_bce(logits, target, mu, lv)), np.log(2), atol=1e-6)


@pytest.mark.slow
def test_autoencoder_trainer_reduces_loss(tmp_path):
    cfg = Config(
        project_name="ae", workdir=str(tmp_path), type="autoencoder",
        epochs=2, batch_size=16, lr=1e-3, use_amp=False, loss_fn="elbo",
        data=DataConfig(dataset="SYNTHETIC", image_size=16, image_channels=1),
    )
    ds = synthetic_dataset(96, 16, 1, seed=0)
    model = Autoencoder(in_channels=1, out_channels=1, channels=8,
                        channel_multipliers=(1, 2), n_resnet_blocks=1, z_channels=4)
    trainer = AutoencoderTrainer(
        cfg, model,
        DataLoader(ds.subset(np.arange(64)), 16, seed=0),
        DataLoader(ds.subset(np.arange(64, 96)), 16, seed=1),
    )
    hist = trainer.train()
    assert hist["train_loss"][1] < hist["train_loss"][0]
    recon = trainer.reconstruct(next(iter(trainer.val_loader))["image"][:2])
    assert recon.shape == (2, 16, 16, 1) and recon.dtype == np.uint8
