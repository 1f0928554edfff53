"""Latent diffusion wiring + trainer tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ldm_tpu.config import Config, DataConfig, DiffusionConfig
from ldm_tpu.data.datasets import synthetic_dataset
from ldm_tpu.data.loader import DataLoader
from ldm_tpu.models.autoencoder import Autoencoder
from ldm_tpu.models.latent import LatentDiffusionModel
from ldm_tpu.models.unet import UNet
from ldm_tpu.training.latent_trainer import LatentDiffusionTrainer, latent_shape_of


def _tiny_ldm():
    ae = Autoencoder(in_channels=1, out_channels=1, channels=8,
                     channel_multipliers=(1, 2), n_resnet_blocks=1, z_channels=4)
    unet = UNet(in_channels=4, out_channels=4, channels=8,
                channel_multipliers=(1, 2), num_classes=10)
    return LatentDiffusionModel(
        eps_model=unet, autoencoder=ae, latent_scaling_factor=0.18215,
        n_steps=8, linear_start=8.5e-4, linear_end=1.2e-2,
    )


def test_latent_shape_of():
    ae = Autoencoder(channels=8, channel_multipliers=(1, 2), z_channels=4)
    assert latent_shape_of(ae, 16) == (8, 8, 4)
    ae4 = Autoencoder(channels=8, channel_multipliers=(1, 2, 4, 8), z_channels=512)
    assert latent_shape_of(ae4, 32) == (4, 4, 512)


def test_sqrt_linear_schedule_used():
    ldm = _tiny_ldm()
    betas = np.asarray(ldm.diffusion.schedule.betas)
    expected = np.linspace(8.5e-4**0.5, 1.2e-2**0.5, 8, dtype=np.float64) ** 2
    np.testing.assert_allclose(betas, expected.astype(np.float32))


@pytest.mark.slow
def test_latent_trainer_end_to_end(tmp_path):
    """Frozen-VAE encode inside the jitted step; sample() decodes to images."""
    ldm = _tiny_ldm()
    cfg = Config(
        project_name="ldm", workdir=str(tmp_path), type="latent",
        epochs=1, batch_size=16, use_amp=False, seed=0,
        diffusion=DiffusionConfig(n_steps=8, cfg_scale=3),
        data=DataConfig(dataset="SYNTHETIC", image_size=16, image_channels=1),
    )
    ae_params = jax.jit(ldm.autoencoder.init)(
        jax.random.key(0), jnp.zeros((1, 16, 16, 1)), jax.random.key(1)
    )
    ds = synthetic_dataset(48, 16, 1, seed=0)
    trainer = LatentDiffusionTrainer(
        cfg, ldm, ae_params,
        DataLoader(ds.subset(np.arange(32)), 16, seed=0),
        DataLoader(ds.subset(np.arange(32, 48)), 16, seed=1),
        classes=list(range(10)),
    )
    hist = trainer.train()
    assert np.isfinite(hist["train_loss"][0])
    imgs = trainer.sample([0, 1], cfg_scale=3.0)
    assert imgs.shape == (2, 16, 16, 1) and imgs.dtype == np.uint8
    # the DDIM switch is inherited from DiffusionTrainer: few-step sampling in
    # latent space, decoded through the frozen VAE in the same jitted program
    imgs_ddim = trainer.sample([0, 1], cfg_scale=3.0, method="ddim",
                               ddim_steps=3)
    assert imgs_ddim.shape == (2, 16, 16, 1) and imgs_ddim.dtype == np.uint8


def test_calibrate_latent_scaling_auto():
    """latent_scaling_factor: "auto" resolves to 1/std of sampled latents, and
    the trainer-side resolver returns the identical constant for identical
    config+data (so sample-time callers re-derive the training-time factor)."""
    from ldm_tpu.models.latent import calibrate_latent_scaling
    from ldm_tpu.training.latent_trainer import resolve_latent_scaling

    ldm = _tiny_ldm()
    ae_params = jax.jit(ldm.autoencoder.init)(
        jax.random.key(0), jnp.zeros((1, 16, 16, 1)), jax.random.key(1)
    )
    ds = synthetic_dataset(64, 16, 1, seed=0)
    loader = DataLoader(ds, 16, seed=0)
    imgs = jnp.asarray(loader.transform(ds.images[:512]))
    f = calibrate_latent_scaling(ldm.autoencoder, ae_params, imgs, jax.random.key(42))
    # direct check against the definition
    moments = ldm.autoencoder.apply(ae_params, imgs, method="encode_moments")
    z = ldm.autoencoder.sample_latent(moments, jax.random.key(42))
    np.testing.assert_allclose(f, 1.0 / float(jnp.std(z)), rtol=1e-6)

    cfg = Config(
        type="latent", diffusion=DiffusionConfig(latent_scaling_factor="auto"),
        data=DataConfig(dataset="SYNTHETIC", image_size=16, image_channels=1),
    )
    r1 = resolve_latent_scaling(cfg, ldm.autoencoder, ae_params, loader)
    r2 = resolve_latent_scaling(cfg, ldm.autoencoder, ae_params, loader)
    assert r1 == r2 == pytest.approx(
        calibrate_latent_scaling(ldm.autoencoder, ae_params, imgs,
                                 jax.random.key(cfg.seed)), rel=1e-6)
    # floats pass through untouched; junk is rejected at config construction
    cfg2 = Config(diffusion=DiffusionConfig(latent_scaling_factor=0.5))
    assert resolve_latent_scaling(cfg2, ldm.autoencoder, ae_params, loader) == 0.5
    with pytest.raises(ValueError):
        DiffusionConfig(latent_scaling_factor="bogus")
    with pytest.raises(ValueError):
        DiffusionConfig(latent_scaling_factor=-1.0)


def test_encode_decode_roundtrip_scaling():
    ldm = _tiny_ldm()
    ae_params = jax.jit(ldm.autoencoder.init)(
        jax.random.key(0), jnp.zeros((1, 16, 16, 1)), jax.random.key(1)
    )
    img = jax.random.normal(jax.random.key(2), (2, 16, 16, 1))
    z = ldm.autoencoder_encode(ae_params, jax.random.key(3), img)
    assert z.shape == (2, 8, 8, 4)
    out = ldm.autoencoder_decode(ae_params, z)
    assert out.shape == img.shape


@pytest.mark.slow
def test_latent_trainer_on_mesh(tmp_path):
    """DP latent diffusion over the virtual mesh: frozen-VAE encode inside the
    sharded scan-epoch step, and sampling (latent scan + VAE decode) with the
    class batch sharded on the data axis."""
    from ldm_tpu.parallel.mesh import create_mesh

    ldm = _tiny_ldm()
    cfg = Config(
        project_name="ldm_mesh", workdir=str(tmp_path), type="latent",
        epochs=1, batch_size=16, use_amp=False, seed=0,
        diffusion=DiffusionConfig(n_steps=8, cfg_scale=3),
        data=DataConfig(dataset="SYNTHETIC", image_size=16, image_channels=1),
    )
    ae_params = jax.jit(ldm.autoencoder.init)(
        jax.random.key(0), jnp.zeros((1, 16, 16, 1)), jax.random.key(1)
    )
    ds = synthetic_dataset(48, 16, 1, seed=0)
    trainer = LatentDiffusionTrainer(
        cfg, ldm, ae_params,
        DataLoader(ds.subset(np.arange(32)), 16, seed=0),
        DataLoader(ds.subset(np.arange(32, 48)), 16, seed=1),
        classes=list(range(10)), mesh=create_mesh(),
    )
    assert trainer._epoch_scan is not None  # scan-epoch path active on the mesh
    hist = trainer.train()
    assert np.isfinite(hist["train_loss"][0])
    imgs = trainer.sample(list(range(10)), cfg_scale=3.0)  # 10 on 8 devices: pad
    assert imgs.shape == (10, 16, 16, 1) and imgs.dtype == np.uint8


def test_decode_scale_override_negative_control():
    """``sample(decode_scale_override=s)`` decodes ``z0 / s`` instead of
    ``z0 / calibrated`` — the protocol's latent negative control (the
    reference's hardcoded-SD-constant bug class,
    src/LatentDiffusionModel.py:28). Override == the model's own scale must
    be bit-identical to the normal path; a mis-scale must change the images."""
    ldm = _tiny_ldm()
    cfg = Config(
        project_name="ldm_nc", workdir="/tmp/ldm_nc", type="latent",
        epochs=1, batch_size=8, use_amp=False, seed=0,
        diffusion=DiffusionConfig(n_steps=8, cfg_scale=3),
        data=DataConfig(dataset="SYNTHETIC", image_size=16, image_channels=1),
    )
    ae_params = jax.jit(ldm.autoencoder.init)(
        jax.random.key(0), jnp.zeros((1, 16, 16, 1)), jax.random.key(1)
    )
    ds = synthetic_dataset(24, 16, 1, seed=0)
    trainer = LatentDiffusionTrainer(
        cfg, ldm, ae_params,
        DataLoader(ds.subset(np.arange(16)), 8, seed=0),
        DataLoader(ds.subset(np.arange(16, 24)), 8, seed=1),
        classes=list(range(10)),
    )
    key = jax.random.key(7)
    normal = trainer.sample([0, 1], cfg_scale=3.0, key=key)
    same = trainer.sample([0, 1], cfg_scale=3.0, key=key,
                          decode_scale_override=ldm.latent_scaling_factor)
    np.testing.assert_array_equal(normal, same)
    broken = trainer.sample([0, 1], cfg_scale=3.0, key=key,
                            decode_scale_override=ldm.latent_scaling_factor * 5)
    assert not np.array_equal(normal, broken)


def test_decode_scale_override_noop_for_pixel_family():
    """The pixel trainer ignores the override (its _postprocess is identity) —
    the orchestrator can thread the knob family-agnostically."""
    from ldm_tpu.config import ModelConfig
    from ldm_tpu.factory import build_diffusion, build_model
    from ldm_tpu.training.diffusion_trainer import DiffusionTrainer

    cfg = Config(
        project_name="pix_nc", workdir="/tmp/pix_nc",
        epochs=1, batch_size=8, use_amp=False, seed=0,
        diffusion=DiffusionConfig(n_steps=8, cfg_scale=3),
        data=DataConfig(dataset="SYNTHETIC", image_size=8, image_channels=1),
        model=ModelConfig(params=dict(
            in_channels=1, out_channels=1, channels=8,
            channel_multipliers=[1, 2], num_classes=10,
        )),
    )
    ds = synthetic_dataset(24, 8, 1, seed=0)
    tr = DiffusionTrainer(
        cfg, build_model(cfg), build_diffusion(cfg),
        DataLoader(ds.subset(np.arange(16)), 8, seed=0),
        DataLoader(ds.subset(np.arange(16, 24)), 8, seed=1),
        classes=list(range(10)),
    )
    key = jax.random.key(7)
    a = tr.sample([0, 1], cfg_scale=3.0, key=key)
    b = tr.sample([0, 1], cfg_scale=3.0, key=key, decode_scale_override=0.18215)
    np.testing.assert_array_equal(a, b)
