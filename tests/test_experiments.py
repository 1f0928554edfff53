"""End-to-end smoke of the 5-experiment augmentation pipeline + viz helpers."""

import numpy as np
import pytest

from ldm_tpu.config import Config, DataConfig, DiffusionConfig, ModelConfig
from ldm_tpu.diffusion.ddpm import GaussianDiffusion
from ldm_tpu.utils.viz import forward_diffusion_at, forward_process_grid


def test_forward_process_viz(tmp_path):
    diff = GaussianDiffusion(n_steps=50)
    img = np.random.default_rng(0).uniform(-1, 1, (8, 8, 1)).astype(np.float32)
    one = forward_diffusion_at(diff, img, t=25)
    assert one.shape == (8, 8, 1) and one.dtype == np.uint8
    out = str(tmp_path / "fwd.png")
    grid = forward_process_grid(diff, img, out_path=out)
    assert grid.dtype == np.uint8
    import os

    assert os.path.exists(out)


@pytest.mark.slow
def test_augmentation_experiment_tiny(tmp_path):
    """The full protocol (diffusion train → synth generation → 5 classifier mixes
    → test F1) on a tiny model/dataset."""
    from ldm_tpu.experiments.augmentation import run_augmentation_experiment

    cfg = Config(
        project_name="aug", workdir=str(tmp_path), epochs=1, batch_size=16,
        use_amp=False, seed=0, debugging=False,
        model=ModelConfig(params=dict(
            in_channels=1, out_channels=1, channels=8,
            channel_multipliers=[1], num_classes=10,
        )),
        diffusion=DiffusionConfig(n_steps=4, cfg_scale=3),
        data=DataConfig(dataset="SYNTHETIC", image_size=8, image_channels=1),
    )
    result = run_augmentation_experiment(
        cfg, n_per_class=4, sample_batch=16, classifier_epochs=1,
        classifier_arch=dict(n_blocks=(1,), n_channels=(8,)),
        negative_control=True,
    )
    assert set(result.test_f1) == {"exp1", "exp2", "exp3", "exp4", "exp5",
                                   "exp2_broken"}
    assert all(0.0 <= v <= 1.0 for v in result.test_f1.values())
    assert result.synthetic_size == 40
    assert result.fid_pixel_broken is not None
    assert result.fid_classifier_broken is not None

    # Phases-C+ resume from the Phase-A checkpoint: same experiment keys,
    # zero diffusion epochs retrained (--diffusion-checkpoint path)
    result2 = run_augmentation_experiment(
        cfg, n_per_class=4, sample_batch=16, classifier_epochs=1,
        classifier_arch=dict(n_blocks=(1,), n_channels=(8,)),
        diffusion_checkpoint=f"{cfg.checkpoints}/best_state.msgpack",
    )
    assert set(result2.test_f1) == {"exp1", "exp2", "exp3", "exp4", "exp5"}


@pytest.mark.slow
def test_augmentation_experiment_latent_generator(tmp_path):
    """--generator-config: the protocol's Phases A/C driven by the latent
    family (frozen VAE + latent UNet), the rest of the pipeline unchanged."""
    import yaml

    from ldm_tpu.experiments.augmentation import run_augmentation_experiment

    gen_cfg_path = str(tmp_path / "gen_latent.yaml")
    with open(gen_cfg_path, "w") as f:
        yaml.safe_dump({
            "project_name": "aug_latent_gen", "type": "latent",
            "workdir": str(tmp_path),
            "epochs": 1, "batch_size": 16, "use_amp": False, "seed": 0,
            "sample_every": 0, "checkpoint_every": 0,
            "diffusion": {
                "type": "latent", "cfg_scale": 3, "schedule": "sqrt_linear",
                "latent_scaling_factor": "auto",
                "params": {"n_steps": 4, "n_samples": 10},
            },
            # no ae_checkpoint: random frozen first stage (smoke semantics)
            "autoencoder": {
                "target": "ldm_tpu.models.autoencoder.Autoencoder",
                "params": {"in_channels": 1, "out_channels": 1, "channels": 8,
                           "channel_multipliers": [1, 2], "n_resnet_blocks": 1,
                           "z_channels": 4},
            },
            "model": {"target": "ldm_tpu.models.unet.UNet",
                      "params": {"in_channels": 4, "out_channels": 4,
                                 "channels": 8, "channel_multipliers": [1],
                                 "num_classes": 10}},
            "data": {"dataset": "SYNTHETIC", "image_size": 8,
                     "image_channels": 1},
        }, f)

    cfg = Config(
        project_name="aug_lat", workdir=str(tmp_path), epochs=1, batch_size=16,
        use_amp=False, seed=0,
        diffusion=DiffusionConfig(n_steps=4, cfg_scale=3),
        data=DataConfig(dataset="SYNTHETIC", image_size=8, image_channels=1),
    )
    result = run_augmentation_experiment(
        cfg, n_per_class=4, sample_batch=16, classifier_epochs=1,
        classifier_arch=dict(n_blocks=(1,), n_channels=(8,)),
        generator_config=gen_cfg_path, sampler="ddim", ddim_steps=2,
        negative_control=True,
    )
    assert set(result.test_f1) == {"exp1", "exp2", "exp3", "exp4", "exp5",
                                   "exp2_broken"}
    assert result.synthetic_size == 40  # decoded to image space, mixed as usual
    # the latent family's negative control is the MIS-SCALED DECODE (the
    # reference's hardcoded-SD-constant bug class), not the pixel family's
    # few-step/unguided break — see augmentation.py
    assert result.fid_pixel_broken is not None
    assert result.fid_classifier_broken is not None


def test_phase_c_sampler_family_defaults():
    """The Phase-C sampler default is family-aware: rectified flow gets
    Heun-25 (measurement-aligned, perf/probe35.json); every other family
    keeps the reference's ancestral DDPM; explicit args always win."""
    from ldm_tpu.diffusion.ddpm import GaussianDiffusion
    from ldm_tpu.diffusion.flow import RectifiedFlow
    from ldm_tpu.experiments.augmentation import phase_c_sampler_default

    class _DT:
        def __init__(self, diffusion):
            self.diffusion = diffusion

    flow_dt = _DT(RectifiedFlow(n_steps=4))
    ddpm_dt = _DT(GaussianDiffusion(n_steps=4))
    assert phase_c_sampler_default(flow_dt, None, None) == ("dpmpp", 25)
    assert phase_c_sampler_default(ddpm_dt, None, None) == ("ddpm", 50)
    # explicit choices pass through untouched
    assert phase_c_sampler_default(flow_dt, "ddim", 10) == ("ddim", 10)
    assert phase_c_sampler_default(ddpm_dt, "dpmpp", None) == ("dpmpp", 50)
    # steps-only override keeps the family sampler
    assert phase_c_sampler_default(flow_dt, None, 15) == ("dpmpp", 15)
    # NAMING the flow family's own default sampler keeps the family's
    # measured budget (Heun-25 = 50 evals), not the generic 50 steps
    assert phase_c_sampler_default(flow_dt, "dpmpp", None) == ("dpmpp", 25)
    # flow + explicit Euler without steps = the Euler-50 protocol arm
    assert phase_c_sampler_default(flow_dt, "ddim", None) == ("ddim", 50)
