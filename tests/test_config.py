"""Config system tests, including verbatim parsing of the reference's shipped YAMLs."""

import os

import pytest
import yaml

from ldm_tpu.config import Config, config_from_dict, load_config
from ldm_tpu.registry import TARGET_ALIASES, resolve

REF_CFG_DIR = "/root/reference/config_files"


def test_defaults_roundtrip(tmp_path):
    cfg = Config(workdir=str(tmp_path))
    cfg.create_dirs()
    assert os.path.isdir(cfg.checkpoints) and os.path.isdir(cfg.results)
    assert cfg["batch_size"] == 64  # dict-style access parity (src/Trainer.py:43)


def test_our_configs_load():
    for name in (
        "pixel_diffusion_model_mnist.yaml",
        "pixel_diffusion_model_cifar10.yaml",
    ):
        cfg = load_config(os.path.join("configs", name))
        assert cfg.diffusion.n_steps == 400
        assert cfg.diffusion.cfg_scale == 3
        assert cfg.batch_size == 64 and cfg.lr == 0.0005
        assert cfg.model.params["channels"] == 64
        assert cfg.data.val_split == 0.1


@pytest.mark.skipif(not os.path.isdir(REF_CFG_DIR), reason="reference not mounted")
def test_reference_yamls_parse_verbatim():
    """The reference's own config files must load unchanged (SURVEY.md §5)."""
    for name in os.listdir(REF_CFG_DIR):
        cfg = load_config(os.path.join(REF_CFG_DIR, name))
        assert cfg.diffusion.n_steps == 400
        assert cfg.model.target == "src.UNet.UNet"
        # and the alias must resolve to our UNet
        assert resolve(cfg.model.target).__name__ == "UNet"


def test_reference_target_aliases_all_resolve():
    for ref_target in TARGET_ALIASES:
        assert resolve(ref_target) is not None


def test_nested_param_flattening():
    raw = yaml.safe_load(
        """
diffusion:
  type: pixel
  cfg_scale: 2
  params:
    n_steps: 123
    n_samples: 7
    device: cuda
batch_size: 32
"""
    )
    cfg = config_from_dict(raw)
    assert cfg.diffusion.n_steps == 123
    assert cfg.diffusion.n_samples == 7
    assert cfg.diffusion.cfg_scale == 2
    assert cfg.batch_size == 32


def test_debug_nans_flag_applies():
    import jax

    from ldm_tpu.config import Config
    from ldm_tpu.utils.seed import apply_runtime_flags

    apply_runtime_flags(Config(debug_nans=False))
    assert not jax.config.jax_debug_nans
    try:
        apply_runtime_flags(Config(debug_nans=True))
        assert jax.config.jax_debug_nans
    finally:
        jax.config.update("jax_debug_nans", False)
