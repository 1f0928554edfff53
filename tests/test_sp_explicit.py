"""Explicit-SP (shard_map spatial partitioning) tests — SP that can train.

Contract (parallel/sp_explicit.py): the hand-partitioned UNet (halo-exchange
convs, psum GroupNorm stats, gathered attention) reproduces single-device
FORWARD numerics, and — the reason it exists — single-device GRADIENTS, which
the annotation path provably cannot on this jaxlib (perf/probe28, the canary
in test_sp.py).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ldm_tpu.models.unet import UNet
from ldm_tpu.parallel.mesh import create_mesh
from ldm_tpu.parallel.sp_explicit import (
    make_unet_sp_apply, supports_spatial_training,
)


def _sp_mesh():
    return create_mesh(model=2)  # 8 devices -> (data=4, model=2)


def _setup(b=8, hw=8, channels=8, multipliers=(1, 2)):
    model = UNet(in_channels=1, out_channels=1, channels=channels,
                 channel_multipliers=list(multipliers), num_classes=10)
    x = jax.random.normal(jax.random.key(1), (b, hw, hw, 1), jnp.float32)
    t = jax.random.randint(jax.random.key(2), (b,), 0, 100)
    y = (jnp.arange(b, dtype=jnp.int32) * 3) % 11  # includes null labels
    params = jax.jit(model.init)(jax.random.key(0), x[:1], t[:1], y[:1])
    return model, params, x, t, y


def test_supports_spatial_training_guard():
    mesh = _sp_mesh()
    assert supports_spatial_training(mesh, 8, 2)       # 8 % (2*4) == 0
    assert not supports_spatial_training(mesh, 12, 2)  # 12 % 8 != 0
    assert not supports_spatial_training(None, 8, 2)
    assert not supports_spatial_training(create_mesh(), 8, 2)  # model=1


@pytest.mark.slow
def test_explicit_sp_forward_matches_single_device():
    mesh = _sp_mesh()
    model, params, x, t, y = _setup()
    ref = jax.jit(model.apply)(params, x, t, y)
    sp_apply = make_unet_sp_apply(mesh, model)
    out = jax.jit(sp_apply)(params, x, t, y)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(out),
                               rtol=1e-4, atol=2e-6)


@pytest.mark.slow
def test_explicit_sp_grads_match_single_device():
    """The headline: hand-placed collectives have exact AD transposes, so
    grads match where the GSPMD annotation path diverges by up to the
    data-axis factor (perf/probe28)."""
    mesh = _sp_mesh()
    model, params, x, t, y = _setup()
    target = jax.random.normal(jax.random.key(7), x.shape, jnp.float32)
    sp_apply = make_unet_sp_apply(mesh, model)

    def loss(apply_fn):
        def f(p):
            return jnp.mean((apply_fn(p, x, t, y) - target) ** 2)
        return f

    g_ref = jax.jit(jax.grad(loss(model.apply)))(params)
    g_sp = jax.jit(jax.grad(loss(sp_apply)))(params)
    flat_ref, _ = jax.tree.flatten_with_path(g_ref)
    flat_sp = jax.tree.leaves(g_sp)
    assert len(flat_ref) == len(flat_sp)
    for (path, a), b in zip(flat_ref, flat_sp):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-6,
            err_msg=f"explicit-SP grad mismatch at {path}")


@pytest.mark.slow
def test_sp_training_matches_single_device(tmp_path):
    """activation_sharding='spatial' now TRAINS (explicit path): loss history
    and final params match the single-device run."""
    from tests.test_fsdp import _run_trainer

    h1, t1 = _run_trainer(None, str(tmp_path / "single"))
    h2, t2 = _run_trainer(_sp_mesh(), str(tmp_path / "sp"),
                          activation_sharding="spatial")
    np.testing.assert_allclose(h1["train_loss"], h2["train_loss"], rtol=1e-5)
    np.testing.assert_allclose(h1["val_loss"], h2["val_loss"], rtol=1e-5)
    for a, b in zip(jax.tree.leaves(t1.state.params),
                    jax.tree.leaves(t2.state.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-3)


def test_sp_training_refuses_indivisible_heights(tmp_path):
    """A geometry the row split can't partition evenly must fail fast."""
    from tests.test_fsdp import _run_trainer

    with pytest.raises(ValueError, match="spatial"):
        _run_trainer(_sp_mesh(), str(tmp_path / "bad"),
                     activation_sharding="spatial", image_size=10)
