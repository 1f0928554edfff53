"""Consistency distillation: boundary math, sampler, end-to-end distill.

Reference has no counterpart (ancestral DDPM only, src/DDPM.py:98-130) —
this is a capability-plus surface; tests pin the math invariants from the
papers (CM arXiv:2303.01469, LCM arXiv:2310.04378) plus the trainer e2e.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ldm_tpu.diffusion.consistency import (
    boundary_scalings,
    boundary_timesteps,
    consistency_fn,
    sample_consistency,
)
from ldm_tpu.diffusion.ddpm import GaussianDiffusion
from ldm_tpu.training.consistency_trainer import sampling_timesteps


def test_boundary_scalings_exact_at_zero():
    c_skip, c_out = boundary_scalings(jnp.array([0, 1, 50], jnp.int32))
    c_skip, c_out = np.asarray(c_skip).ravel(), np.asarray(c_out).ravel()
    assert c_skip[0] == 1.0 and c_out[0] == 0.0  # exact boundary
    # strictly decreasing skip / increasing out away from 0
    assert c_skip[1] > c_skip[2] and c_out[1] < c_out[2]
    assert float(c_out[2]) == pytest.approx(1.0, abs=1e-5)  # f ~= x0 at big t


def test_consistency_fn_identity_at_t0():
    """f(x, 0) == x for ANY eps model — the defining boundary condition."""
    diff = GaussianDiffusion(n_steps=50)
    x = jax.random.normal(jax.random.key(0), (4, 8, 8, 3))

    def wild_eps(params, xx, t, y):  # arbitrary; must not matter at t=0
        return 3.0 * xx + 1.7

    out = consistency_fn(diff, wild_eps, None, x,
                         jnp.zeros((4,), jnp.int32), jnp.zeros((4,), jnp.int32))
    np.testing.assert_array_equal(np.asarray(out), np.asarray(x))


def test_consistency_fn_matches_manual():
    diff = GaussianDiffusion(n_steps=50)
    key = jax.random.key(1)
    x = jax.random.normal(key, (2, 4, 4, 1))
    t = jnp.array([3, 40], jnp.int32)
    eps_const = 0.25

    out = consistency_fn(diff, lambda p, xx, tt, y: jnp.full_like(xx, eps_const),
                         None, x, t, jnp.zeros((2,), jnp.int32))
    ab = np.asarray(diff.schedule.alpha_bars)[np.asarray(t)].reshape(-1, 1, 1, 1)
    x0 = (np.asarray(x) - np.sqrt(1 - ab) * eps_const) / np.sqrt(ab)
    st = (np.asarray(t, np.float32) * 10.0).reshape(-1, 1, 1, 1)
    c_skip = 0.25 / (st**2 + 0.25)
    c_out = st / np.sqrt(st**2 + 0.25)
    np.testing.assert_allclose(np.asarray(out), c_skip * np.asarray(x) + c_out * x0,
                               rtol=2e-5)


def test_boundary_timesteps():
    sub = boundary_timesteps(400, 20)
    assert sub[0] == 0 and sub[-1] == 399
    assert np.all(np.diff(sub) > 0)
    assert list(sub[:3]) == [0, 20, 40]
    with pytest.raises(ValueError):
        boundary_timesteps(400, 0)
    with pytest.raises(ValueError):
        boundary_timesteps(400, 400)


def test_sampling_timesteps():
    assert sampling_timesteps(400, 1) == (399,)
    ts = sampling_timesteps(400, 4)
    assert ts[0] == 399 and len(ts) == 4
    assert all(a > b for a, b in zip(ts, ts[1:]))  # strictly descending
    assert min(ts) >= 1
    with pytest.raises(ValueError):
        sampling_timesteps(400, 0)


def test_sample_consistency_deterministic_and_shaped():
    diff = GaussianDiffusion(n_steps=20)

    def toy_eps(params, x, t, y):  # class-coded pull toward y
        return x - y.astype(jnp.float32).reshape(-1, 1, 1, 1)

    classes = jnp.array([0, 1, 2], jnp.int32)
    kw = dict(ts=(19, 9, 4))
    a = sample_consistency(diff, toy_eps, None, jax.random.key(3), classes,
                           (4, 4, 1), **kw)
    b = sample_consistency(diff, toy_eps, None, jax.random.key(3), classes,
                           (4, 4, 1), **kw)
    c = sample_consistency(diff, toy_eps, None, jax.random.key(4), classes,
                           (4, 4, 1), **kw)
    assert a.shape == (3, 4, 4, 1)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert not np.array_equal(np.asarray(a), np.asarray(c))


def test_distill_e2e_tiny(tmp_path):
    """Tiny UNet teacher → consistency student: loss drops, checkpoints
    land, few-step samples are deterministic and in range."""
    import os

    from ldm_tpu.config import Config, DataConfig, DiffusionConfig, ModelConfig
    from ldm_tpu.data.datasets import synthetic_dataset
    from ldm_tpu.data.loader import DataLoader
    from ldm_tpu.factory import build_diffusion, build_model
    from ldm_tpu.training.consistency_trainer import ConsistencyDistillTrainer

    cfg = Config(
        project_name="cd", workdir=str(tmp_path), use_amp=False, seed=0,
        epochs=2, batch_size=16, lr=1e-3,
        model=ModelConfig(params=dict(
            in_channels=1, out_channels=1, channels=8,
            channel_multipliers=[1], num_classes=10,
        )),
        diffusion=DiffusionConfig(n_steps=20, cfg_scale=3),
        data=DataConfig(dataset="SYNTHETIC", image_size=8, image_channels=1),
    )
    model = build_model(cfg)
    diffusion = build_diffusion(cfg)
    ds = synthetic_dataset(64, 8, 1)
    loader = DataLoader(ds, 16)
    teacher = jax.jit(model.init)(
        jax.random.key(0), jnp.zeros((1, 8, 8, 1)),
        jnp.zeros((1,), jnp.int32), jnp.zeros((1,), jnp.int32),
    )

    tr = ConsistencyDistillTrainer(
        cfg, model, diffusion, teacher, loader, list(range(10)),
        skip_steps=5, ema_decay=0.9,
    )
    res = tr.train()
    assert np.isfinite(res["loss"])
    assert len(res["history"]) == 2
    assert os.path.exists(f"{cfg.checkpoints}/consistency_model.msgpack")
    assert os.path.exists(f"{cfg.checkpoints}/consistency_model_ema.msgpack")

    ids = jnp.array([0, 1, 2, 3], jnp.int32)
    a = tr.sample(jax.random.key(1), ids, n_sample_steps=2)
    b = tr.sample(jax.random.key(1), ids, n_sample_steps=2)
    assert a.shape == (4, 8, 8, 1)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert np.isfinite(np.asarray(a)).all()


def test_sample_consistency_slot_keys_permutation_invariant():
    """With per-slot keys, each sample's output depends only on its own
    (x_init, slot key, class) — permuting the batch permutes the outputs."""
    diff = GaussianDiffusion(n_steps=20)

    def toy_eps(params, x, t, y):
        return 0.3 * x + y.astype(jnp.float32).reshape(-1, 1, 1, 1) * 0.01

    classes = jnp.array([0, 1, 2], jnp.int32)
    x_init = jax.random.normal(jax.random.key(9), (3, 4, 4, 1))
    slot_keys = jax.vmap(jax.random.key)(jnp.array([11, 22, 33], jnp.uint32))
    kw = dict(ts=(19, 9, 4))
    a = sample_consistency(diff, toy_eps, None, jax.random.key(0), classes,
                           (4, 4, 1), x_init=x_init, slot_keys=slot_keys, **kw)
    perm = jnp.array([2, 0, 1])
    b = sample_consistency(diff, toy_eps, None, jax.random.key(0),
                           classes[perm], (4, 4, 1), x_init=x_init[perm],
                           slot_keys=slot_keys[perm], **kw)
    np.testing.assert_allclose(np.asarray(a)[np.asarray(perm)], np.asarray(b),
                               rtol=1e-6)
