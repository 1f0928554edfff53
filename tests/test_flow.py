"""Rectified-flow family: interpolation math, ODE solver exactness and order,
CFG fusion equivalence, the GaussianDiffusion duck-type surface, and a tiny
end-to-end training run through the unchanged DiffusionTrainer."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ldm_tpu.diffusion.flow import RectifiedFlow

SHAPE = (4, 4, 1)


@pytest.fixture(scope="module")
def flow():
    return RectifiedFlow(n_steps=100)


# ------------------------------------------------------------------ q / math
def test_q_sample_endpoints(flow):
    key = jax.random.key(0)
    x0 = jax.random.normal(key, (3,) + SHAPE)
    eps = jax.random.normal(jax.random.fold_in(key, 1), x0.shape)
    at0 = flow.q_sample(x0, jnp.zeros((3,)), eps)
    at1 = flow.q_sample(x0, jnp.ones((3,)), eps)
    np.testing.assert_allclose(np.asarray(at0), np.asarray(x0), atol=1e-6)
    np.testing.assert_allclose(np.asarray(at1), np.asarray(eps), atol=1e-6)
    # midpoint is the straight average
    mid = flow.q_sample(x0, jnp.full((3,), 0.5), eps)
    np.testing.assert_allclose(
        np.asarray(mid), np.asarray(0.5 * (x0 + eps)), atol=1e-6
    )


def test_noise_batch_contract(flow):
    """(target, x_t, t_embed): target is the velocity eps - x0, x_t lies on the
    straight path at t, and t_embed spans [0, n_steps-1] as floats."""
    key = jax.random.key(2)
    x0 = jax.random.normal(key, (256,) + SHAPE)
    v, xt, t_emb = flow.noise_batch(jax.random.fold_in(key, 1), x0)
    assert v.shape == x0.shape and xt.shape == x0.shape
    assert t_emb.shape == (256,) and t_emb.dtype == jnp.float32
    assert float(t_emb.min()) >= 0.0
    assert float(t_emb.max()) <= flow.n_steps - 1
    # reconstruct: eps = v + x0, so x_t must equal (1-t) x0 + t (v + x0)
    t = np.asarray(t_emb) / (flow.n_steps - 1)
    tb = t.reshape(-1, 1, 1, 1)
    expect = (1 - tb) * np.asarray(x0) + tb * (np.asarray(v) + np.asarray(x0))
    np.testing.assert_allclose(np.asarray(xt), expect, atol=1e-5)


# ------------------------------------------------------------------- solvers
def const_v_model(v_const):
    def apply(params, x, t, y):
        return jnp.broadcast_to(v_const, x.shape)

    return apply


def test_euler_exact_for_constant_velocity(flow):
    """dx/dt = v (constant) integrates exactly at ANY step count:
    x(0) = x(1) - v."""
    key = jax.random.key(3)
    x1 = jax.random.normal(key, (2,) + SHAPE)
    v = jnp.float32(0.7)
    classes = jnp.zeros((2,), jnp.int32)
    for steps in (1, 7, 50):
        x0 = flow.sample_ddim(
            const_v_model(v), {}, key, classes, SHAPE,
            n_sample_steps=steps, cfg_scale=0.0, x_init=x1,
        )
        np.testing.assert_allclose(
            np.asarray(x0), np.asarray(x1 - 0.7), atol=1e-5
        )


def linear_v_model(params, x, t, y):
    return -x  # dx/dt = -x  =>  x(0) = x(1) * e  (integrating 1 -> 0)


def test_heun_is_second_order(flow):
    """On dx/dt = -x the exact endpoint is x(1)*e; Heun at N steps must beat
    Euler at N steps by a large factor (2nd vs 1st order)."""
    key = jax.random.key(4)
    x1 = jax.random.normal(key, (2,) + SHAPE)
    classes = jnp.zeros((2,), jnp.int32)
    exact = np.asarray(x1) * np.e
    kw = dict(cfg_scale=0.0, x_init=x1)
    err = {}
    for name, fn, steps in [
        ("euler", flow.sample_ddim, 10),
        ("heun", flow.sample_dpmpp, 10),
    ]:
        out = fn(linear_v_model, {}, key, classes, SHAPE,
                 n_sample_steps=steps, **kw)
        err[name] = float(np.abs(np.asarray(out) - exact).max())
    assert err["heun"] < err["euler"] / 10
    # and Euler converges: 40 steps beats 10 steps
    out40 = flow.sample_ddim(linear_v_model, {}, key, classes, SHAPE,
                             n_sample_steps=40, **kw)
    assert float(np.abs(np.asarray(out40) - exact).max()) < err["euler"]


def test_dpmpp_order1_is_euler(flow):
    key = jax.random.key(5)
    x1 = jax.random.normal(key, (2,) + SHAPE)
    classes = jnp.zeros((2,), jnp.int32)
    a = flow.sample_dpmpp(linear_v_model, {}, key, classes, SHAPE,
                          n_sample_steps=9, cfg_scale=0.0, x_init=x1, order=1)
    b = flow.sample_ddim(linear_v_model, {}, key, classes, SHAPE,
                         n_sample_steps=9, cfg_scale=0.0, x_init=x1)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_eta_rejected(flow):
    with pytest.raises(ValueError, match="eta"):
        flow.sample_ddim(linear_v_model, {}, jax.random.key(0),
                         jnp.zeros((1,), jnp.int32), SHAPE, eta=0.5)


# ----------------------------------------------------------------------- CFG
def test_cfg_fused_equals_two_pass(flow):
    """The fused 2B-batch CFG velocity == uncond + s * (cond - uncond) from two
    separate passes (the ddpm.py CFG-equivalence test, ported to velocities)."""

    def model(params, x, t, y):
        # velocity depends on class, time and x so the check is non-trivial
        yb = y.astype(jnp.float32).reshape(-1, 1, 1, 1)
        tb = t.astype(jnp.float32).reshape(-1, 1, 1, 1)
        return jnp.sin(x) * (1.0 + 0.1 * yb) + 0.01 * tb

    key = jax.random.key(6)
    x = jax.random.normal(key, (3,) + SHAPE)
    t = jnp.full((3,), 41.0)
    classes = jnp.array([1, 2, 3], jnp.int32)
    null = 10
    s = 2.5
    use, y_in = flow._prep_cfg(classes, s, null)
    assert use
    fused = flow._cfg_v(model, {}, x, t, y_in, s, True)
    cond = model({}, x, t, classes)
    uncond = model({}, x, t, jnp.full((3,), null, jnp.int32))
    np.testing.assert_allclose(
        np.asarray(fused), np.asarray(uncond + s * (cond - uncond)), atol=1e-6
    )


def test_cfg_requires_null_label(flow):
    with pytest.raises(ValueError, match="null_label"):
        flow.sample_ddim(linear_v_model, {}, jax.random.key(0),
                         jnp.zeros((1,), jnp.int32), SHAPE, cfg_scale=3.0)


def test_sampling_deterministic(flow):
    key = jax.random.key(7)
    classes = jnp.zeros((2,), jnp.int32)
    a = flow.sample_ddim(linear_v_model, {}, key, classes, SHAPE,
                         n_sample_steps=5, cfg_scale=0.0)
    b = flow.sample_ddim(linear_v_model, {}, key, classes, SHAPE,
                         n_sample_steps=5, cfg_scale=0.0)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b))
    c = flow.sample_ddim(linear_v_model, {}, jax.random.key(8), classes,
                         SHAPE, n_sample_steps=5, cfg_scale=0.0)
    assert not np.allclose(np.asarray(a), np.asarray(c))


# ---------------------------------------------------- negative-control knob
def test_reverse_integration_moves_the_wrong_way(flow):
    """ode_direction=-1 (the flow family's negative control) integrates
    x ← x + dt·v on the same t: 1→0 grid: for constant v the exact wrong-way
    endpoint is x(1) + v, the mirror image of the correct x(1) − v."""
    key = jax.random.key(11)
    x1 = jax.random.normal(key, (2,) + SHAPE)
    classes = jnp.zeros((2,), jnp.int32)
    v = jnp.float32(0.7)
    for steps in (1, 7):
        bad = flow.sample_ddim(const_v_model(v), {}, key, classes, SHAPE,
                               n_sample_steps=steps, cfg_scale=0.0, x_init=x1,
                               ode_direction=-1.0)
        np.testing.assert_allclose(np.asarray(bad), np.asarray(x1 + 0.7),
                                   atol=1e-5)
    # Heun's wrong-way endpoint for constant v is the same mirror image
    bad_h = flow.sample_dpmpp(const_v_model(v), {}, key, classes, SHAPE,
                              n_sample_steps=4, cfg_scale=0.0, x_init=x1,
                              ode_direction=-1.0)
    np.testing.assert_allclose(np.asarray(bad_h), np.asarray(x1 + 0.7),
                               atol=1e-5)
    # direction=+1 is the default: explicit pass-through changes nothing
    good = flow.sample_ddim(const_v_model(v), {}, key, classes, SHAPE,
                            n_sample_steps=7, cfg_scale=0.0, x_init=x1,
                            ode_direction=1.0)
    np.testing.assert_allclose(np.asarray(good), np.asarray(x1 - 0.7),
                               atol=1e-5)


def test_orchestrator_gives_flow_its_own_break():
    """The family-specific negative-control dispatch
    (experiments/augmentation.py negative_control_break) must send the flow
    family the wrong-way integrator (ode_direction=-1) with the SAME
    sampler/steps/CFG as the real set — not the pixel break (cfg 0 + DDIM-5),
    which round 3 measured as inert for this family
    (runs/protocol_r3_flow.log: broken FID 0.256 < real 0.932)."""
    from ldm_tpu.experiments.augmentation import negative_control_break

    class FlowTrainer:
        diffusion = RectifiedFlow(n_steps=10)

    class PixelTrainer:
        diffusion = object()

    class LatentTrainer:
        ldm = object()
        diffusion = RectifiedFlow(n_steps=10)  # latent must win over flow

    brk = negative_control_break(FlowTrainer(), 3.0, "ddim", 25)
    assert brk == dict(cfg_scale=3.0, sampler="ddim", ddim_steps=25,
                       ode_direction=-1.0)
    assert negative_control_break(PixelTrainer(), 3.0, "ddpm", 50) == dict(
        cfg_scale=0.0, sampler="ddim", ddim_steps=5)
    assert negative_control_break(LatentTrainer(), 3.0, "ddpm", 50) == dict(
        cfg_scale=3.0, sampler="ddpm", ddim_steps=50,
        decode_scale_override=0.18215)


def test_generate_synthetic_passes_ode_direction():
    """generate_synthetic_dataset forwards the break knob to trainer.sample."""
    from ldm_tpu.experiments import augmentation as aug

    calls = []

    class FakeTrainer:
        output_image_shape = (8, 8, 1)

        class state:
            key = jax.random.key(0)

        def sample(self, y, **kw):
            calls.append(kw)
            return np.zeros((len(y), 8, 8, 1), np.uint8)

    ds = aug.generate_synthetic_dataset(
        FakeTrainer(), num_classes=2, n_per_class=2, batch_size=4,
        cfg_scale=3.0, sampler="ddim", ddim_steps=6, ode_direction=-1.0,
    )
    assert len(ds) == 4
    assert calls and all(kw["ode_direction"] == -1.0 for kw in calls)
    assert all(kw["method"] == "ddim" and kw["ddim_steps"] == 6
               and kw["cfg_scale"] == 3.0 for kw in calls)


# ------------------------------------------------------- trainer integration
@pytest.mark.slow
def test_flow_trains_through_diffusion_trainer(tmp_path):
    """A flow config drives the UNCHANGED DiffusionTrainer (the duck-typed
    noise_batch/sampler surface): loss decreases, sampling works, and the
    config system instantiates the family from its target string."""
    from ldm_tpu.config import (
        Config, DataConfig, DiffusionConfig, ModelConfig,
    )
    from ldm_tpu.data.datasets import synthetic_dataset
    from ldm_tpu.data.loader import DataLoader
    from ldm_tpu.factory import build_diffusion, build_model
    from ldm_tpu.training.diffusion_trainer import DiffusionTrainer

    cfg = Config(
        project_name="flow_t", workdir=str(tmp_path), epochs=2, batch_size=16,
        use_amp=False, seed=0,
        model=ModelConfig(params=dict(
            in_channels=1, out_channels=1, channels=8,
            channel_multipliers=[1, 2], num_classes=10,
        )),
        diffusion=DiffusionConfig(
            target="ldm_tpu.diffusion.flow.RectifiedFlow",
            n_steps=100, cfg_scale=3,
        ),
        data=DataConfig(dataset="SYNTHETIC", image_size=16, image_channels=1),
    )
    diffusion = build_diffusion(cfg)
    assert isinstance(diffusion, RectifiedFlow)
    ds = synthetic_dataset(96, 16, 1, seed=0)
    tl = DataLoader(ds.subset(np.arange(64)), cfg.batch_size, seed=0)
    vl = DataLoader(ds.subset(np.arange(64, 96)), cfg.batch_size, seed=1)
    tr = DiffusionTrainer(cfg, build_model(cfg), diffusion, tl, vl,
                          classes=list(range(10)))
    hist = tr.train()
    assert all(np.isfinite(hist["train_loss"]))
    assert hist["train_loss"][1] < hist["train_loss"][0]
    # few-step Euler sampling through the trainer's method="ddim" slot
    imgs = tr.sample([0, 1], cfg_scale=3.0, method="ddim", ddim_steps=4)
    assert imgs.shape == (2, 16, 16, 1) and imgs.dtype == np.uint8
    # Heun through the method="dpmpp" slot
    imgs2 = tr.sample([0, 1], cfg_scale=3.0, method="dpmpp", ddim_steps=2)
    assert imgs2.shape == (2, 16, 16, 1)
