"""DDPM process tests: q_sample statistics, p_sample edge cases, the scan sampler,
and CFG equivalence (batched fused pass == two separate passes)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ldm_tpu.diffusion.ddpm import GaussianDiffusion, gather


@pytest.fixture(scope="module")
def diff():
    return GaussianDiffusion(n_steps=10)


def test_gather_shape(diff):
    t = jnp.array([0, 3, 9])
    g = gather(diff.schedule.alpha_bars, t)
    assert g.shape == (3, 1, 1, 1)
    np.testing.assert_allclose(
        g[:, 0, 0, 0], np.asarray(diff.schedule.alpha_bars)[[0, 3, 9]]
    )


def test_q_sample_statistics():
    """x_t = sqrt(ab)*x0 + sqrt(1-ab)*eps: for constant x0 and many eps draws the
    sample mean/var must match the closed form (src/DDPM.py:46-68)."""
    diff = GaussianDiffusion(n_steps=50)
    key = jax.random.key(0)
    b = 4096
    x0 = jnp.ones((b, 2, 2, 1)) * 0.5
    t = jnp.full((b,), 20, jnp.int32)
    eps = jax.random.normal(key, x0.shape)
    xt = diff.q_sample(x0, t, eps)
    ab = float(diff.schedule.alpha_bars[20])
    assert np.isclose(float(xt.mean()), 0.5 * ab**0.5, atol=0.02)
    assert np.isclose(float(xt.std()), (1 - ab) ** 0.5, atol=0.02)


def test_p_sample_t0_is_deterministic_mean(diff):
    """At t=0 no fresh noise is added (reference src/DDPM.py:85-96)."""
    key = jax.random.key(1)
    xt = jax.random.normal(key, (2, 4, 4, 1))
    epshat = jax.random.normal(jax.random.fold_in(key, 1), xt.shape)
    noise = jax.random.normal(jax.random.fold_in(key, 2), xt.shape)
    t0 = jnp.zeros((2,), jnp.int32)
    out_a = diff.p_sample(xt, t0, epshat, noise)
    out_b = diff.p_sample(xt, t0, epshat, noise * 100.0)
    np.testing.assert_allclose(np.asarray(out_a), np.asarray(out_b))
    # and t>0 DOES add noise
    t1 = jnp.ones((2,), jnp.int32)
    out_c = diff.p_sample(xt, t1, epshat, noise)
    out_d = diff.p_sample(xt, t1, epshat, noise * 100.0)
    assert not np.allclose(np.asarray(out_c), np.asarray(out_d))


def test_p_sample_hand_computed(diff):
    """mean = (xt - (1-a)/sqrt(1-ab) * eps) / sqrt(a) (src/DDPM.py:71-96)."""
    s = diff.schedule
    xt = jnp.full((1, 1, 1, 1), 2.0)
    eps = jnp.full((1, 1, 1, 1), 0.5)
    z = jnp.full((1, 1, 1, 1), 1.0)
    t = jnp.array([5])
    a, ab, s2 = float(s.alphas[5]), float(s.alpha_bars[5]), float(s.sigma2[5])
    expected = (2.0 - (1 - a) / np.sqrt(1 - ab) * 0.5) / np.sqrt(a) + np.sqrt(s2)
    got = float(diff.p_sample(xt, t, eps, z)[0, 0, 0, 0])
    assert np.isclose(got, expected, rtol=1e-5)


def test_noise_batch_ranges(diff):
    key = jax.random.key(2)
    x0 = jnp.zeros((64, 4, 4, 1))
    eps, xt, t = diff.noise_batch(key, x0)
    assert t.shape == (64,) and t.dtype == jnp.int32
    assert int(t.min()) >= 0 and int(t.max()) < diff.n_steps
    assert eps.shape == xt.shape == x0.shape


def _toy_eps_model(params, x, t, y):
    """Deterministic stand-in for the UNet: eps = scale * x + f(t, y)."""
    tt = t.astype(jnp.float32).reshape(-1, 1, 1, 1) / 10.0
    yy = y.astype(jnp.float32).reshape(-1, 1, 1, 1) / 10.0
    return params["scale"] * x + 0.01 * tt - 0.01 * yy


def test_sample_shape_and_determinism(diff):
    params = {"scale": jnp.float32(0.1)}
    classes = jnp.array([0, 1, 2, 3])
    key = jax.random.key(3)
    f = jax.jit(
        lambda p, k: diff.sample(
            _toy_eps_model, p, k, classes, (4, 4, 1), cfg_scale=3.0, null_label=10
        )
    )
    a = f(params, key)
    b = f(params, key)
    assert a.shape == (4, 4, 4, 1)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    c = f(params, jax.random.key(4))
    assert not np.allclose(np.asarray(a), np.asarray(c))


def test_cfg_fused_equals_two_pass(diff):
    """The fused 2B-batch CFG forward must equal the reference's two separate
    calls + torch.lerp (src/DDPM.py:119-124)."""
    params = {"scale": jnp.float32(0.3)}
    classes = jnp.array([1, 2])
    key = jax.random.key(5)
    fused = diff.sample(
        _toy_eps_model, params, key, classes, (2, 2, 1), cfg_scale=3.0, null_label=10
    )

    def two_pass_model(p, x, t, y):
        # emulate: cond and uncond called separately then lerped
        return _toy_eps_model(p, x, t, y)

    # manual loop replicating the reference algorithm exactly
    k_init, k_loop = jax.random.split(key)
    xt = jax.random.normal(k_init, (2, 2, 2, 1), jnp.float32)
    for t_ in range(diff.n_steps - 1, -1, -1):
        tv = jnp.full((2,), t_, jnp.int32)
        cond = two_pass_model(params, xt, tv, classes)
        uncond = two_pass_model(params, xt, tv, jnp.full((2,), 10))
        eps = uncond + 3.0 * (cond - uncond)
        noise = jax.random.normal(jax.random.fold_in(k_loop, t_), xt.shape, xt.dtype)
        xt = diff.p_sample(xt, tv, eps, noise)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(xt), rtol=2e-4, atol=2e-5)


def test_sample_no_cfg_requires_no_null(diff):
    params = {"scale": jnp.float32(0.1)}
    out = diff.sample(
        _toy_eps_model, params, jax.random.key(0), jnp.array([0, 1]), (2, 2, 1),
        cfg_scale=0.0,
    )
    assert out.shape == (2, 2, 2, 1)


def test_sample_cfg_requires_null_label(diff):
    with pytest.raises(ValueError):
        diff.sample(
            _toy_eps_model, {"scale": jnp.float32(0.1)}, jax.random.key(0),
            jnp.array([0]), (2, 2, 1), cfg_scale=3.0,
        )
