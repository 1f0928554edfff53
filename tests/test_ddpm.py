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


# ------------------------------------------------------------------------ DDIM
def test_ddim_step_hand_computed(diff):
    """x_prev = sqrt(ab_prev)*x0_pred + sqrt(1-ab_prev-sigma^2)*eps + sigma*z
    with x0_pred = (xt - sqrt(1-ab_t)*eps)/sqrt(ab_t) (Song et al. 2021 eq.12)."""
    s = diff.schedule
    key = jax.random.key(7)
    xt = jax.random.normal(key, (3, 2, 2, 1))
    eps = jax.random.normal(jax.random.fold_in(key, 1), xt.shape)
    z = jax.random.normal(jax.random.fold_in(key, 2), xt.shape)
    t = jnp.array([9, 5, 2])
    t_prev = jnp.array([5, 2, 0])
    eta = 0.7
    got = np.asarray(diff.ddim_step(xt, t, t_prev, eps, z, eta=eta))
    ab = np.asarray(s.alpha_bars)
    for i, (ti, tp) in enumerate([(9, 5), (5, 2), (2, 0)]):
        ab_t, ab_p = ab[ti], ab[tp]
        x0 = (np.asarray(xt)[i] - np.sqrt(1 - ab_t) * np.asarray(eps)[i]) / np.sqrt(ab_t)
        sig = eta * np.sqrt((1 - ab_p) / (1 - ab_t) * (1 - ab_t / ab_p))
        want = (np.sqrt(ab_p) * x0 + np.sqrt(1 - ab_p - sig**2) * np.asarray(eps)[i]
                + sig * np.asarray(z)[i])
        np.testing.assert_allclose(got[i], want, rtol=1e-5, atol=1e-5)


def test_ddim_step_to_x0_ignores_noise(diff):
    """t_prev = -1 means 'to x_0': alpha_bar_prev == 1, noise scale vanishes."""
    key = jax.random.key(8)
    xt = jax.random.normal(key, (2, 2, 2, 1))
    eps = jax.random.normal(jax.random.fold_in(key, 1), xt.shape)
    z = jax.random.normal(jax.random.fold_in(key, 2), xt.shape)
    t = jnp.array([3, 3])
    tp = jnp.array([-1, -1])
    a = diff.ddim_step(xt, t, tp, eps, z, eta=1.0)
    b = diff.ddim_step(xt, t, tp, eps, z * 100, eta=1.0)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b))
    # and the result is exactly the x0 prediction
    ab_t = gather(diff.schedule.alpha_bars, t)
    x0 = (xt - jnp.sqrt(1 - ab_t) * eps) / jnp.sqrt(ab_t)
    np.testing.assert_allclose(np.asarray(a), np.asarray(x0), rtol=1e-5, atol=1e-6)


def test_ddim_zero_eps_telescopes(diff):
    """With a zero eps-model and eta=0 the full-subsequence DDIM recursion
    telescopes in closed form: x_0 = x_T / sqrt(alpha_bar_{T-1})."""
    zero_model = lambda p, x, t, y: jnp.zeros_like(x)  # noqa: E731
    classes = jnp.array([0, 1])
    x_init = jax.random.normal(jax.random.key(9), (2, 2, 2, 1), jnp.float32)
    out = diff.sample_ddim(zero_model, {}, jax.random.key(0), classes, (2, 2, 1),
                           n_sample_steps=diff.n_steps, eta=0.0, cfg_scale=0.0,
                           x_init=x_init)
    want = np.asarray(x_init) / np.sqrt(float(diff.schedule.alpha_bars[-1]))
    np.testing.assert_allclose(np.asarray(out), want, rtol=1e-4, atol=1e-5)


def test_ddim_eta0_is_deterministic_in_loop_noise(diff):
    """eta=0: the loop PRNG key must not affect the result (only x_init does)."""
    params = {"scale": jnp.float32(0.1)}
    classes = jnp.array([0, 1, 2, 3])
    x_init = jax.random.normal(jax.random.key(10), (4, 4, 4, 1), jnp.float32)
    f = jax.jit(lambda k: diff.sample_ddim(
        _toy_eps_model, params, k, classes, (4, 4, 1), n_sample_steps=5,
        eta=0.0, cfg_scale=3.0, null_label=10, x_init=x_init))
    a, b = f(jax.random.key(1)), f(jax.random.key(2))
    assert a.shape == (4, 4, 4, 1)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # eta=1 with different keys differs
    g = jax.jit(lambda k: diff.sample_ddim(
        _toy_eps_model, params, k, classes, (4, 4, 1), n_sample_steps=5,
        eta=1.0, cfg_scale=3.0, null_label=10, x_init=x_init))
    assert not np.allclose(np.asarray(g(jax.random.key(1))),
                           np.asarray(g(jax.random.key(2))))


def test_ddim_subsequence_shorter_is_cheaper_but_valid(diff):
    """5-step and 10-step DDIM both produce finite outputs of the right shape
    from the same model; fewer steps is the point of the sampler."""
    params = {"scale": jnp.float32(0.1)}
    classes = jnp.array([0, 1])
    for steps in (2, 5, diff.n_steps):
        out = diff.sample_ddim(_toy_eps_model, params, jax.random.key(3),
                               classes, (2, 2, 1), n_sample_steps=steps,
                               cfg_scale=3.0, null_label=10)
        assert out.shape == (2, 2, 2, 1)
        assert np.isfinite(np.asarray(out)).all()


# ----------------------------------------------------------- DPM-Solver++(2M)
def test_dpmpp_coeffs_finite_and_edges(diff):
    """All precomputed coefficients are finite; the first step and the final
    analytic to-x0 projection are first-order (c2=0); the final step has
    c_x=0, c_d=1 (x -> x0_pred exactly)."""
    sub, c_x, c_d, c2 = diff._dpmpp_coeffs(5)
    for arr in (c_x, c_d, c2):
        assert np.isfinite(arr).all()
    assert sub[0] == diff.n_steps - 1 and sub[-1] == 0
    assert c2[0] == 0.0 and c2[-1] == 0.0
    assert (c2[1:-1] > 0).all()
    assert c_x[-1] == 0.0 and np.isclose(c_d[-1], 1.0)
    # interior: c_x = sigma_t/sigma_s, c_d = -alpha_t*expm1(-h), h from lambda
    ab = np.asarray(diff.schedule.alpha_bars, np.float64)
    s_, t_ = sub[0], sub[1]
    lam = lambda i: 0.5 * (np.log(ab[i]) - np.log1p(-ab[i]))  # noqa: E731
    h = lam(t_) - lam(s_)
    np.testing.assert_allclose(c_x[0], np.sqrt((1 - ab[t_]) / (1 - ab[s_])), rtol=1e-12)
    np.testing.assert_allclose(c_d[0], -np.sqrt(ab[t_]) * np.expm1(-h), rtol=1e-10)


def test_dpmpp_constant_x0_model_is_exact_any_steps():
    """A model whose x0-prediction is a constant c (eps chosen accordingly)
    makes the probability-flow ODE solvable in closed form, and the
    exponential-integrator update is EXACT for it — at any step count the
    sampler must return exactly c."""
    diff = GaussianDiffusion(n_steps=50)
    ab = diff.schedule.alpha_bars
    c = 0.37

    def model(params, x, t, y):
        ab_t = gather(ab, t)
        return (x - jnp.sqrt(ab_t) * c) * jax.lax.rsqrt(1.0 - ab_t)

    x_init = jax.random.normal(jax.random.key(11), (2, 3, 3, 1), jnp.float32)
    for steps in (1, 2, 4, 13):
        out = diff.sample_dpmpp(model, {}, jax.random.key(0), jnp.array([0, 1]),
                                (3, 3, 1), n_sample_steps=steps, cfg_scale=0.0,
                                x_init=x_init)
        np.testing.assert_allclose(np.asarray(out), c, rtol=0, atol=5e-5)


def test_dpmpp_zero_eps_telescopes(diff):
    """eps == 0 keeps x/alpha invariant along the exact ODE flow; the 2M
    update preserves that invariant exactly: x_0 = x_T / sqrt(alpha_bar_{T-1})
    (the same closed form as the DDIM telescoping test)."""
    zero_model = lambda p, x, t, y: jnp.zeros_like(x)  # noqa: E731
    x_init = jax.random.normal(jax.random.key(12), (2, 2, 2, 1), jnp.float32)
    for steps in (3, diff.n_steps):
        out = diff.sample_dpmpp(zero_model, {}, jax.random.key(0),
                                jnp.array([0, 1]), (2, 2, 1),
                                n_sample_steps=steps, cfg_scale=0.0,
                                x_init=x_init)
        want = np.asarray(x_init) / np.sqrt(float(diff.schedule.alpha_bars[-1]))
        np.testing.assert_allclose(np.asarray(out), want, rtol=1e-4, atol=1e-5)


def test_dpmpp_second_order_beats_ddim_at_few_steps():
    """On a smooth nonlinear model both samplers solve the same ODE; at a
    small step budget the 2M multistep must land closer to the fine-grid
    solution than first-order DDIM."""
    diff = GaussianDiffusion(n_steps=100)
    params = {"scale": jnp.float32(0.3)}
    classes = jnp.array([0, 1])
    x_init = jax.random.normal(jax.random.key(13), (2, 2, 2, 1), jnp.float32)
    kw = dict(cfg_scale=3.0, null_label=10, x_init=x_init)
    truth = diff.sample_ddim(_toy_eps_model, params, jax.random.key(0), classes,
                             (2, 2, 1), n_sample_steps=100, eta=0.0, **kw)
    few_ddim = diff.sample_ddim(_toy_eps_model, params, jax.random.key(0),
                                classes, (2, 2, 1), n_sample_steps=8, eta=0.0,
                                **kw)
    few_dpmpp = diff.sample_dpmpp(_toy_eps_model, params, jax.random.key(0),
                                  classes, (2, 2, 1), n_sample_steps=8, **kw)
    err_ddim = float(jnp.abs(few_ddim - truth).max())
    err_dpmpp = float(jnp.abs(few_dpmpp - truth).max())
    assert err_dpmpp < err_ddim, (err_dpmpp, err_ddim)
    # isolate the 2M term: order=1 on the SAME uniform-lambda grid is worse
    few_o1 = diff.sample_dpmpp(_toy_eps_model, params, jax.random.key(0),
                               classes, (2, 2, 1), n_sample_steps=8, order=1,
                               **kw)
    err_o1 = float(jnp.abs(few_o1 - truth).max())
    assert err_dpmpp < err_o1, (err_dpmpp, err_o1)
    # and the fine-grid dpmpp agrees with the fine-grid ddim (same ODE)
    fine = diff.sample_dpmpp(_toy_eps_model, params, jax.random.key(0), classes,
                             (2, 2, 1), n_sample_steps=100, **kw)
    np.testing.assert_allclose(np.asarray(fine), np.asarray(truth),
                               rtol=5e-3, atol=5e-4)


def test_dpmpp_deterministic_and_cfg_validation(diff):
    """Deterministic given x_init (the key only seeds x_T); CFG without a
    null label raises like the other samplers."""
    params = {"scale": jnp.float32(0.1)}
    classes = jnp.array([0, 1, 2, 3])
    x_init = jax.random.normal(jax.random.key(14), (4, 4, 4, 1), jnp.float32)
    f = jax.jit(lambda k: diff.sample_dpmpp(
        _toy_eps_model, params, k, classes, (4, 4, 1), n_sample_steps=6,
        cfg_scale=3.0, null_label=10, x_init=x_init))
    a, b = f(jax.random.key(1)), f(jax.random.key(2))
    assert a.shape == (4, 4, 4, 1)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    with pytest.raises(ValueError):
        diff.sample_dpmpp(_toy_eps_model, params, jax.random.key(0),
                          jnp.array([0]), (2, 2, 1), cfg_scale=3.0)
