"""Schedule math unit tests (SURVEY.md §4: alpha_bar monotonicity, hand values)."""

import numpy as np

from ldm_tpu.diffusion.schedule import DiffusionSchedule


def test_linear_schedule_endpoints():
    s = DiffusionSchedule.linear(400)
    b = np.asarray(s.betas)
    assert b.shape == (400,)
    # reference: torch.linspace(0.0001, 0.02, n_steps) (src/DDPM.py:31)
    assert np.isclose(b[0], 1e-4) and np.isclose(b[-1], 0.02)
    assert np.all(np.diff(b) > 0)


def test_alpha_bar_monotone_decreasing():
    s = DiffusionSchedule.linear(400)
    ab = np.asarray(s.alpha_bars)
    assert np.all(np.diff(ab) < 0)
    assert 0 < ab[-1] < ab[0] < 1


def test_alpha_bar_hand_computed():
    s = DiffusionSchedule.linear(3, 0.1, 0.3)
    # betas = [0.1, 0.2, 0.3]; alphas = [0.9, 0.8, 0.7]
    np.testing.assert_allclose(
        np.asarray(s.alpha_bars), [0.9, 0.72, 0.504], rtol=1e-6
    )
    np.testing.assert_allclose(np.asarray(s.sigma2), [0.1, 0.2, 0.3], rtol=1e-6)


def test_sqrt_linear_matches_reference_formula():
    # reference: linspace(start**0.5, end**0.5, T)**2 in float64
    # (src/LatentDiffusionModel.py:41-47)
    T, s0, s1 = 100, 8.5e-4, 1.2e-2
    s = DiffusionSchedule.sqrt_linear(T, s0, s1)
    expected = np.linspace(s0**0.5, s1**0.5, T, dtype=np.float64) ** 2
    np.testing.assert_allclose(np.asarray(s.betas), expected.astype(np.float32))


def test_make_dispatch():
    assert DiffusionSchedule.make("linear", 10, 1e-4, 2e-2).n_steps == 10
    assert DiffusionSchedule.make("sqrt_linear", 10, 1e-4, 2e-2).n_steps == 10
