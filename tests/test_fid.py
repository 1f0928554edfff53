"""Fréchet distance metric tests."""

import numpy as np

from ldm_tpu.ops.fid import fid_from_features, frechet_distance, pixel_fid


def test_identical_distributions_zero():
    rng = np.random.default_rng(0)
    f = rng.normal(size=(500, 16))
    assert fid_from_features(f, f.copy()) < 1e-8


def test_mean_shift_equals_squared_distance():
    rng = np.random.default_rng(1)
    f1 = rng.normal(size=(20000, 4))
    f2 = f1 + np.array([3.0, 0, 0, 0])
    # same covariance, mean shift 3 → FID ≈ 9
    assert abs(fid_from_features(f1, f2) - 9.0) < 0.1


def test_frechet_hand_computed_diagonal():
    # 1-D Gaussians: FID = (m1-m2)^2 + (s1-s2)^2 … with variances v:
    # d = dm^2 + v1 + v2 - 2 sqrt(v1 v2)
    mu1, mu2 = np.array([0.0]), np.array([2.0])
    c1, c2 = np.array([[4.0]]), np.array([[1.0]])
    d = frechet_distance(mu1, c1, mu2, c2)
    assert abs(d - (4.0 + 4.0 + 1.0 - 2 * 2.0)) < 1e-9


def test_pixel_fid_orders_quality():
    """Noisier fakes must score worse than near-identical fakes."""
    rng = np.random.default_rng(2)
    real = rng.integers(0, 255, (300, 8, 8, 1)).astype(np.uint8)
    close = np.clip(real.astype(int) + rng.integers(-5, 5, real.shape), 0, 255)
    far = rng.integers(0, 255, real.shape).astype(np.uint8) * 0 + 255
    assert pixel_fid(real, close.astype(np.uint8)) < pixel_fid(real, far)
