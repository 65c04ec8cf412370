"""metrics.py scoring functions, incl. the offline LPIPS substitute."""

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
from metrics import RandomVGGLPIPS, psnr_metric, ssim_metric  # noqa: E402


def test_psnr_ssim_basics():
    rng = np.random.default_rng(0)
    img = rng.uniform(0, 1, (32, 32, 3)).astype(np.float32)
    assert psnr_metric(img, img) == 100.0
    assert abs(ssim_metric(img, img) - 1.0) < 1e-6
    noisy = np.clip(img + rng.normal(0, 0.1, img.shape), 0, 1).astype(
        np.float32)
    assert psnr_metric(noisy, img) < 30.0
    assert ssim_metric(noisy, img) < 1.0


def test_lpips_substitute_orders_distortions():
    rng = np.random.default_rng(1)
    lpips = RandomVGGLPIPS()
    img = rng.uniform(0, 1, (64, 64, 3)).astype(np.float32)
    assert lpips(img, img) < 1e-6
    small = np.clip(img + rng.normal(0, 0.02, img.shape), 0, 1).astype(
        np.float32)
    big = np.clip(img + rng.normal(0, 0.2, img.shape), 0, 1).astype(
        np.float32)
    d_small = lpips(small, img)
    d_big = lpips(big, img)
    assert 0.0 < d_small < d_big


def test_lpips_deterministic_weights():
    a = RandomVGGLPIPS().weights[0][0]
    b = RandomVGGLPIPS().weights[0][0]
    np.testing.assert_array_equal(a, b)


def test_msssim_basics():
    from metrics import msssim_metric

    rng = np.random.default_rng(0)
    img = rng.uniform(0, 1, (96, 96, 3)).astype(np.float32)
    assert msssim_metric(img, img) > 0.999
    noisy = np.clip(img + rng.normal(0, 0.2, img.shape), 0, 1).astype(np.float32)
    v = msssim_metric(img, noisy)
    assert 0.0 < v < 0.99
    # less noise -> higher score (monotone ordering)
    mild = np.clip(img + rng.normal(0, 0.05, img.shape), 0, 1).astype(np.float32)
    assert msssim_metric(img, mild) > v
