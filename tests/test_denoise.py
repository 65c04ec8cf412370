"""Specular-demodulated denoiser (renderer/denoise.py).

The OptiX-HDR-denoiser analog (reference optix/denoiser_wrapper.h:22-104)
reworked in round 4: only the GGX specular residual is filtered, guided by
the noise-free primary G-buffer, with strength scaled by roughness.  These
tests use a synthetic G-buffer with known clean/noisy decomposition so the
properties are assertable without a slow interpret-mode render;
tools/denoiser_eval.py measures the real PSNR grid on hardware."""

import numpy as np

from editable_gaussian_reflections_tpu.renderer.denoise import (
    atrous_denoise,
    denoise_specular,
)


def _scene(H=64, W=64, seed=0, rough_val=0.6):
    """Piecewise-flat two-plane scene: left/right halves differ in normal,
    depth, and specular level; diffuse carries fine texture."""
    rng = np.random.default_rng(seed)
    xx = np.arange(W)[None, :].repeat(H, 0)
    left = (xx < W // 2).astype(np.float32)

    diffuse = 0.3 + 0.2 * rng.uniform(size=(H, W, 3)).astype(np.float32)
    spec_clean = (0.4 * left + 0.1 * (1 - left))[..., None].repeat(
        3, -1).astype(np.float32)
    normal = np.zeros((H, W, 3), np.float32)
    normal[..., 2] = left
    normal[..., 0] = 1 - left
    depth = (2.0 * left + 5.0 * (1 - left)).astype(np.float32)
    rough = np.full((H, W), rough_val, np.float32)
    noise = rng.normal(0, 0.15, size=(H, W, 3)).astype(np.float32)
    return diffuse, spec_clean, normal, depth, rough, noise


def test_denoise_reduces_specular_noise_preserves_diffuse():
    diffuse, spec, normal, depth, rough, noise = _scene()
    noisy = diffuse + np.maximum(spec + noise, 0.0)
    clean = diffuse + spec
    out = denoise_specular(noisy, diffuse, normal, depth, rough, spp=1)
    mse_in = float(np.mean((noisy - clean) ** 2))
    mse_out = float(np.mean((out - clean) ** 2))
    assert mse_out < 0.35 * mse_in, (mse_in, mse_out)
    # diffuse texture is untouched by construction: final - filtered spec
    # must still contain the exact diffuse component
    assert np.allclose(out - (out - diffuse), diffuse)


def test_denoise_respects_guide_edges():
    """The left/right specular step sits on a normal+depth edge: filtering
    must not bleed across it (edge pixels keep distinct levels)."""
    diffuse, spec, normal, depth, rough, noise = _scene(seed=1)
    noisy = diffuse + np.maximum(spec + noise, 0.0)
    out = denoise_specular(noisy, diffuse, normal, depth, rough, spp=1)
    spec_out = out - diffuse
    H, W = depth.shape
    left_mean = spec_out[:, : W // 2 - 4].mean()
    right_mean = spec_out[:, W // 2 + 4:].mean()
    assert left_mean - right_mean > 0.2, (left_mean, right_mean)


def test_denoise_mirror_surfaces_stay_sharp():
    """Mirror-like pixels (roughness ~ 0) carry near-deterministic GGX
    reflections: the roughness-scaled blend must leave them alone."""
    diffuse, spec, normal, depth, _, noise = _scene(seed=2)
    rough0 = np.full(depth.shape, 0.01, np.float32)
    detail = spec.copy()
    detail[16:48, 16:48] += 0.3  # sharp reflected feature, NOT noise
    img = diffuse + detail
    out = denoise_specular(img, diffuse, normal, depth, rough0, spp=1)
    np.testing.assert_allclose(out, img, atol=5e-3)


def test_denoise_backs_off_at_high_spp():
    diffuse, spec, normal, depth, rough, noise = _scene(seed=3)
    img = diffuse + np.maximum(spec + 0.05 * noise, 0.0)
    out = denoise_specular(img, diffuse, normal, depth, rough, spp=128)
    np.testing.assert_allclose(out, img, atol=2e-3)


def test_legacy_atrous_still_runs():
    diffuse, spec, normal, depth, rough, noise = _scene(seed=4)
    img = diffuse + np.maximum(spec + noise, 0.0)
    out = atrous_denoise(img, normal, depth, spp=1)
    assert out.shape == img.shape and np.isfinite(out).all()
