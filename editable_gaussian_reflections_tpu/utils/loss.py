"""Loss helpers - twin of reference utils/loss_utils.py (l1/l2/ssim).

Like in the reference these serve eval/legacy paths only; the TRAINING loss
lives fused inside the render backward (ops/render_grads.py), exactly as the
reference's lives in backward_pass.cu.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax


def l1_loss(network_output, gt):
    return jnp.abs(network_output - gt).mean()


def l2_loss(network_output, gt):
    return ((network_output - gt) ** 2).mean()


def gaussian_window(window_size: int, sigma: float):
    x = jnp.arange(window_size, dtype=jnp.float32) - window_size // 2
    g = jnp.exp(-(x**2) / (2 * sigma**2))
    return g / g.sum()


def _blur(x, w):
    """Separable Gaussian blur over HWC via depthwise convs."""
    k = w.shape[0]
    img = jnp.moveaxis(x, -1, 0)[:, None]                     # [C, 1, H, W]
    kh = w.reshape(1, 1, k, 1)
    kw = w.reshape(1, 1, 1, k)
    out = lax.conv_general_dilated(
        img, kh, (1, 1), [(k // 2, k // 2), (0, 0)],
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )
    out = lax.conv_general_dilated(
        out, kw, (1, 1), [(0, 0), (k // 2, k // 2)],
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )
    return jnp.moveaxis(out[:, 0], 0, -1)


def ssim(img1, img2, window_size: int = 11, sigma: float = 1.5,
         C1: float = 0.01**2, C2: float = 0.03**2):
    """SSIM over HWC [0,1] images (Gaussian window, torchmetrics defaults)."""
    img1 = jnp.asarray(img1, jnp.float32)
    img2 = jnp.asarray(img2, jnp.float32)
    if img1.ndim == 2:
        img1 = img1[..., None]
        img2 = img2[..., None]
    w = gaussian_window(window_size, sigma)
    mu1, mu2 = _blur(img1, w), _blur(img2, w)
    mu1_sq, mu2_sq, mu12 = mu1**2, mu2**2, mu1 * mu2
    s1 = _blur(img1 * img1, w) - mu1_sq
    s2 = _blur(img2 * img2, w) - mu2_sq
    s12 = _blur(img1 * img2, w) - mu12
    num = (2 * mu12 + C1) * (2 * s12 + C2)
    den = (mu1_sq + mu2_sq + C1) * (s1 + s2 + C2)
    return (num / den).mean()
