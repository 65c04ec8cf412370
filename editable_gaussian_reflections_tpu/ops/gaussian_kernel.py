"""Generalized-Gaussian kernel math.

TPU-native twin of reference editable_gauss_refl/cuda/csrc/utils/kernel.cu:1-16
and the MAX_ALPHA stability clamp from flags.h:8.

The reference uses a *generalized* Gaussian of power ``p`` (default 3):
    G(x) = exp(-(|x|^2)^p / (2p))
and clips each ellipsoid at the alpha-threshold isosurface, giving the
"scaling factor" that maps the unit sphere (the BVH primitive) onto that
isosurface:
    sf(o, tau, p) = (2p * ln(o / tau))^(1/(2p)),  0 if o <= tau.
"""

from __future__ import annotations

import jax.numpy as jnp

# flags.h:8 - "Essential for stability, can't remove"
MAX_ALPHA = 0.9999

# flags.h:16-19 - performance flags (k-buffer depth in the reference)
BUFFER_SIZE = 16
MAX_ITERATIONS = 99
MAX_BOUNCES = 2
ROUGHNESS_DOWNWEIGHT_GRAD = True
ROUGHNESS_DOWNWEIGHT_GRAD_POWER = 3.0


def compute_scaling_factor(opacity, alpha_threshold, exp_power):
    """kernel.cu:3-6. Zero when opacity <= alpha_threshold."""
    k = 2.0 * exp_power
    safe_ratio = jnp.maximum(opacity / alpha_threshold, 1.0 + 1e-12)
    sf = jnp.power(k * jnp.log(safe_ratio), 1.0 / k)
    return jnp.where(opacity <= alpha_threshold, 0.0, sf)


def eval_gaussian_sq(sq_dist, exp_power):
    """G from the squared Mahalanobis-ish distance (kernel.cu:8-12)."""
    k = 2.0 * exp_power
    return jnp.exp(-jnp.power(sq_dist, exp_power) / k)


def eval_gaussian(local_hit, exp_power):
    """kernel.cu:8-12 (vector form; reduces over the last axis)."""
    d = jnp.sum(local_hit * local_hit, axis=-1)
    return eval_gaussian_sq(d, exp_power)


def compute_alpha(gaussval, opacity, alpha_threshold=None):
    """kernel.cu:14-16 (alpha_threshold unused there too)."""
    return MAX_ALPHA * gaussval * opacity
