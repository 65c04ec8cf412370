"""Filmic tonemapping pair (reference editable_gauss_refl/utils/tonemapping.py:1-13).

Training happens in HDR (untonemapped) space; tonemap is applied only for
eval/preview.  Works on jnp and numpy arrays alike.
"""

from __future__ import annotations

import jax.numpy as jnp


def tonemap(x, gamma=1.3):
    x = jnp.nan_to_num(x, posinf=999999999.9)
    x = (x * (6.2 * x + 0.5)) / (x * (6.2 * x + 1.7) + 0.06)
    return jnp.power(x, gamma)


def untonemap(y, gamma=1.3, eps=1e-6):
    y = jnp.power(y, 1.0 / gamma)
    numerator = 0.1371 * y + 0.09549 * jnp.sqrt(y**2 - 0.1512 * y + 0.1783) - 0.04032
    denominator = 1.0 - y + eps
    return numerator / denominator
