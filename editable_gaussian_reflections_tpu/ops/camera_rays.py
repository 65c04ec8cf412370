"""Primary-ray generation - functional twin of the device camera.

Matches reference editable_gauss_refl/cuda/csrc/core/camera.h:17-36 (and its
Python twin utils/depth_utils.py:27-63): a pinhole camera parameterized by
vertical FoV + aspect, NDC computed from pixel centers, rotated to world with
the *columns* of c2w (the transposed w2c rows):

    dir_world = normalize(c2w @ [x_ndc, y_ndc, -1])
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def primary_ray_directions(width, height, vertical_fov_radians, c2w_rotation,
                           jitter_key=None, dtype=jnp.float32):
    """Per-pixel world-space ray directions, shape (H, W, 3), normalized.

    c2w_rotation: (3, 3) camera-to-world rotation.
    jitter_key: optional PRNG key; adds uniform sub-pixel jitter in [-0.5, 0.5)
      like camera.h:24-27 (counter-based, replacing the reference's tea/LCG).
    """
    view_size = jnp.tan(vertical_fov_radians / 2.0)
    aspect_ratio = width / height

    iy = jax.lax.broadcasted_iota(dtype, (height, width), 0)
    ix = jax.lax.broadcasted_iota(dtype, (height, width), 1)
    if jitter_key is not None:
        jit = jax.random.uniform(jitter_key, (height, width, 2), dtype) - 0.5
        ix = ix + jit[..., 0]
        iy = iy + jit[..., 1]

    y = view_size * (1.0 - 2.0 * (iy + 0.5) / height)
    x = aspect_ratio * view_size * (2.0 * (ix + 0.5) / width - 1.0)

    # dir = c2w_col0 * x + c2w_col1 * y - c2w_col2  (camera.h:35)
    d = (
        c2w_rotation[:, 0] * x[..., None]
        + c2w_rotation[:, 1] * y[..., None]
        - c2w_rotation[:, 2]
    )
    return d / jnp.linalg.norm(d, axis=-1, keepdims=True)
