"""General utilities - twin of reference editable_gauss_refl/utils/general_utils.py."""

from __future__ import annotations

import random

import numpy as np


def inverse_sigmoid(x):
    return np.log(x / (1.0 - x))


def get_expon_lr_func(lr_init, lr_final, lr_delay_steps=0, lr_delay_mult=1.0,
                      max_steps=1000000):
    """Plenoxels log-lerp schedule (general_utils.py:31-60)."""

    def helper(step):
        if step < 0 or (lr_init == 0.0 and lr_final == 0.0):
            return 0.0
        if lr_delay_steps > 0:
            delay_rate = lr_delay_mult + (1 - lr_delay_mult) * np.sin(
                0.5 * np.pi * np.clip(step / lr_delay_steps, 0, 1)
            )
        else:
            delay_rate = 1.0
        t = np.clip(step / max_steps, 0, 1)
        log_lerp = np.exp(np.log(lr_init) * (1 - t) + np.log(lr_final) * t)
        return delay_rate * log_lerp

    return helper


def set_seeds(seed: int = 0):
    """general_utils.py:115-119 (seed 0 everywhere); JAX keys are derived
    explicitly from this seed by callers."""
    random.seed(seed)
    np.random.seed(seed)
    return seed


def mean_dist2_knn3(points: np.ndarray, chunk: int = 2048) -> np.ndarray:
    """Mean squared distance to the 3 nearest neighbors.

    TPU/host-native replacement for the simple-knn CUDA submodule
    (`distCUDA2`, reference scene/gaussian_model.py:197-201): used to size
    initial Gaussian scales.  Chunked brute force - one-off at init time.
    """
    import jax
    import jax.numpy as jnp

    pts = jnp.asarray(points, jnp.float32)
    n = pts.shape[0]
    if n == 0:
        return np.zeros((0,), np.float32)
    pad = (-n) % chunk
    if pad:
        pts_p = jnp.concatenate([pts, jnp.full((pad, 3), 1e30, jnp.float32)])
    else:
        pts_p = pts
    num_chunks = pts_p.shape[0] // chunk

    @jax.jit
    def one_chunk(c):
        q = jax.lax.dynamic_slice_in_dim(pts_p, c * chunk, chunk, 0)
        d2 = jnp.sum((q[:, None, :] - pts[None, :, :]) ** 2, axis=-1)
        # exclude self (distance 0) by taking 4 smallest and dropping the first
        neg4, _ = jax.lax.top_k(-d2, 4)
        return jnp.mean(-neg4[:, 1:], axis=-1)

    out = np.concatenate([np.asarray(one_chunk(c)) for c in range(num_chunks)])
    return out[:n]
