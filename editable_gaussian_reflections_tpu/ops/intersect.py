"""Ray x anisotropic-Gaussian intersection (max-response point along ray).

TPU-native twin of the OptiX intersection program
(reference editable_gauss_refl/cuda/csrc/shaders.cu:9-75).  Instead of a BVH
traversal invoking a per-hit callback, we evaluate the closed-form
max-response test for dense (ray, gaussian) blocks - the math is identical:

  * transform the ray into the Gaussian's local frame, where the
    alpha-threshold isosurface is the unit sphere:
        x_local = diag(1/sizes) @ R^T @ (x_world - mean),
        sizes   = exp(scale) * scaling_factor * global_scale_factor
    (bvh_wrapper.cu:9-31; the unit-AABB BLAS + per-instance transform)
  * reject Gaussians whose center projects behind the ray (shaders.cu:36-38)
  * the max-response point is the closest point to the center along the ray;
    reject if it lies outside the unit sphere (shaders.cu:47-50)
  * reject backfacing Gaussians near the origin of secondary rays
    (shaders.cu:53-61)
  * alpha = MAX_ALPHA * exp(-(|sf*u|^2)^p / 2p) * opacity (shaders.cu:63-66)

Everything vectorizes over a [num_rays, num_gaussians] block; masked lanes are
encoded in the returned ``valid`` array.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from .gaussian_kernel import MAX_ALPHA, eval_gaussian_sq


class GaussianFrames(NamedTuple):
    """Per-Gaussian activated geometry, precomputed once per render call.

    The functional equivalent of the BVH instance transforms
    (bvh_wrapper.cu:33-66): everything needed to map rays into each
    Gaussian's unit-sphere frame.
    """

    mean: jnp.ndarray        # [N, 3]
    rot: jnp.ndarray         # [N, 3, 3]  world = rot @ local
    inv_sizes: jnp.ndarray   # [N, 3]  1 / (exp(scale) * sf * gsf); 0 if degenerate
    sf: jnp.ndarray          # [N]  scaling factor (alpha-threshold clip radius)
    opacity: jnp.ndarray     # [N]  sigmoid-activated
    normal: jnp.ndarray      # [N, 3]  raw (identity activation)
    valid: jnp.ndarray       # [N]  bool; False for degenerate/padded Gaussians


class Hits(NamedTuple):
    """Per (ray, gaussian) intersection results. All [R, N(block)]."""

    t: jnp.ndarray           # world-space distance of the max-response point
    alpha: jnp.ndarray
    gaussval: jnp.ndarray
    local_hit: jnp.ndarray   # [R, N, 3] sf-scaled local hit point
    valid: jnp.ndarray       # bool


def intersect_block(
    rays_o,                  # [R, 3]
    rays_d,                  # [R, 3] normalized
    frames: GaussianFrames,  # block of N Gaussians
    exp_power,
    near,
    far,
    secondary: bool = False,
    backfacing_max_dist: float = 0.1,
    backfacing_invalid_normal_threshold: float = 0.9,
) -> Hits:
    # Local-frame ray: lo = Dinv R^T (o - mean), ld = Dinv R^T d
    # (explicit mul+sum instead of einsum: tiny 3-contractions belong on the
    # VPU, and this sidesteps low-precision matmul lowering)
    rel = rays_o[:, None, :] - frames.mean[None, :, :]          # [R, N, 3]
    lo = jnp.sum(frames.rot[None] * rel[..., :, None], axis=-2) * frames.inv_sizes[None]
    ld = (
        jnp.sum(frames.rot[None] * rays_d[:, None, :, None], axis=-2)
        * frames.inv_sizes[None]
    )

    # Reject Gaussians behind the ray (shaders.cu:36-38)
    front = jnp.sum(lo * ld, axis=-1) <= 0.0

    norm = jnp.sqrt(jnp.sum(ld * ld, axis=-1))
    safe_norm = jnp.maximum(norm, 1e-20)
    ldn = ld / safe_norm[..., None]
    t_loc = -jnp.sum(lo * ldn, axis=-1)
    t_world = t_loc / safe_norm

    u = lo + t_loc[..., None] * ldn                              # unit-sphere hit
    sq = jnp.sum(u * u, axis=-1)
    inside = sq <= 1.0

    valid = frames.valid[None, :] & front & inside
    valid &= (t_world > near) & (t_world < far)

    if secondary:
        # shaders.cu:53-61 - note the dot is against the *local* direction.
        nlen = jnp.linalg.norm(frames.normal, axis=-1)           # [N]
        ndotd = jnp.sum(frames.normal[None] * ldn, axis=-1)
        reject = (
            (t_world < backfacing_max_dist)
            & (nlen[None, :] > backfacing_invalid_normal_threshold)
            & (ndotd > 0.0)
        )
        valid &= ~reject

    local_hit = u * frames.sf[None, :, None]
    sq_scaled = sq * (frames.sf * frames.sf)[None, :]
    gaussval = eval_gaussian_sq(sq_scaled, exp_power)
    alpha = MAX_ALPHA * gaussval * frames.opacity[None, :]
    alpha = jnp.where(valid, alpha, 0.0)

    return Hits(t=t_world, alpha=alpha, gaussval=gaussval,
                local_hit=local_hit, valid=valid)
