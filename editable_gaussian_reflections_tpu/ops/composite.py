"""Front-to-back alpha compositing with truncated-tail correction.

TPU-native twin of the k-buffer compositing loop in
reference editable_gauss_refl/cuda/csrc/forward_pass.cu:49-155.  Operates on
the depth-sorted [R, K] hit records produced by ops.trace; the sequential
front-to-back loop becomes cumulative products/sums along the hit axis:

  * T_before_i = prod_{j<i} (1 - alpha_j)          (exclusive cumprod)
  * a hit is composited iff T_before_i >= transmittance_threshold - the
    vectorized form of the reference's early-out (forward_pass.cu:131-134),
    exact because the composite mask is prefix-closed;
  * w_i = T_before_i * alpha_i; attributes accumulate as weighted sums
    (forward_pass.cu:107-115);
  * the truncated tail redistributes (T_composited - T_exact) using the
    normalized accumulated color (forward_pass.cu:142-155), where T_exact is
    the product over ALL hits (tracked exactly during tracing).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from .trace import RayHits


class CompositeOut(NamedTuple):
    """Per-ray outputs of one bounce step plus backward residuals."""

    rgb: jnp.ndarray          # [R, 3]  (pre-throughput-multiplication)
    normal: jnp.ndarray       # [R, 3]  unnormalized accumulated normal
    f0: jnp.ndarray           # [R, 3]
    roughness: jnp.ndarray    # [R]
    depth: jnp.ndarray        # [R]
    # residuals for the hand-written backward:
    remaining_rgb: jnp.ndarray        # [R, 3]
    remaining_normal: jnp.ndarray     # [R, 3]
    remaining_f0: jnp.ndarray         # [R, 3]
    remaining_roughness: jnp.ndarray  # [R]
    remaining_depth: jnp.ndarray      # [R]
    T_final: jnp.ndarray      # [R] transmittance after composited hits
    full_T: jnp.ndarray       # [R] exact transmittance over all hits
    T_after: jnp.ndarray      # [R, K] transmittance after each hit (PPLL field)
    weight: jnp.ndarray       # [R, K] per-hit composite weight T_before*alpha
    comp_mask: jnp.ndarray    # [R, K] bool - hit actually composited
    num_accumulated: jnp.ndarray  # [R] int32 stats


def composite(
    hits: RayHits,
    g_rgb,        # [R, K, 3] activated attributes gathered for the hits
    g_normal,     # [R, K, 3]
    g_f0,         # [R, K, 3]
    g_roughness,  # [R, K]
    transmittance_threshold,
    eps_forward_normalization,
) -> CompositeOut:
    alpha = jnp.where(hits.valid, hits.alpha, 0.0)                 # [R, K]
    one_minus = 1.0 - alpha
    T_after_all = jnp.cumprod(one_minus, axis=-1)
    T_before = jnp.concatenate(
        [jnp.ones_like(T_after_all[:, :1]), T_after_all[:, :-1]], axis=-1
    )

    comp_mask = hits.valid & (T_before >= transmittance_threshold)
    alpha_c = jnp.where(comp_mask, alpha, 0.0)
    # Recompute transmittances over composited hits only; inside the composited
    # prefix these agree with T_after_all (mask is prefix-closed).
    T_after = jnp.cumprod(1.0 - alpha_c, axis=-1)
    T_before = jnp.concatenate(
        [jnp.ones_like(T_after[:, :1]), T_after[:, :-1]], axis=-1
    )
    weight = T_before * alpha_c                                     # [R, K]

    w3 = weight[..., None]
    rgb = jnp.sum(g_rgb * w3, axis=1)
    normal = jnp.sum(g_normal * w3, axis=1)
    f0 = jnp.sum(g_f0 * w3, axis=1)
    roughness = jnp.sum(g_roughness * weight, axis=1)
    depth = jnp.sum(hits.t * weight, axis=1)
    T_final = T_after[:, -1]

    # Truncated-tail correction (forward_pass.cu:142-155)
    remaining_T = T_final - hits.full_T
    normalization = jnp.maximum(1.0 - T_final, eps_forward_normalization)
    remaining_rgb = rgb / normalization[:, None]
    remaining_normal = normal / normalization[:, None]
    remaining_f0 = f0 / normalization[:, None]
    remaining_roughness = roughness / normalization
    remaining_depth = depth / normalization

    rgb = rgb + remaining_T[:, None] * remaining_rgb
    normal = normal + remaining_T[:, None] * remaining_normal
    f0 = f0 + remaining_T[:, None] * remaining_f0
    roughness = roughness + remaining_T * remaining_roughness
    depth = depth + remaining_T * remaining_depth

    return CompositeOut(
        rgb=rgb, normal=normal, f0=f0, roughness=roughness, depth=depth,
        remaining_rgb=remaining_rgb, remaining_normal=remaining_normal,
        remaining_f0=remaining_f0, remaining_roughness=remaining_roughness,
        remaining_depth=remaining_depth,
        T_final=T_final, full_T=hits.full_T, T_after=T_after, weight=weight,
        comp_mask=comp_mask,
        num_accumulated=jnp.sum(comp_mask.astype(jnp.int32), axis=-1),
    )
