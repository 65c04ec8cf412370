"""GGX / Cook-Torrance BRDF, importance sampling, and throughput weight.

TPU-native twin of reference editable_gauss_refl/cuda/csrc/utils/ggx_brdf.h.
Everything is pure jnp, shape-polymorphic over leading batch dims with the
vector axis last, so the same code runs at host level, under vmap, and inside
Pallas kernel bodies.

The reference ships closed-form derivatives of D/G1/F (ggx_brdf.h:15-111) but
its renderer only ever *evaluates* the BRDF weight along the sampled bounce -
gradients are deliberately not propagated through the bounce chain
(backward_pass.cu treats throughput as a constant).  We keep the functions
differentiable anyway and test jax.grad against the reference's closed forms.
"""

from __future__ import annotations

import jax.numpy as jnp

BRDF_EPS = 1e-8


def _dot(a, b):
    return jnp.sum(a * b, axis=-1)


def _normalize(v, eps=0.0):
    return v / (jnp.linalg.norm(v, axis=-1, keepdims=True) + eps)


def D_GGX(N, H, alpha):
    """ggx_brdf.h:8-13 (normal distribution function)."""
    NdotH = jnp.maximum(_dot(N, H), 0.0)
    a2 = alpha * alpha
    denom = NdotH * NdotH * (a2 - 1.0) + 1.0
    return a2 / (jnp.pi * (denom * denom) + BRDF_EPS)


def G1(N, W, alpha):
    """ggx_brdf.h:32-37 (Schlick-GGX masking, k = alpha^2/2)."""
    NdotW = jnp.maximum(_dot(N, W), 0.0)
    k = (alpha * alpha) / 2.0
    return NdotW / (NdotW * (1.0 - k) + k + BRDF_EPS)


def G_Smith(N, V, L, alpha):
    """ggx_brdf.h:64."""
    return G1(N, V, alpha) * G1(N, L, alpha)


def fresnel_schlick(f0, cos_theta):
    """ggx_brdf.h:84. ``cos_theta`` broadcasts against f0's last axis."""
    c = jnp.asarray(cos_theta)[..., None]
    return f0 + (1.0 - f0) * jnp.power(1.0 - c, 5.0)


def cook_torrance_brdf(N, V, L, roughness, f0):
    """ggx_brdf.h:113-132. Returns 0 where f0 == 0 (all channels)."""
    H = _normalize(V + L)
    alpha = roughness * roughness
    D = D_GGX(N, H, alpha)
    G = G_Smith(N, V, L, alpha)
    cos_theta = jnp.maximum(_dot(L, H), 0.0)
    F = fresnel_schlick(f0, cos_theta)
    NdotL = jnp.maximum(_dot(N, L), 0.0)
    NdotV = jnp.maximum(_dot(N, V), 0.0)
    denom = 4.0 * NdotL * NdotV + BRDF_EPS
    brdf = (D * G / denom)[..., None] * F
    zero_f0 = jnp.all(f0 == 0.0, axis=-1, keepdims=True)
    return jnp.where(zero_f0, 0.0, brdf)


def cook_torrance_weight(N, V, L, roughness, f0):
    """Importance-sampling throughput weight F*G*VdotH/(NdotH*NdotV).

    ggx_brdf.h:134-150.  This is brdf/pdf for Walter's half-vector sampling.
    (eps in the half-vector normalization: L == -V would produce NaN.)
    """
    H = _normalize(V + L, eps=1e-20)
    NdotH = jnp.maximum(_dot(N, H), 0.0)
    VdotH = jnp.maximum(_dot(V, H), 0.0)
    NdotV = jnp.maximum(_dot(N, V), 0.0)
    alpha = roughness * roughness
    G = G_Smith(N, V, L, alpha)
    F = fresnel_schlick(f0, VdotH)
    w = F * (G * VdotH / (NdotH * NdotV + BRDF_EPS))[..., None]
    zero_f0 = jnp.all(f0 == 0.0, axis=-1, keepdims=True)
    return jnp.where(zero_f0, 0.0, w)


def reflect(i, n):
    """Mirror ``i`` about ``n`` (NVIDIA vec_math.h convention)."""
    return i - 2.0 * n * _dot(n, i)[..., None]


def sample_cook_torrance(N, V, roughness, uniform_samples):
    """GGX half-vector importance sampling, ggx_brdf.h:152-168.

    uniform_samples: (..., 2) in [0,1). Returns the sampled bounce direction
    reflect(-V, H) - normalized when N and V are.
    """
    alpha = roughness * roughness
    u0 = uniform_samples[..., 0]
    u1 = uniform_samples[..., 1]
    phi = 2.0 * jnp.pi * u0
    cos_theta = jnp.sqrt((1.0 - u1) / (1.0 + (alpha * alpha - 1.0) * u1))
    sin_theta = jnp.sqrt(jnp.maximum(1.0 - cos_theta * cos_theta, 0.0))
    H_local = jnp.stack(
        [sin_theta * jnp.cos(phi), sin_theta * jnp.sin(phi), cos_theta], axis=-1
    )

    # Tangent frame (matches the reference's branch on N.z, ggx_brdf.h:161-163)
    nz = N[..., 2]
    up = jnp.where(
        (nz < 0.999)[..., None],
        jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0], N.dtype), N.shape),
        jnp.broadcast_to(jnp.array([1.0, 0.0, 0.0], N.dtype), N.shape),
    )
    T = _normalize(jnp.cross(up, N), eps=1e-20)
    B = jnp.cross(N, T)
    H = (
        H_local[..., 0:1] * T
        + H_local[..., 1:2] * B
        + H_local[..., 2:3] * N
    )
    return reflect(-V, H)
