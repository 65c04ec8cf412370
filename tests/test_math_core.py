"""Unit tests for the pure math core: activations, kernel math, GGX, tonemap,
quaternions.  Derivative identities are validated with jax.grad against the
reference's closed forms (ggx_brdf.h:15-111, activations.cu)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from editable_gaussian_reflections_tpu.ops import activations as act
from editable_gaussian_reflections_tpu.ops import ggx
from editable_gaussian_reflections_tpu.ops import quaternion as quat
from editable_gaussian_reflections_tpu.ops.gaussian_kernel import (
    MAX_ALPHA,
    compute_alpha,
    compute_scaling_factor,
    eval_gaussian,
)
from editable_gaussian_reflections_tpu.ops.tonemap import tonemap, untonemap


def test_tonemap_roundtrip():
    # mirror of reference tests/test_tonemapping.py:6-18
    x = jnp.linspace(0.0, 10.0, 256)
    y = tonemap(x)
    x2 = untonemap(y)
    np.testing.assert_allclose(np.asarray(x2), np.asarray(x), atol=1e-2, rtol=1e-2)
    assert float(jnp.max(y)) <= 1.0 + 1e-5


@pytest.mark.parametrize(
    "fwd,bwd",
    [
        (act.sigmoid_act, act.backward_sigmoid_act),
        (act.exp_act, act.backward_exp_act),
    ],
)
def test_activation_backward_matches_autograd(fwd, bwd):
    xs = jnp.linspace(-3.0, 3.0, 41)
    auto = jax.vmap(jax.grad(fwd))(xs)
    hand = bwd(jnp.ones_like(xs), fwd(xs))
    np.testing.assert_allclose(np.asarray(hand), np.asarray(auto), rtol=1e-5)


def test_normalize_backward_matches_autograd():
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (16, 4))
    ct = jax.random.normal(jax.random.PRNGKey(1), (16, 4))

    def f(xi):
        return act.normalize_act(xi)

    _, vjp = jax.vjp(f, x)
    (auto,) = vjp(ct)
    hand = act.backward_normalize_act(ct, x, f(x))
    np.testing.assert_allclose(np.asarray(hand), np.asarray(auto), rtol=1e-4, atol=1e-5)


def test_scaling_factor():
    # kernel.cu:3-6 - zero below threshold, isosurface radius above
    assert float(compute_scaling_factor(0.001, 0.005, 3.0)) == 0.0
    sf = float(compute_scaling_factor(0.9, 0.005, 3.0))
    # at |x| = sf, exp(-(sf^2)^p/2p) * opacity == threshold
    g = float(eval_gaussian(jnp.array([sf, 0.0, 0.0]), 3.0))
    np.testing.assert_allclose(g * 0.9, 0.005, rtol=1e-4)


def test_alpha_clamp():
    a = compute_alpha(jnp.array(1.0), jnp.array(1.0))
    assert float(a) == pytest.approx(MAX_ALPHA)


def _rand_unit(key, shape):
    v = jax.random.normal(key, shape)
    return v / jnp.linalg.norm(v, axis=-1, keepdims=True)


def test_ggx_d_derivative_matches_reference_closed_form():
    # dD/dalpha from ggx_brdf.h:15-30: (2a(d - 2a^2 x^2)) / (pi d^3)
    key = jax.random.PRNGKey(2)
    N = _rand_unit(key, (8, 3))
    H = _rand_unit(jax.random.PRNGKey(3), (8, 3))
    alpha = jnp.linspace(0.1, 0.9, 8)

    auto = jax.vmap(jax.grad(lambda a, n, h: ggx.D_GGX(n, h, a)))(alpha, N, H)
    x = jnp.maximum(jnp.sum(N * H, axis=-1), 0.0)
    a2 = alpha * alpha
    d = x * x * (a2 - 1.0) + 1.0
    closed = (2.0 * alpha * (d - 2.0 * a2 * x * x)) / (jnp.pi * d**3)
    np.testing.assert_allclose(np.asarray(auto), np.asarray(closed), rtol=1e-3, atol=1e-5)


def test_ggx_g1_derivative_matches_reference_closed_form():
    key = jax.random.PRNGKey(4)
    N = _rand_unit(key, (8, 3))
    W = _rand_unit(jax.random.PRNGKey(5), (8, 3))
    alpha = jnp.linspace(0.15, 0.85, 8)
    auto = jax.vmap(jax.grad(lambda a, n, w: ggx.G1(n, w, a)))(alpha, N, W)
    x = jnp.maximum(jnp.sum(N * W, axis=-1), 0.0)
    k = alpha * alpha * 0.5
    d = x * (1.0 - k) + k + ggx.BRDF_EPS
    closed = -x * ((1.0 - x) * alpha) / (d * d)
    np.testing.assert_allclose(np.asarray(auto), np.asarray(closed), rtol=1e-3, atol=1e-5)


def test_fresnel_schlick_values():
    f0 = jnp.array([0.04, 0.5, 1.0])
    # normal incidence: F = f0
    np.testing.assert_allclose(
        np.asarray(ggx.fresnel_schlick(f0, 1.0)), np.asarray(f0), atol=1e-6
    )
    # grazing: F -> 1
    np.testing.assert_allclose(
        np.asarray(ggx.fresnel_schlick(f0, 0.0)), np.ones(3), atol=1e-6
    )


def test_cook_torrance_zero_f0_shortcircuit():
    N = jnp.array([0.0, 0.0, 1.0])
    V = _rand_unit(jax.random.PRNGKey(6), (3,))
    L = _rand_unit(jax.random.PRNGKey(7), (3,))
    z = jnp.zeros(3)
    assert np.all(np.asarray(ggx.cook_torrance_brdf(N, V, L, 0.3, z)) == 0.0)
    assert np.all(np.asarray(ggx.cook_torrance_weight(N, V, L, 0.3, z)) == 0.0)


def test_sample_cook_torrance_mirror_limit():
    # roughness -> 0: the sampled direction approaches the perfect mirror
    N = jnp.array([0.0, 0.0, 1.0])
    V = quat.normalize(jnp.array([0.3, -0.2, 0.9]))
    u = jnp.array([0.37, 0.81])
    d = ggx.sample_cook_torrance(N, V, 1e-4, u)
    mirror = ggx.reflect(-V, N)
    np.testing.assert_allclose(np.asarray(d), np.asarray(mirror), atol=1e-3)
    np.testing.assert_allclose(float(jnp.linalg.norm(d)), 1.0, atol=1e-5)


def test_quat_to_rotmat_orthonormal_and_convention():
    key = jax.random.PRNGKey(8)
    q = quat.normalize(jax.random.normal(key, (32, 4)))
    R = quat.quat_to_rotmat(q)
    eye = jnp.einsum("nij,nkj->nik", R, R, precision="highest")
    np.testing.assert_allclose(
        np.asarray(eye), np.broadcast_to(np.eye(3), (32, 3, 3)), atol=1e-5
    )
    det = jnp.linalg.det(R)
    np.testing.assert_allclose(np.asarray(det), np.ones(32), atol=1e-5)
    # identity quaternion (scalar-first)
    R0 = quat.quat_to_rotmat(jnp.array([1.0, 0.0, 0.0, 0.0]))
    np.testing.assert_allclose(np.asarray(R0), np.eye(3), atol=1e-7)
    # 90 deg about z maps x->y with Hamilton convention
    s = float(jnp.sin(jnp.pi / 4))
    Rz = quat.quat_to_rotmat(jnp.array([s, 0.0, 0.0, s]))
    np.testing.assert_allclose(np.asarray(Rz @ jnp.array([1.0, 0, 0])),
                               np.array([0.0, 1.0, 0.0]), atol=1e-6)


def test_rotmat_quat_roundtrip():
    key = jax.random.PRNGKey(9)
    q = quat.normalize(jax.random.normal(key, (64, 4)))
    q = jnp.where(q[..., :1] < 0, -q, q)  # canonical sign
    R = quat.quat_to_rotmat(q)
    q2 = quat.rotmat_to_quat(R)
    q2 = jnp.where(q2[..., :1] < 0, -q2, q2)
    np.testing.assert_allclose(np.asarray(q2), np.asarray(q), atol=1e-4)
