"""Multi-device tests on the virtual 8-device CPU mesh: ray-sharded training
step and Gaussian-axis sharded tracing (must match single-device exactly)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from editable_gaussian_reflections_tpu.ops.trace import trace_rays
from editable_gaussian_reflections_tpu.scene.gaussian_scene import (
    build_frames,
    from_arrays,
)


def make_scene(n=48, seed=0, pad_multiple=2048 * 8):
    rng = np.random.default_rng(seed)
    return from_arrays(
        xyz=(rng.uniform(-1.5, 1.5, (n, 3)) + np.array([0, 0, 5])).astype(np.float32),
        scaling=rng.uniform(-2.0, -1.0, (n, 3)).astype(np.float32),
        rotation=rng.normal(size=(n, 4)).astype(np.float32),
        opacity=rng.uniform(-1, 2, n).astype(np.float32),
        diffuse=rng.uniform(0, 1, (n, 3)).astype(np.float32),
        normal=rng.normal(size=(n, 3)).astype(np.float32),
        f0=rng.uniform(0, 1, (n, 3)).astype(np.float32),
        roughness=rng.uniform(0, 1, n).astype(np.float32),
        pad_multiple=pad_multiple,
    )


@pytest.mark.skipif(len(jax.devices()) < 2, reason="needs a multi-device mesh")
def test_gaussian_sharded_trace_matches_single_device():
    from jax.sharding import Mesh
    from editable_gaussian_reflections_tpu.parallel.gaussian_sharded import (
        gaussian_sharded_trace,
    )

    n_dev = len(jax.devices())
    scene = make_scene(pad_multiple=2048 * n_dev)
    frames, _ = build_frames(scene, 0.005, 3.0)
    R = 8
    rng = np.random.default_rng(1)
    o = jnp.zeros((R, 3))
    d_np = rng.normal(size=(R, 3))
    d_np[:, 2] = np.abs(d_np[:, 2]) + 0.8
    d = jnp.asarray((d_np / np.linalg.norm(d_np, axis=1, keepdims=True)).astype(np.float32))
    near, far = jnp.float32(0.1), jnp.float32(60.0)

    mesh = Mesh(np.array(jax.devices()), ("gauss",))
    hs = gaussian_sharded_trace(mesh, scene, o, d, 3.0, near, far,
                                max_hits=16, chunk=2048)
    h1 = trace_rays(o, d, frames, 3.0, near, far, max_hits=16, chunk=2048)

    vs, v1 = np.asarray(hs.valid), np.asarray(h1.valid)
    np.testing.assert_array_equal(vs.sum(1), v1.sum(1))
    np.testing.assert_allclose(
        np.where(vs, np.asarray(hs.t), 0), np.where(v1, np.asarray(h1.t), 0),
        rtol=1e-5, atol=1e-6,
    )
    np.testing.assert_array_equal(
        np.where(vs, np.asarray(hs.ids), -1),
        np.where(v1, np.asarray(h1.ids), -1),
    )
    np.testing.assert_allclose(np.asarray(hs.full_T), np.asarray(h1.full_T),
                               rtol=1e-4)


@pytest.mark.skipif(len(jax.devices()) < 2, reason="needs a multi-device mesh")
def test_sharded_train_step_runs_and_matches_shapes():
    from editable_gaussian_reflections_tpu.parallel.sharding import (
        make_mesh,
        sharded_train_step,
    )
    from editable_gaussian_reflections_tpu.renderer.raytracer import (
        CameraParams,
        RayTargets,
        RenderSettings,
    )
    from editable_gaussian_reflections_tpu.training import init_train_state

    scene = make_scene(n=32, pad_multiple=64)
    state = init_train_state(scene)
    W = H = 16
    R = W * H
    camera = CameraParams(
        origin=jnp.zeros(3),
        c2w=jnp.asarray(np.diag([1.0, 1.0, -1.0]).astype(np.float32)),
        fov_y=jnp.asarray(0.8), znear=jnp.asarray(0.1),
        zfar=jnp.asarray(60.0),
    )
    targets = RayTargets(
        diffuse=jnp.full((R, 3), 0.3), specular=jnp.zeros((R, 3)),
        depth=jnp.full((R,), 5.0), normal=jnp.zeros((R, 3)),
        roughness=jnp.full((R,), 0.5), f0=jnp.full((R, 3), 0.04),
    )
    lrs = dict(xyz=1e-4, scaling=5e-3, rotation=1e-3, opacity=2.5e-2,
               diffuse=5e-3, normal=2.5e-3, f0=2.5e-3, roughness=2.5e-3)
    hyper = dict(beta_1=0.9, beta_2=0.999, scale_decay=0.9999, apply_grads=1.0)
    mesh = make_mesh()
    new_state, metrics = sharded_train_step(
        mesh, state, camera, targets, RenderSettings(), lrs, hyper,
        jax.random.PRNGKey(0), W, H, num_bounces=1, max_hits=8, chunk=64,
    )
    assert np.isfinite(float(metrics["l1_diffuse"]))
    for f in ("xyz", "diffuse", "opacity"):
        arr = np.asarray(getattr(new_state.scene, f))
        assert np.isfinite(arr).all()
    # params actually moved
    assert float(np.abs(np.asarray(new_state.scene.diffuse)
                        - np.asarray(scene.diffuse)).max()) > 0
