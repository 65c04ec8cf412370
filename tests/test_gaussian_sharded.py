"""gaussian_sharded_train_step == train_step on the virtual CPU mesh.

VERDICT r1 item 8: sharded compositing + loss-fused backward with grads
psum'd over the "gauss" axis, composed with ray DP on a 2D mesh, must
reproduce the single-device step (params, moments, loss) to collective
summation order."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from editable_gaussian_reflections_tpu.config import Config
from editable_gaussian_reflections_tpu.parallel.gaussian_sharded import (
    gaussian_sharded_train_step,
)
from editable_gaussian_reflections_tpu.renderer.raytracer import (
    CameraParams,
    RayTargets,
)
from editable_gaussian_reflections_tpu.scene.gaussian_scene import from_arrays
from editable_gaussian_reflections_tpu.training import (
    init_train_state,
    lr_tree,
    settings_from_config,
    train_step,
)
from editable_gaussian_reflections_tpu.utils.synth import (
    room_camera,
    room_scene,
)

W = H = 16
CHUNK = 256


def _setup(n=3800):
    scene = from_arrays(**room_scene(n), pad_multiple=4 * CHUNK)
    state = init_train_state(scene)
    eye, c2w = room_camera()
    camera = CameraParams(
        origin=jnp.asarray(eye), c2w=jnp.asarray(c2w),
        fov_y=jnp.asarray(0.9), znear=jnp.asarray(0.05),
        zfar=jnp.asarray(50.0))
    cfg = Config()
    settings = settings_from_config(cfg)
    R = W * H
    rng = np.random.default_rng(0)
    targets = RayTargets(
        diffuse=jnp.asarray(rng.uniform(0, 1, (R, 3)), jnp.float32),
        specular=jnp.asarray(rng.uniform(0, 0.3, (R, 3)), jnp.float32),
        depth=jnp.asarray(rng.uniform(1, 5, (R,)), jnp.float32),
        normal=jnp.asarray(rng.normal(size=(R, 3)), jnp.float32),
        roughness=jnp.asarray(rng.uniform(0, 1, (R,)), jnp.float32),
        f0=jnp.asarray(rng.uniform(0, 1, (R, 3)), jnp.float32))
    lrs = lr_tree(cfg, 10, 3.0)
    hyper = dict(beta_1=0.9, beta_2=0.999, scale_decay=0.9999,
                 apply_grads=1.0)
    return state, camera, settings, targets, lrs, hyper


def _single_device_grads(state, camera, settings, targets, key, n_ray,
                         num_bounces=2):
    """The exact gradients train_step computes (its internals, pre-Adam)."""
    from editable_gaussian_reflections_tpu.training import (
        grads_over_tiles,
        prepare_render_inputs,
        prepare_rays,
    )
    scene = state.scene
    frames, attrs, gpack, culling, scene_for_bwd, _ = prepare_render_inputs(
        scene, settings, False, False, 256, 256, 192)
    key_jit, key_b = jax.random.split(key)
    dirs, _, _ = prepare_rays(W, H, camera, key_jit, True, 256, False)
    R = W * H
    tile = R // n_ray
    dirs_t = dirs.reshape(R // tile, tile, 3)
    targets_t = jax.tree_util.tree_map(
        lambda a: a.reshape((R // tile, tile) + a.shape[1:]), targets)
    origins = jnp.broadcast_to(camera.origin, (tile, 3))
    grads, l1 = grads_over_tiles(
        origins, dirs_t, targets_t, frames, attrs, scene_for_bwd,
        settings, camera, key_b, 0, num_bounces, 8, CHUNK, False, 3.0,
        gpack, culling)
    return grads, l1


def _make_mesh(mesh_shape):
    n_dev = int(np.prod(list(mesh_shape.values())))
    devs = np.array(jax.devices()[:n_dev]).reshape(
        tuple(mesh_shape.values()))
    return Mesh(devs, tuple(mesh_shape.keys()))


needs_mesh = pytest.mark.skipif(
    len(jax.devices()) < 4, reason="needs a 4-device mesh")


@needs_mesh
@pytest.mark.parametrize("mesh_shape", [
    {"gauss": 4}, {"rays": 2, "gauss": 2},
])
def test_gaussian_sharded_grads_exact_primary(mesh_shape):
    """num_bounces=0: no RNG-resampling chaos, grads must match tightly."""
    state, camera, settings, targets, lrs, hyper = _setup()
    key = jax.random.PRNGKey(7)
    mesh = _make_mesh(mesh_shape)
    ray_axis = "rays" if "rays" in mesh_shape else None
    n_ray = mesh_shape.get("rays", 1)

    ref_grads, ref_l1 = _single_device_grads(
        state, camera, settings, targets, key, n_ray, num_bounces=0)
    _, metrics, grads = gaussian_sharded_train_step(
        mesh, state, camera, targets, settings, lrs, hyper, key,
        width=W, height=H, num_bounces=0, max_hits=8, chunk=CHUNK,
        gauss_axis="gauss", ray_axis=ray_axis)

    np.testing.assert_allclose(
        float(metrics["l1_diffuse"]) * W * H, float(ref_l1), rtol=1e-5)
    for f in ref_grads._fields:
        ga = np.asarray(getattr(grads, f))
        gb = np.asarray(getattr(ref_grads, f))
        scale = max(1e-6, np.abs(gb).max())
        np.testing.assert_allclose(ga, gb, rtol=1e-4, atol=1e-5 * scale,
                                   err_msg=f"grads.{f}")


@needs_mesh
def test_gaussian_sharded_train_step_full_bounces():
    """num_bounces=2: collective reordering perturbs full_T at ulp level,
    which the GGX resampling amplifies chaotically for a handful of rays -
    assert the loss matches and >=99% of gradient entries agree."""
    state, camera, settings, targets, lrs, hyper = _setup()
    key = jax.random.PRNGKey(7)
    mesh = _make_mesh({"gauss": 4})

    ref_state, ref_metrics = train_step(
        state, camera, targets, settings, lrs, hyper, key,
        width=W, height=H, num_bounces=2, max_hits=8, chunk=CHUNK,
        tile=W * H, use_pallas=False)
    ref_grads, _ = _single_device_grads(
        state, camera, settings, targets, key, 1, num_bounces=2)

    new_state, metrics, grads = gaussian_sharded_train_step(
        mesh, state, camera, targets, settings, lrs, hyper, key,
        width=W, height=H, num_bounces=2, max_hits=8, chunk=CHUNK,
        gauss_axis="gauss")

    np.testing.assert_allclose(
        float(metrics["l1_diffuse"]), float(ref_metrics["l1_diffuse"]),
        rtol=1e-5)
    for f in ref_grads._fields:
        ga = np.asarray(getattr(grads, f))
        gb = np.asarray(getattr(ref_grads, f))
        scale = max(1e-6, np.abs(gb).max())
        ok = np.abs(ga - gb) <= 1e-4 * np.abs(gb) + 1e-5 * scale
        assert ok.mean() > 0.99, (f, 1 - ok.mean())
    assert float(jnp.max(jnp.abs(new_state.scene.xyz - state.scene.xyz))) > 0
