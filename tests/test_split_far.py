"""Split-far two-pass renderer: exactness of the t-window partition.

The split-far path (renderer/raytracer.py render_frame_fused(split_far=True))
renders each bounce as a near pass (hits with t < t_split) and a far pass
(t > t_split) combined through the transmittance product.  Because the
partition is by hit distance against a single per-ray t_split, the combine
is EXACT for ANY split sphere whenever both passes have capacity (K, mc)
for their hits - these tests assert equality against the single-pass
kernel, both at the kernel level (arbitrary per-ray t_split) and at the
whole-frame level (auto split sphere), in interpret mode.

Reference behavior being preserved: forward_pass.cu:49-155 composites ALL
hits front-to-back regardless of which acceleration path found them; the
split is purely a TPU-side culling restructure.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from editable_gaussian_reflections_tpu.renderer.raytracer import (
    CameraParams,
    RenderSettings,
    render_frame_fused,
)
from editable_gaussian_reflections_tpu.scene.gaussian_scene import (
    build_frames,
    from_arrays,
)
from editable_gaussian_reflections_tpu.ops.culling import (
    cluster_bounds,
    morton_order,
    select_candidates,
)
from editable_gaussian_reflections_tpu.ops.pallas.render_kernel import (
    unpack_composite,
)
from editable_gaussian_reflections_tpu.ops.pallas.render_kernel_v3 import (
    pallas_render_culled_v4,
)
from editable_gaussian_reflections_tpu.ops.pallas.trace_kernel import (
    pack_frames,
)


def _random_scene(rng, n_near=48, n_far=24, pad=128):
    """Near blob at z~5 plus a far cloud at radius ~40."""
    shell = rng.normal(size=(n_far, 3))
    shell = shell / np.linalg.norm(shell, axis=1, keepdims=True) * 40.0
    xyz = np.concatenate([
        rng.normal(0, 1.5, (n_near, 3)) + [0, 0, 5],
        shell,
    ]).astype(np.float32)
    n = n_near + n_far
    nrm = rng.normal(size=(n, 3))
    nrm /= np.linalg.norm(nrm, axis=1, keepdims=True)
    return from_arrays(
        xyz=xyz,
        scaling=rng.uniform(np.log(0.3), np.log(1.2), (n, 3)).astype(
            np.float32),
        rotation=np.tile(np.array([1, 0, 0, 0], np.float32), (n, 1)),
        opacity=rng.uniform(-1.5, 0.5, n).astype(np.float32),
        diffuse=rng.uniform(0, 1, (n, 3)).astype(np.float32),
        normal=nrm.astype(np.float32),
        f0=np.full((n, 3), 0.04, np.float32),
        roughness=rng.uniform(0.1, 0.9, n).astype(np.float32),
        pad_multiple=pad,
    )


CAMERA = CameraParams(
    origin=jnp.zeros(3),
    c2w=jnp.asarray(np.diag([1.0, 1.0, -1.0]).astype(np.float32)),
    fov_y=jnp.asarray(0.9),
    znear=jnp.asarray(0.1),
    zfar=jnp.asarray(100.0),
)


def test_kernel_t_window_partition_combines_exactly():
    """near(t<ts) + ts-gated far(t>ts) == single pass, for an ARBITRARY
    per-ray t_split (not even sphere-consistent): the partition identity
    holds ray-by-ray."""
    rng = np.random.default_rng(1)
    scene = _random_scene(rng)
    settings = RenderSettings(transmittance_threshold=1e-8)
    frames, attrs = build_frames(
        scene, settings.alpha_threshold, settings.exp_power,
        settings.global_scale_factor)
    perm = morton_order(frames)
    frames = jax.tree_util.tree_map(lambda a: a[perm], frames)
    attrs = jax.tree_util.tree_map(lambda a: a[perm], attrs)
    bounds = cluster_bounds(frames, 128)
    gpack = pack_frames(frames, attrs)

    R, tile = 512, 256
    rays_o = rng.normal(0, 0.5, (R, 3)).astype(np.float32)
    rays_d = rng.normal(size=(R, 3)).astype(np.float32)
    rays_d /= np.linalg.norm(rays_d, axis=1, keepdims=True)
    # arbitrary positive per-ray split distances spanning both regions
    t_split = jnp.asarray(
        rng.uniform(2.0, 60.0, R).astype(np.float32))

    def pass_(wmode, cull_near, cull_far):
        cands, cnear, num, _, _ = select_candidates(
            jnp.asarray(rays_o), jnp.asarray(rays_d), bounds,
            cull_near, cull_far, tile=tile, max_clusters=8)
        out = pallas_render_culled_v4(
            jnp.asarray(rays_o), jnp.asarray(rays_d), gpack, cands, cnear,
            num, CAMERA.znear, CAMERA.zfar, 3.0, jnp.float32(0.0),
            settings.backfacing_max_dist,
            settings.backfacing_invalid_normal_threshold,
            transmittance_threshold=settings.transmittance_threshold,
            max_hits=32, cluster=128, tile=tile, interpret=True,
            t_split=t_split, window_mode=wmode)
        return unpack_composite(out)

    single = pass_(0, CAMERA.znear, CAMERA.zfar)
    ts_tiles = t_split.reshape(-1, tile)
    near_p = pass_(1, CAMERA.znear, jnp.max(ts_tiles, axis=1))
    far_p = pass_(2, jnp.min(ts_tiles, axis=1), CAMERA.zfar)

    fTn = near_p["full_T"]
    np.testing.assert_allclose(
        np.asarray(near_p["rgb"] + fTn[:, None] * far_p["rgb"]),
        np.asarray(single["rgb"]), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(near_p["depth"] + fTn * far_p["depth"]),
        np.asarray(single["depth"]), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(fTn * far_p["full_T"]),
        np.asarray(single["full_T"]), rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(
        np.asarray(near_p["T_final"] * far_p["T_final"]),
        np.asarray(single["T_final"]), rtol=1e-5, atol=1e-7)


@pytest.mark.parametrize("bounces", [0, 2])
def test_frame_split_far_matches_single_pass(bounces):
    """render_frame_fused(split_far=True) == split_far=False when both
    passes have ample K/mc capacity (auto sphere, full bounce loop with
    the GGX epilogue and starved-ray plumbing)."""
    rng = np.random.default_rng(2)
    scene = _random_scene(rng)
    settings = RenderSettings(transmittance_threshold=1e-8)
    kw = dict(num_bounces=bounces, max_hits=16, jitter=False,
              cull_cluster=128, max_clusters=8, interpret=True,
              rays_per_call=1024)
    s0, f0 = render_frame_fused(scene, CAMERA, settings,
                                jax.random.PRNGKey(0), 32, 32,
                                split_far=False, **kw)
    # max_hits_far=8 != near K: exercises the per-pass k-buffer depth (the
    # sparse shell never exceeds it, so equality still holds)
    s1, f1 = render_frame_fused(scene, CAMERA, settings,
                                jax.random.PRNGKey(0), 32, 32,
                                split_far=True, mc_far=8, max_hits_far=8,
                                **kw)
    np.testing.assert_allclose(np.asarray(f1), np.asarray(f0),
                               rtol=1e-5, atol=1e-5)
    for name in ("rgb", "depth", "transmittance", "total_transmittance",
                 "normal", "roughness", "alive"):
        np.testing.assert_allclose(
            np.asarray(getattr(s1, name)), np.asarray(getattr(s0, name)),
            rtol=1e-5, atol=1e-5, err_msg=name)


@pytest.mark.parametrize("bounces", [0, 2])
def test_training_split_far_matches_single_pass_grads(bounces):
    """render_tile_with_grads_fused(split_far=True): merged near+far slots
    must reproduce the single-pass forward AND loss-fused gradients when
    both passes have capacity (thr tiny so the aliveness gate never
    diverges; at saturation the split intentionally truncates full_T like
    the reference PPLL loop does)."""
    from editable_gaussian_reflections_tpu.ops.pallas.render_kernel import (
        pack_attr_table,
        pack_frame_table,
    )
    from editable_gaussian_reflections_tpu.ops.pallas.trace_kernel import (
        pack_frames,
    )
    from editable_gaussian_reflections_tpu.renderer.raytracer import (
        RayTargets,
        render_tile_with_grads_fused,
    )

    rng = np.random.default_rng(4)
    scene = _random_scene(rng)
    settings = RenderSettings(transmittance_threshold=1e-8)
    frames, attrs = build_frames(
        scene, settings.alpha_threshold, settings.exp_power,
        settings.global_scale_factor)
    perm = morton_order(frames)
    frames = jax.tree_util.tree_map(lambda a: a[perm], frames)
    attrs = jax.tree_util.tree_map(lambda a: a[perm], attrs)
    scene_s = jax.tree_util.tree_map(lambda a: a[perm], scene)
    bounds = cluster_bounds(frames, 128)
    gpack = pack_frames(frames, attrs)
    table = pack_attr_table(attrs)
    ftable = pack_frame_table(frames, scene_s)

    R = 512
    rays_o = jnp.asarray(rng.normal(0, 0.5, (R, 3)).astype(np.float32))
    rays_d = rng.normal(size=(R, 3)).astype(np.float32)
    rays_d = jnp.asarray(rays_d / np.linalg.norm(rays_d, axis=1,
                                                 keepdims=True))
    targets = RayTargets(
        diffuse=jnp.asarray(rng.uniform(0, 1, (R, 3)), jnp.float32),
        specular=jnp.asarray(rng.uniform(0, 0.3, (R, 3)), jnp.float32),
        depth=jnp.asarray(rng.uniform(1, 5, (R,)), jnp.float32),
        normal=jnp.asarray(rng.normal(size=(R, 3)), jnp.float32),
        roughness=jnp.asarray(rng.uniform(0, 1, (R,)), jnp.float32),
        f0=jnp.asarray(rng.uniform(0, 1, (R, 3)), jnp.float32))
    key = jax.random.PRNGKey(7)
    kw = dict(gpack=gpack, table=table, ftable=ftable, bounds=bounds,
              cull_tile=256, cull_cluster=128, max_clusters=8,
              n_capacity=scene.capacity, interpret=True)
    s0, f0, g0 = render_tile_with_grads_fused(
        rays_o, rays_d, targets, settings, jnp.float32(0.1),
        jnp.float32(100.0), key, bounces, 16, split_far=False, **kw)
    s1, f1, g1 = render_tile_with_grads_fused(
        rays_o, rays_d, targets, settings, jnp.float32(0.1),
        jnp.float32(100.0), key, bounces, 16, split_far=True, mc_far=8,
        max_hits_far=16, **kw)
    np.testing.assert_allclose(np.asarray(f1), np.asarray(f0),
                               rtol=1e-5, atol=1e-5)
    for name in ("rgb", "depth", "transmittance", "total_transmittance",
                 "normal", "roughness"):
        np.testing.assert_allclose(
            np.asarray(getattr(s1, name)), np.asarray(getattr(s0, name)),
            rtol=1e-5, atol=1e-5, err_msg=name)
    for f in g0._fields:
        a, b = np.asarray(getattr(g1, f)), np.asarray(getattr(g0, f))
        scale = max(1e-6, np.abs(b).max())
        np.testing.assert_allclose(a, b, rtol=2e-4, atol=2e-5 * scale,
                                   err_msg=f"grads.{f}")


def test_split_far_saturated_rays_skip_far_pass():
    """A ray saturated by the near pass must composite NOTHING from the far
    pass (aliveness gate == the reference's PPLL saturation stop), and the
    combine must leave its color exactly the near color."""
    rng = np.random.default_rng(3)
    # opaque near wall + bright far shell behind it
    n_wall = 64
    xyz = np.concatenate([
        (rng.uniform(-4, 4, (n_wall, 3)) * [1, 1, 0] + [0, 0, 6]),
        (lambda v: v / np.linalg.norm(v, axis=1, keepdims=True) * 40.0)(
            rng.normal(size=(64, 3))),
    ]).astype(np.float32)
    n = xyz.shape[0]
    nrm = np.tile(np.array([0, 0, -1], np.float32), (n, 1))
    scene = from_arrays(
        xyz=xyz,
        scaling=np.full((n, 3), np.log(1.0), np.float32),
        rotation=np.tile(np.array([1, 0, 0, 0], np.float32), (n, 1)),
        opacity=np.concatenate([
            np.full(n_wall, 8.0, np.float32),          # opaque wall
            np.full(n - n_wall, 8.0, np.float32),
        ]),
        diffuse=np.concatenate([
            np.zeros((n_wall, 3), np.float32),          # black wall
            np.ones((n - n_wall, 3), np.float32),       # bright shell
        ]),
        normal=nrm, f0=np.full((n, 3), 0.04, np.float32),
        roughness=np.full(n, 0.5, np.float32), pad_multiple=128)
    settings = RenderSettings()  # default threshold 0.01: wall saturates
    kw = dict(num_bounces=0, max_hits=16, jitter=False, cull_cluster=128,
              max_clusters=8, interpret=True, rays_per_call=1024)
    s1, f1 = render_frame_fused(scene, CAMERA, settings,
                                jax.random.PRNGKey(0), 32, 32,
                                split_far=True, mc_far=8, **kw)
    f1 = np.asarray(f1).reshape(32, 32, 3)
    tt = np.asarray(s1.total_transmittance)[0].reshape(32, 32)
    # center rays hit the wall: saturated, and stay black (no shell leak)
    assert tt[16, 16] < 0.01
    assert np.all(f1[12:20, 12:20] < 1e-3)
