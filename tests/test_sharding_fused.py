"""sharded_render_fused == render_frame_fused (the fused per-bounce kernel
path, incl. split-far) on the virtual 8-device mesh.

Shard-local re-sorts/culling only change which tile a ray shares its
candidate list with; per-ray culling is conservative, so with honest
budgets (K ample, no starvation) the hit set per ray is layout-invariant
and the outputs match up to float re-association of the transmittance
accumulation (rtol 1e-5)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from editable_gaussian_reflections_tpu.parallel.sharding import (
    make_mesh,
    sharded_render_fused,
)
from editable_gaussian_reflections_tpu.renderer.raytracer import (
    CameraParams,
    RenderSettings,
    render_frame_fused,
)
from editable_gaussian_reflections_tpu.scene.gaussian_scene import from_arrays


def _scene(rng, n_near=40, n_far=24, pad=128):
    shell = rng.normal(size=(n_far, 3))
    shell = shell / np.linalg.norm(shell, axis=1, keepdims=True) * 40.0
    xyz = np.concatenate([
        rng.normal(0, 1.5, (n_near, 3)) + [0, 0, 5], shell,
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


@pytest.mark.parametrize("split", [False, True])
def test_sharded_render_fused_matches_single_device(split):
    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device virtual mesh")
    rng = np.random.default_rng(5)
    scene = _scene(rng)
    camera = CameraParams(
        origin=jnp.zeros(3),
        c2w=jnp.asarray(np.diag([1.0, 1.0, -1.0]).astype(np.float32)),
        fov_y=jnp.asarray(0.9), znear=jnp.asarray(0.1),
        zfar=jnp.asarray(100.0))
    settings = RenderSettings(transmittance_threshold=1e-8)
    mesh = make_mesh(8)
    # 64x32 pixels: 8 shards x 256 rays = one 8x8-pixel tile group each
    kw = dict(num_bounces=2, max_hits=16, jitter=True, cull_cluster=128,
              max_clusters=8, interpret=True, rays_per_call=256,
              cull_tile_primary=64, cull_tile_secondary=64,
              split_far=split, mc_far=8)
    s0, f0 = render_frame_fused(scene, camera, settings,
                                jax.random.PRNGKey(3), 64, 32, **kw)
    s1, f1 = sharded_render_fused(mesh, scene, camera, settings,
                                  jax.random.PRNGKey(3), 64, 32, **kw)
    np.testing.assert_allclose(np.asarray(f1), np.asarray(f0),
                               rtol=1e-5, atol=1e-5)
    for name in ("rgb", "depth", "transmittance", "total_transmittance",
                 "normal", "alive"):
        np.testing.assert_allclose(
            np.asarray(getattr(s1, name)), np.asarray(getattr(s0, name)),
            rtol=1e-5, atol=1e-5, err_msg=name)
