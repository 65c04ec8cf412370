"""v7 quadric-MXU pair math vs the direct v6 algebra.

v7 keeps v6's streaming scan composite bit-for-bit (same candidate order,
same saturation/exit logic) and only replaces the per-pair intersection
algebra with expanded quadratic forms evaluated by MXU dots.  So unlike
the v6-vs-exact tests, these are EQUALITY tests against v6 itself: the
only admissible difference is the floating-point error of the expanded
form, which grows as eps * (|mu - center| / scale)^2 in unit-sphere
units - pinned here with a deliberately far-offset small-scale scene.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from editable_gaussian_reflections_tpu.ops.pallas.render_kernel_v6 import (
    pallas_render_culled_v6,
)
from editable_gaussian_reflections_tpu.ops.pallas.render_kernel_v7 import (
    pack_quadric_lanes,
    pallas_render_culled_v7,
)
from editable_gaussian_reflections_tpu.ops.pallas.trace_kernel import (
    pack_frames,
)
from tests.test_render_kernel import _rays, _room
from tests.test_render_kernel_v5 import _run


def _assert_close(a, b, atol, keys=("rgb", "normal", "f0", "roughness",
                                    "depth", "T_final", "full_T")):
    for k in keys:
        np.testing.assert_allclose(np.asarray(a[k]), np.asarray(b[k]),
                                   atol=atol, rtol=1e-3, err_msg=k)


@pytest.mark.parametrize("cluster", [32, 64])
@pytest.mark.parametrize("secondary", [0.0, 1.0])
def test_v7_matches_v6(cluster, secondary):
    scene, frames, attrs = _room(1024)
    rays_o, rays_d = _rays()
    if secondary:
        key = jax.random.PRNGKey(3)
        rays_d = jax.random.normal(key, rays_d.shape)
        rays_d = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
    kw = dict(cluster=cluster, tile=128, exhaustive=True, thr=1e-8,
              secondary=secondary, secondary_static=int(secondary))
    ref = _run(pallas_render_culled_v6, frames, attrs, rays_o, rays_d, **kw)
    out = _run(pallas_render_culled_v7, frames, attrs, rays_o, rays_d, **kw)
    # 4e-3: the expanded-quadratic rounding envelope measured across
    # backends (CPU-interpret peaks ~1.5e-3; TPU MXU dots peak ~2.7e-3)
    _assert_close(out, ref, atol=4e-3)
    # traversal counters identical (validity decisions agree)
    np.testing.assert_allclose(np.asarray(out["num_traversed"]),
                               np.asarray(ref["num_traversed"]))


def test_v7_matches_v6_culled_with_windows_and_alive():
    scene, frames, attrs = _room(1024)
    rays_o, rays_d = _rays()
    alive = (jnp.arange(rays_o.shape[0]) % 3 != 0)
    t_split = jnp.full((rays_o.shape[0],), 6.0, jnp.float32)
    for wmode in (1, 2):
        kw = dict(cluster=32, tile=128, alive=alive, t_split=t_split,
                  window_mode=wmode, secondary_static=0)
        ref = _run(pallas_render_culled_v6, frames, attrs, rays_o, rays_d,
                   **kw)
        out = _run(pallas_render_culled_v7, frames, attrs, rays_o, rays_d,
                   **kw)
        _assert_close(out, ref, atol=2e-3)
    dead = ~np.asarray(alive)
    assert np.all(np.asarray(out["rgb"])[dead] == 0.0)


def test_v7_far_offset_precision():
    """Scene translated far from the expansion center: the documented
    worst case for the expanded quadratic forms.  Center tracks the scene
    (valid-mass mean), so a global translation must cost ~nothing; the
    residual error comes from the scene's own spread / scale ratio."""
    scene, frames, attrs = _room(1024)
    shift = jnp.asarray([50.0, -30.0, 20.0], jnp.float32)
    frames = frames._replace(mean=frames.mean + shift[None])
    rays_o, rays_d = _rays()
    rays_o = rays_o + shift[None]
    kw = dict(cluster=32, tile=128, exhaustive=True, thr=1e-8,
              secondary_static=0)
    ref = _run(pallas_render_culled_v6, frames, attrs, rays_o, rays_d, **kw)
    out = _run(pallas_render_culled_v7, frames, attrs, rays_o, rays_d, **kw)
    _assert_close(out, ref, atol=5e-3, keys=("rgb", "T_final", "full_T"))


def test_frame_scanq_matches_scan():
    """render_frame_fused(composite_mode="scanq") == "scan" through the
    full bounce loop (same streaming order; only the pair-math generator
    differs)."""
    from editable_gaussian_reflections_tpu.renderer.raytracer import (
        CameraParams,
        RenderSettings,
        render_frame_fused,
    )
    from editable_gaussian_reflections_tpu.scene.gaussian_scene import (
        from_arrays,
    )
    from editable_gaussian_reflections_tpu.utils.synth import (
        room_camera,
        room_scene,
    )

    scene = from_arrays(**room_scene(512), pad_multiple=128)
    eye, c2w = room_camera()
    camera = CameraParams(
        origin=jnp.asarray(eye), c2w=jnp.asarray(c2w),
        fov_y=jnp.asarray(0.9), znear=jnp.asarray(0.05),
        zfar=jnp.asarray(50.0))
    kw = dict(num_bounces=1, max_hits=16, jitter=False, cull_cluster=32,
              max_clusters=16, interpret=True, rays_per_call=1024)
    s0, f0 = render_frame_fused(scene, camera, RenderSettings(),
                                jax.random.PRNGKey(0), 32, 32,
                                composite_mode="scan", **kw)
    s1, f1 = render_frame_fused(scene, camera, RenderSettings(),
                                jax.random.PRNGKey(0), 32, 32,
                                composite_mode="scanq", **kw)
    np.testing.assert_allclose(np.asarray(f1), np.asarray(f0),
                               rtol=1e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(s1.transmittance),
                               np.asarray(s0.transmittance),
                               rtol=1e-3, atol=2e-3)


def test_pack_quadric_reproduces_direct_dots():
    """The packed weight rows evaluate d^T S d / rel^T S d / rel^T S rel /
    nrm^T M d identically to the direct local-frame algebra on random
    gaussians and rays."""
    scene, frames, attrs = _room(256)
    gpack = pack_frames(frames, attrs)
    tq, center = pack_quadric_lanes(gpack)
    tq = np.asarray(tq)
    key = jax.random.PRNGKey(0)
    o = jax.random.normal(key, (16, 3)) * 3.0
    d = jax.random.normal(jax.random.fold_in(key, 1), (16, 3))

    gp = np.asarray(gpack)
    mean, rot, inv = gp[0:3].T, gp[3:12].T, gp[12:15].T
    nrm = gp[17:20].T
    n = mean.shape[0]
    M = np.zeros((n, 3, 3), np.float32)
    for i in range(3):
        for j in range(3):
            M[:, i, j] = inv[:, i] * rot[:, 3 * j + i]

    on = np.asarray(o) - np.asarray(center)[None]
    for gi in (0, 7, 100):
        rel = on[:, :] - (mean[gi] - np.asarray(center))[None]
        lo = rel @ M[gi].T
        ld = np.asarray(d) @ M[gi].T
        S = M[gi].T @ M[gi]
        dd6 = np.stack([d[:, 0] * d[:, 0], d[:, 1] * d[:, 1],
                        d[:, 2] * d[:, 2], d[:, 0] * d[:, 1],
                        d[:, 0] * d[:, 2], d[:, 1] * d[:, 2]], axis=1)
        od6 = np.stack([on[:, 0] * d[:, 0], on[:, 1] * d[:, 1],
                        on[:, 2] * d[:, 2],
                        on[:, 0] * d[:, 1] + on[:, 1] * d[:, 0],
                        on[:, 0] * d[:, 2] + on[:, 2] * d[:, 0],
                        on[:, 1] * d[:, 2] + on[:, 2] * d[:, 1]], axis=1)
        oo6 = np.stack([on[:, 0] ** 2, on[:, 1] ** 2, on[:, 2] ** 2,
                        on[:, 0] * on[:, 1], on[:, 0] * on[:, 2],
                        on[:, 1] * on[:, 2]], axis=1)
        ll = dd6 @ tq[gi, 32:38]
        ol = np.concatenate([od6, d], axis=1) @ tq[gi, 38:47]
        oo = (np.concatenate([oo6, on, np.ones((16, 1), np.float32)], axis=1)
              @ tq[gi, 47:57])
        nd = np.asarray(d) @ tq[gi, 57:60]
        np.testing.assert_allclose(ll, np.sum(ld * ld, -1), rtol=2e-5,
                                   atol=1e-6)
        np.testing.assert_allclose(ol, np.sum(lo * ld, -1), rtol=1e-4,
                                   atol=1e-4)
        np.testing.assert_allclose(oo, np.sum(lo * lo, -1), rtol=1e-4,
                                   atol=1e-4)
        np.testing.assert_allclose(nd, ld @ nrm[gi], rtol=1e-4, atol=1e-5)
        assert abs(S[0, 0] - tq[gi, 32]) < 1e-5 * max(1.0, abs(S[0, 0]))


def test_v7_stats_off_and_attr_precision():
    """kernel_stats=False must zero the diagnostic counters and change
    NOTHING else; attr_precision="high" (3-pass attribute dot - the
    compositing weights are non-negative, no cancellation) must stay
    within the same rounding envelope as the v6 pin."""
    scene, frames, attrs = _room(1024)
    rays_o, rays_d = _rays()
    kw = dict(cluster=32, tile=128, exhaustive=True, thr=1e-8,
              secondary_static=0)
    ref = _run(pallas_render_culled_v7, frames, attrs, rays_o, rays_d, **kw)
    ns = _run(pallas_render_culled_v7, frames, attrs, rays_o, rays_d,
              stats=False, **kw)
    _assert_close(ns, ref, atol=0.0)  # bit-identical outputs
    assert np.all(np.asarray(ns["num_traversed"]) == 0)
    assert np.all(np.asarray(ns["num_accumulated"]) == 0)
    assert np.any(np.asarray(ref["num_traversed"]) > 0)
    # bf16 = single-pass attribute dot (Mosaic supports no intermediate
    # precision); loose tolerance covers the true-bf16 hardware runs -
    # interpret mode computes it in f32 so the CPU delta is ~0
    bf = _run(pallas_render_culled_v7, frames, attrs, rays_o, rays_d,
              attr_precision="bf16", **kw)
    _assert_close(bf, ref, atol=3e-2)


def test_frame_scanq_stats_off_matches():
    """render_frame_fused(kernel_stats=False) - the inference-FPS
    configuration - must render the identical frame."""
    from editable_gaussian_reflections_tpu.renderer.raytracer import (
        CameraParams,
        RenderSettings,
        render_frame_fused,
    )
    from editable_gaussian_reflections_tpu.scene.gaussian_scene import (
        from_arrays,
    )
    from editable_gaussian_reflections_tpu.utils.synth import (
        room_camera,
        room_scene,
    )

    scene = from_arrays(**room_scene(512), pad_multiple=128)
    eye, c2w = room_camera()
    camera = CameraParams(
        origin=jnp.asarray(eye), c2w=jnp.asarray(c2w),
        fov_y=jnp.asarray(0.9), znear=jnp.asarray(0.05),
        zfar=jnp.asarray(50.0))
    kw = dict(num_bounces=1, max_hits=16, jitter=False, cull_cluster=32,
              max_clusters=16, interpret=True, rays_per_call=1024)
    s0, f0 = render_frame_fused(scene, camera, RenderSettings(),
                                jax.random.PRNGKey(0), 32, 32,
                                composite_mode="scanq", **kw)
    s1, f1 = render_frame_fused(scene, camera, RenderSettings(),
                                jax.random.PRNGKey(0), 32, 32,
                                composite_mode="scanq", kernel_stats=False,
                                **kw)
    np.testing.assert_array_equal(np.asarray(f0), np.asarray(f1))
    np.testing.assert_array_equal(np.asarray(s0.overflow),
                                  np.asarray(s1.overflow))


def test_unknown_composite_mode_raises():
    """A typo'd composite_mode must fail loudly at trace time instead of
    silently rendering with the k-buffer kernels (ADVICE r4)."""
    import pytest

    from editable_gaussian_reflections_tpu.renderer.raytracer import (
        CameraParams,
        RenderSettings,
        render_frame_fused,
    )
    from editable_gaussian_reflections_tpu.scene.gaussian_scene import (
        from_arrays,
    )
    from editable_gaussian_reflections_tpu.utils.synth import (
        room_camera,
        room_scene,
    )

    scene = from_arrays(**room_scene(512), pad_multiple=128)
    eye, c2w = room_camera()
    camera = CameraParams(
        origin=jnp.asarray(eye), c2w=jnp.asarray(c2w),
        fov_y=jnp.asarray(0.9), znear=jnp.asarray(0.05),
        zfar=jnp.asarray(50.0))
    with pytest.raises(ValueError, match="composite_mode"):
        render_frame_fused(scene, camera, RenderSettings(),
                           jax.random.PRNGKey(0), 32, 32, num_bounces=1,
                           max_hits=16, jitter=False, cull_cluster=32,
                           max_clusters=16, interpret=True,
                           rays_per_call=1024, composite_mode="scnaq")
