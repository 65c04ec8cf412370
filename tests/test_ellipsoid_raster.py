"""Ellipsoid rasterizer vs a brute-force per-pixel oracle.

The oracle mirrors the reference fragment shader's math
(viewer/widgets/ellipsoid_viewer.py closestEllipsoidIntersection + shading)
per pixel over ALL ellipsoids in float64 - no tiling, no candidate caps -
so it checks the whole screen-space pipeline (projection, tile candidate
selection, z-buffering, shading, floaters blend) at once.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from editable_gaussian_reflections_tpu.ops.ellipsoid_raster import (
    rasterize_ellipsoids,
)


def _quat_to_rot(q):
    q = q / np.linalg.norm(q)
    r, x, y, z = q
    return np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - r * z), 2 * (x * z + r * y)],
        [2 * (x * y + r * z), 1 - 2 * (x * x + z * z), 2 * (y * z - r * x)],
        [2 * (x * z - r * y), 2 * (y * z + r * x), 1 - 2 * (x * x + y * y)],
    ])


def _ray_dirs(width, height, fovy, c2w):
    vs = np.tan(fovy / 2)
    aspect = width / height
    iy, ix = np.mgrid[0:height, 0:width].astype(np.float64)
    y = vs * (1 - 2 * (iy + 0.5) / height)
    x = aspect * vs * (2 * (ix + 0.5) / width - 1)
    d = (c2w[:, 0] * x[..., None] + c2w[:, 1] * y[..., None] - c2w[:, 2])
    return d / np.linalg.norm(d, axis=-1, keepdims=True)


def _oracle(centers, quats, radii, colors, alphas, valid, c2w, origin, fovy,
            width, height, znear, zfar, alpha_limit, render_floaters):
    dirs = _ray_dirs(width, height, fovy, c2w)
    view = -c2w[:, 2]
    n = centers.shape[0]
    rgb = np.zeros((height, width, 3))
    depth = np.zeros((height, width))
    gid = np.full((height, width), -1, np.int64)
    tmin = np.full((height, width), np.inf)

    def hits(i):
        rot = _quat_to_rot(quats[i])
        o_l = rot.T @ (origin - centers[i]) / radii[i]
        d_l = (dirs @ rot) / radii[i]
        a = np.sum(d_l * d_l, -1)
        b = 2 * np.sum(o_l * d_l, -1)
        c = np.sum(o_l * o_l) - 1
        disc = b * b - 4 * a * c
        ok = disc >= 0
        sq = np.sqrt(np.maximum(disc, 0))
        t1 = (-b - sq) / (2 * a)
        t2 = (-b + sq) / (2 * a)
        dv = dirs @ view
        t = np.where(t1 * dv >= znear, t1, t2)
        d_ = t * dv
        ok &= (d_ >= znear) & (d_ <= zfar)
        u = o_l + t[..., None] * d_l
        n_w = (u / radii[i]) @ rot.T
        n_w /= np.maximum(np.linalg.norm(n_w, axis=-1, keepdims=True), 1e-12)
        align = np.maximum(0.5, -np.sum(dirs * n_w, -1))
        shade = align[..., None] * (colors[i] + 0.05) * 3.0
        return ok, d_, shade

    for i in range(n):
        if not (valid[i] and alphas[i] >= alpha_limit):
            continue
        ok, d_, shade = hits(i)
        front = ok & (d_ < tmin)
        tmin = np.where(front, d_, tmin)
        rgb = np.where(front[..., None], shade, rgb)
        gid = np.where(front, i, gid)
    if render_floaters:
        for i in range(n):
            if not (valid[i] and alphas[i] < alpha_limit):
                continue
            ok, d_, shade = hits(i)
            front = ok & (d_ < tmin)
            rgb = rgb + np.where(front[..., None], 0.05 * shade, 0.0)
    hit = np.isfinite(tmin)
    rgb = np.clip(np.where(hit[..., None], rgb, 0.0), 0, 1)
    depth = np.where(hit, tmin, 0.0)
    return rgb, depth, gid


def _random_scene(rng, n, spread=2.0):
    centers = rng.uniform(-spread, spread, (n, 3))
    centers[:, 2] -= 6.0  # in front of a camera at the origin looking -z
    quats = rng.normal(size=(n, 4))
    radii = rng.uniform(0.1, 0.8, (n, 3))
    colors = rng.uniform(0, 0.4, (n, 3))
    alphas = rng.uniform(0, 1, n)
    valid = rng.uniform(size=n) > 0.1
    return centers, quats, radii, colors, alphas, valid


CAM = dict(c2w=np.eye(3), origin=np.zeros(3), fovy=0.9,
           width=64, height=48, znear=0.05, zfar=100.0)


def _run_both(scene, alpha_limit=0.2, render_floaters=False, max_per_tile=64):
    centers, quats, radii, colors, alphas, valid = scene
    out = rasterize_ellipsoids(
        jnp.asarray(centers, jnp.float32), jnp.asarray(quats, jnp.float32),
        jnp.asarray(radii, jnp.float32), jnp.asarray(colors, jnp.float32),
        jnp.asarray(alphas, jnp.float32), jnp.asarray(valid),
        jnp.asarray(CAM["c2w"], jnp.float32),
        jnp.asarray(CAM["origin"], jnp.float32),
        CAM["fovy"], CAM["width"], CAM["height"],
        znear=CAM["znear"], zfar=CAM["zfar"], alpha_limit=alpha_limit,
        render_floaters=render_floaters, max_per_tile=max_per_tile,
        select_chunk=32)
    ref = _oracle(centers, quats, radii, colors, alphas, valid,
                  CAM["c2w"], CAM["origin"], CAM["fovy"],
                  CAM["width"], CAM["height"], CAM["znear"], CAM["zfar"],
                  alpha_limit, render_floaters)
    return out, ref


def _assert_match(out, ref, atol=2e-3, frac=0.995):
    rgb, depth, gid = ref
    # f32-vs-f64 disagreements at grazing silhouettes (disc ~ 0) can flip a
    # pixel between hit and miss, so require near-exact agreement on almost
    # every pixel rather than every pixel.
    rgb_ok = (np.abs(np.asarray(out.rgb) - rgb).max(-1) <= atol).mean()
    dep_ok = (np.abs(np.asarray(out.depth) - depth) <= atol).mean()
    gid_ok = (np.asarray(out.gid) == gid).mean()
    assert rgb_ok >= frac, f"rgb agreement {rgb_ok}"
    assert dep_ok >= frac, f"depth agreement {dep_ok}"
    assert gid_ok >= frac, f"gid agreement {gid_ok}"


def test_matches_oracle_solid():
    rng = np.random.default_rng(0)
    _assert_match(*_run_both(_random_scene(rng, 60)))


def test_matches_oracle_floaters():
    rng = np.random.default_rng(1)
    _assert_match(*_run_both(_random_scene(rng, 60), render_floaters=True))


def test_anisotropic_rotated():
    rng = np.random.default_rng(2)
    centers, quats, radii, colors, alphas, valid = _random_scene(rng, 40)
    radii[:, 0] *= 4.0   # strongly anisotropic
    _assert_match(*_run_both(
        (centers, quats, radii, colors, alphas, valid)))


def test_analytic_single_sphere():
    """Sphere of radius 1 straight ahead: center-pixel depth and shading."""
    centers = np.array([[0.0, 0.0, -5.0]])
    quats = np.array([[1.0, 0.0, 0.0, 0.0]])
    radii = np.ones((1, 3))
    colors = np.array([[0.2, 0.1, 0.0]])
    out, _ = _run_both((centers, quats, radii, colors,
                        np.ones(1), np.ones(1, bool)))
    h, w = CAM["height"] // 2, CAM["width"] // 2
    d = np.asarray(out.depth)[h, w]
    assert abs(d - 4.0) < 2e-2          # 5 - radius (center-pixel ray ~ axis)
    rgb = np.asarray(out.rgb)[h, w]
    # align ~ 1 head-on: color = (c + 0.05) * 3
    np.testing.assert_allclose(rgb, (colors[0] + 0.05) * 3, atol=2e-2)
    assert np.asarray(out.gid)[h, w] == 0
    # background stays black / no-hit
    assert np.asarray(out.gid)[0, 0] == -1
    assert np.asarray(out.depth)[0, 0] == 0.0


def test_occlusion_order():
    """A near sphere must occlude a far one regardless of array order."""
    centers = np.array([[0.0, 0.0, -8.0], [0.0, 0.0, -4.0]])
    quats = np.tile([1.0, 0, 0, 0], (2, 1))
    radii = np.full((2, 3), 0.5)
    colors = np.array([[0.3, 0.0, 0.0], [0.0, 0.3, 0.0]])
    out, _ = _run_both((centers, quats, radii, colors,
                        np.ones(2), np.ones(2, bool)))
    h, w = CAM["height"] // 2, CAM["width"] // 2
    assert np.asarray(out.gid)[h, w] == 1
    assert abs(np.asarray(out.depth)[h, w] - 3.5) < 2e-2


def test_camera_inside_uses_far_surface():
    centers = np.array([[0.0, 0.0, 0.0]])  # camera at the origin is inside
    quats = np.array([[1.0, 0.0, 0.0, 0.0]])
    radii = np.full((1, 3), 2.0)
    colors = np.array([[0.2, 0.2, 0.2]])
    out, _ = _run_both((centers, quats, radii, colors,
                        np.ones(1), np.ones(1, bool)))
    h, w = CAM["height"] // 2, CAM["width"] // 2
    assert np.asarray(out.gid)[h, w] == 0
    assert abs(np.asarray(out.depth)[h, w] - 2.0) < 2e-2


def test_matches_oracle_general_pose():
    """Rotated, off-origin camera: the identity-pose tests can't catch
    projection/culling convention bugs (a z-plane screen bound once passed
    them while flooding real poses)."""
    rng = np.random.default_rng(7)
    q = np.linalg.qr(rng.normal(size=(3, 3)))[0]
    if np.linalg.det(q) < 0:
        q[:, 0] = -q[:, 0]
    origin = rng.normal(size=3) * 2.0
    look = -q[:, 2]  # camera looks along -col2
    centers = (origin[None, :] + look[None, :] * rng.uniform(3, 8, (50, 1))
               + rng.normal(size=(50, 3)) * 1.2)
    quats = rng.normal(size=(50, 4))
    radii = rng.uniform(0.1, 0.7, (50, 3))
    colors = rng.uniform(0, 0.4, (50, 3))
    alphas = rng.uniform(0, 1, 50)
    valid = np.ones(50, bool)
    out = rasterize_ellipsoids(
        jnp.asarray(centers, jnp.float32), jnp.asarray(quats, jnp.float32),
        jnp.asarray(radii, jnp.float32), jnp.asarray(colors, jnp.float32),
        jnp.asarray(alphas, jnp.float32), jnp.asarray(valid),
        jnp.asarray(q, jnp.float32), jnp.asarray(origin, jnp.float32),
        CAM["fovy"], CAM["width"], CAM["height"],
        znear=CAM["znear"], zfar=CAM["zfar"], select_chunk=32)
    ref = _oracle(centers, quats, radii, colors, alphas, valid,
                  q, origin, CAM["fovy"], CAM["width"], CAM["height"],
                  CAM["znear"], CAM["zfar"], 0.2, False)
    assert (ref[2] >= 0).any(), "oracle saw nothing - bad test setup"
    _assert_match(out, ref)


def test_offscreen_crowd_does_not_evict():
    """Hundreds of spheres beside/behind the camera (outside every tile
    cone) must not consume candidate slots and evict the visible scene -
    the regression that motivated the cone visibility test."""
    rng = np.random.default_rng(8)
    crowd = rng.normal(size=(300, 3))
    crowd /= np.linalg.norm(crowd, axis=1, keepdims=True)
    crowd = crowd * 0.8 + np.array([0.0, 0.0, 1.5])  # behind (+z) & beside
    target = np.array([[0.0, 0.0, -5.0]])
    centers = np.concatenate([crowd, target])
    n = centers.shape[0]
    quats = np.tile([1.0, 0, 0, 0], (n, 1))
    radii = np.full((n, 3), 0.3)
    colors = np.full((n, 3), 0.2)
    out, _ = _run_both((centers, quats, radii, colors,
                        np.ones(n), np.ones(n, bool)),
                       max_per_tile=8)
    h, w = CAM["height"] // 2, CAM["width"] // 2
    assert np.asarray(out.gid)[h, w] == n - 1  # the visible target survives


def test_scene_wrapper():
    from editable_gaussian_reflections_tpu.ops.ellipsoid_raster import (
        rasterize_scene,
    )
    from editable_gaussian_reflections_tpu.scene.gaussian_scene import (
        from_arrays,
    )

    rng = np.random.default_rng(3)
    n = 20
    xyz = rng.uniform(-1, 1, (n, 3))
    xyz[:, 2] -= 5.0
    scene = from_arrays(
        xyz, np.log(rng.uniform(0.2, 0.5, (n, 3))), rng.normal(size=(n, 4)),
        np.full(n, 4.0), rng.uniform(0, 1, (n, 3)), rng.normal(size=(n, 3)),
        rng.uniform(0, 1, (n, 3)), rng.uniform(0, 1, n))
    out = rasterize_scene(
        scene, jnp.asarray(rng.uniform(0, 1, (n, 3)), jnp.float32),
        jnp.asarray(CAM["c2w"], jnp.float32),
        jnp.asarray(CAM["origin"], jnp.float32),
        CAM["fovy"], CAM["width"], CAM["height"])
    assert (np.asarray(out.gid) >= 0).any()
    assert np.isfinite(np.asarray(out.rgb)).all()
