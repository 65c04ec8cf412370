"""Screen-space instanced ellipsoid rasterizer - the TPU-native analog of the
reference's OpenGL ``EllipsoidViewer`` widget
(viewer/widgets/ellipsoid_viewer.py:1-426).

The GL widget draws one instanced box per Gaussian and ray-intersects the
exact ellipsoid in the fragment shader, with a z-buffer and two stages:

  stage 0 (solid):    alpha >= alpha_limit, depth-tested opaque,
                      color = max(0.5, dot(-dir, n)) * (rgb + 0.05) * 3
  stage 1 (floaters): alpha < alpha_limit, additive blend at 0.05 weight,
                      depth-tested against the solid z-buffer, no depth write
                      (ellipsoid_viewer.py:373-382: GL_SRC_ALPHA/GL_ONE)

A TPU has no rasterizer hardware, so the idiomatic equivalent is a
screen-tile z-buffer pass: test each ellipsoid's bounding sphere against
every 16x16-pixel tile's view cone, select the nearest ``max_per_tile``
candidates per tile (a chunked streaming top-k, so memory stays bounded for
any N), then resolve each tile's pixels against its candidate list with the
same exact ray-ellipsoid quadratic the fragment shader uses.  Everything is
static-shape and fori/scan based so XLA compiles one fused program; the
whole pass is a few ms - this is the viewer's interactive preview mode.

Differences from GL, by construction:
  - candidate lists are capped at ``max_per_tile`` nearest ellipsoids per
    tile (GL has no cap); the cap prioritizes by near-edge depth so the
    visible front surface is preserved - same spirit as the tracer's K-cap.
  - stage-1 floaters blend additively exactly like GL (order-independent),
    but only the nearest ``max_per_tile`` floaters per tile contribute.
  - RGBA8 clamping happens once at the end instead of per fragment write.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .camera_rays import primary_ray_directions
from .quaternion import quat_to_rotmat


class RasterOutput(NamedTuple):
    rgb: jnp.ndarray     # [H, W, 3] clamped display color (black background)
    depth: jnp.ndarray   # [H, W] view-axis depth of the solid hit (0 = none)
    gid: jnp.ndarray     # [H, W] int32 Gaussian index of the solid hit (-1)
    normal: jnp.ndarray  # [H, W, 3] world-space surface normal of the hit


def _tile_pixels(arr, th, tw, tile):
    """[H, W, ...] -> [T, tile*tile, ...] row-major tiles."""
    lead = (th, tile, tw, tile) + arr.shape[2:]
    x = arr.reshape(lead)
    x = jnp.moveaxis(x, 2, 1)  # [th, tw, tile, tile, ...]
    return x.reshape((th * tw, tile * tile) + arr.shape[2:])


def _untile_pixels(arr, th, tw, tile, height, width):
    """[T, tile*tile, ...] -> [H, W, ...]."""
    x = arr.reshape((th, tw, tile, tile) + arr.shape[2:])
    x = jnp.moveaxis(x, 2, 1)
    return x.reshape((height, width) + arr.shape[2:])


def _select_candidates(centers, r_bound, cam_center, dirs_t, mask,
                       max_per_tile, chunk):
    """Per-tile nearest-``max_per_tile`` candidate ids via a streaming top-k.

    Visibility is a tile-cone vs bounding-sphere test (the same shape as the
    tracer's cull-tile cones, ops/culling.py): a sphere is a candidate for a
    tile iff the angle between the tile's mean ray axis and the direction to
    the sphere center is at most the tile's half-angle plus the sphere's
    angular radius asin(r / dist).  Unlike a screen-space rectangle bound,
    this never degenerates for centers near the image plane (a sphere beside
    the camera would otherwise get a near-zero z-edge, an unbounded pixel
    radius, and flood - and with nearest-first priority EVICT - every
    tile's candidate list).  Priority is nearest possible hit (dist - r).

    Returns (ids [T, M] int32, valid [T, M] bool).
    """
    n = centers.shape[0]
    t_count = dirs_t.shape[0]
    pad = (-n) % chunk
    if pad:
        centers = jnp.pad(centers, ((0, pad), (0, 0)))
        r_bound = jnp.pad(r_bound, (0, pad))
        mask = jnp.pad(mask, (0, pad))
    n_pad = n + pad

    axis = jnp.mean(dirs_t, axis=1)
    axis = axis / jnp.maximum(
        jnp.linalg.norm(axis, axis=-1, keepdims=True), 1e-12)
    cos_half = jnp.clip(
        jnp.min(jnp.einsum("tpi,ti->tp", dirs_t, axis), axis=1), -1.0, 1.0)
    sin_half = jnp.sqrt(jnp.maximum(1.0 - cos_half * cos_half, 0.0))  # [T]

    def body(carry, start):
        best_v, best_i = carry
        sl = lambda a: jax.lax.dynamic_slice_in_dim(a, start, chunk)
        to_c = sl(centers) - cam_center[None, :]             # [C, 3]
        dist = jnp.linalg.norm(to_c, axis=-1)
        dirn = to_c / jnp.maximum(dist, 1e-12)[:, None]
        cosg = jnp.einsum("ti,ci->tc", axis, dirn)           # [T, C]
        r = sl(r_bound)
        # angle(axis, center) <= half + asin(r/dist), evaluated in cosine
        # space (exact: both sides are in [0, pi], where cos is monotone;
        # half < pi/2 and asin <= pi/2 keep the sum <= pi) - no per-element
        # transcendentals on the [T, C] grid
        sin_r = jnp.clip(r / jnp.maximum(dist, 1e-12), 0.0, 1.0)
        cos_r = jnp.sqrt(jnp.maximum(1.0 - sin_r * sin_r, 0.0))
        cos_sum = (cos_half[:, None] * cos_r[None, :]
                   - sin_half[:, None] * sin_r[None, :])
        overlap = (
            ((cosg >= cos_sum) | (dist <= r)[None, :])
            & sl(mask)[None, :]
        )
        prio = jnp.maximum(dist - r, 0.0)
        vals = jnp.where(overlap, -prio[None, :], -jnp.inf)
        ids = (start + jnp.arange(chunk, dtype=jnp.int32))[None, :]
        ids = jnp.broadcast_to(ids, vals.shape)
        all_v = jnp.concatenate([best_v, vals], axis=1)
        all_i = jnp.concatenate([best_i, ids], axis=1)
        new_v, sel = jax.lax.top_k(all_v, max_per_tile)
        new_i = jnp.take_along_axis(all_i, sel, axis=1)
        return (new_v, new_i), None

    init = (
        jnp.full((t_count, max_per_tile), -jnp.inf, jnp.float32),
        jnp.zeros((t_count, max_per_tile), jnp.int32),
    )
    (best_v, best_i), _ = jax.lax.scan(
        body, init, jnp.arange(0, n_pad, chunk, dtype=jnp.int32))
    return best_i, best_v > -jnp.inf


def _shade_pass(cand_ids, cand_valid, dirs_t, dv_t, centers, quats, radii,
                colors, cam_center, znear, zfar, tmin_init,
                write_depth=True):
    """Resolve one stage's candidate lists against tile pixels.

    Returns (tmin [T,P] view depth of nearest hit or inf, rgb [T,P,3],
    gid [T,P], nrm [T,P,3], add [T,P,3] accumulated 0.05-weight shaded
    color).  ``write_depth=False`` makes the z-buffer read-only (stage 1:
    GL depth mask off, so every candidate in front of ``tmin_init``
    contributes to ``add``).
    """
    t_count, p_count = dirs_t.shape[:2]
    m = cand_ids.shape[1]

    def body(carry, j):
        tmin, rgb, gid, nrm, add = carry
        ids = cand_ids[:, j]
        ok = cand_valid[:, j]
        c = centers[ids]                   # [T, 3]
        rot = quat_to_rotmat(quats[ids])   # [T, 3, 3] world = R @ local
        rad = radii[ids]                   # [T, 3]
        col = colors[ids]                  # [T, 3]

        # exact ray-ellipsoid quadratic in the unit-sphere frame
        # (ellipsoid_viewer.py frag shader closestEllipsoidIntersection)
        rel = cam_center[None, :] - c
        o_l = jnp.einsum("tji,tj->ti", rot, rel) / rad          # [T, 3]
        d_l = jnp.einsum("tji,tpj->tpi", rot, dirs_t) / rad[:, None, :]
        a = jnp.sum(d_l * d_l, -1)
        b = 2.0 * jnp.sum(o_l[:, None, :] * d_l, -1)
        cc = (jnp.sum(o_l * o_l, -1) - 1.0)[:, None]
        disc = b * b - 4.0 * a * cc
        sq = jnp.sqrt(jnp.maximum(disc, 0.0))
        t1 = (-b - sq) / (2.0 * a)
        t2 = (-b + sq) / (2.0 * a)
        t = jnp.where(t1 * dv_t >= znear, t1, t2)  # camera-inside: far root
        depth = t * dv_t
        hit = (disc >= 0.0) & (depth >= znear) & (depth <= zfar) \
            & ok[:, None]

        u = o_l[:, None, :] + t[..., None] * d_l   # |u| = 1 at the surface
        n_l = u / rad[:, None, :]
        n_w = jnp.einsum("tij,tpj->tpi", rot, n_l)
        n_w = n_w / jnp.maximum(
            jnp.linalg.norm(n_w, axis=-1, keepdims=True), 1e-12)
        align = jnp.maximum(0.5, -jnp.sum(dirs_t * n_w, -1))
        shade = align[..., None] * (col[:, None, :] + 0.05) * 3.0

        front = hit & (depth < tmin)
        new_tmin = jnp.where(front, depth, tmin) if write_depth else tmin
        new_rgb = jnp.where(front[..., None], shade, rgb)
        new_gid = jnp.where(front, ids[:, None], gid)
        new_nrm = jnp.where(front[..., None], n_w, nrm)
        new_add = add + jnp.where(front[..., None], 0.05 * shade, 0.0)
        return (new_tmin, new_rgb, new_gid, new_nrm, new_add), None

    init = (
        tmin_init,
        jnp.zeros((t_count, p_count, 3), jnp.float32),
        jnp.full((t_count, p_count), -1, jnp.int32),
        jnp.zeros((t_count, p_count, 3), jnp.float32),
        jnp.zeros((t_count, p_count, 3), jnp.float32),
    )
    (tmin, rgb, gid, nrm, add), _ = jax.lax.scan(
        body, init, jnp.arange(m, dtype=jnp.int32))
    return tmin, rgb, gid, nrm, add


def rasterize_ellipsoids(centers, rotations, radii, colors, alphas, valid,
                         c2w_rotation, camera_center, fovy, width, height,
                         znear=0.01, zfar=1e6, alpha_limit=0.2,
                         render_floaters=False, max_per_tile=64, tile=16,
                         select_chunk=4096):
    """Rasterize N solid ellipsoids into an [H, W] frame (RasterOutput).

    centers [N,3], rotations [N,4] (unnormalized quats, scalar-first),
    radii [N,3] (final half-axes - the caller applies the widget's
    2 * scale * scaling_modifier), colors [N,3], alphas [N] (activated),
    valid [N] bool.  Camera matches ops.camera_rays conventions.
    width/height must be multiples of ``tile``.
    """
    if width % tile or height % tile:
        raise ValueError(f"width/height must be multiples of tile={tile}")
    th, tw = height // tile, width // tile
    rotations = rotations / jnp.maximum(
        jnp.linalg.norm(rotations, axis=-1, keepdims=True), 1e-12)

    dirs = primary_ray_directions(width, height, fovy, c2w_rotation)
    dirs_t = _tile_pixels(dirs, th, tw, tile)                # [T, P, 3]
    view = -c2w_rotation[:, 2]
    dv_t = dirs_t @ view                                     # [T, P]

    # bounding sphere per ellipsoid; basic depth eligibility (the cone test
    # inside _select_candidates does the per-tile visibility)
    rel = centers - camera_center[None, :]
    zdepth = -(rel @ c2w_rotation[:, 2])
    r_bound = jnp.max(radii, axis=-1)
    base_mask = (valid & ((zdepth + r_bound) > znear)
                 & ((zdepth - r_bound) < zfar))

    solid_ids, solid_ok = _select_candidates(
        centers, r_bound, camera_center, dirs_t,
        base_mask & (alphas >= alpha_limit), max_per_tile, select_chunk)
    t_count, p_count = dirs_t.shape[:2]
    inf_z = jnp.full((t_count, p_count), jnp.inf, jnp.float32)
    tmin, rgb, gid, nrm, _ = _shade_pass(
        solid_ids, solid_ok, dirs_t, dv_t, centers, rotations, radii,
        colors, camera_center, znear, zfar, inf_z)

    if render_floaters:
        # stage 1: additive 0.05-weight blend, depth-tested against the
        # solid z-buffer, no depth write (GL_SRC_ALPHA/GL_ONE, depth mask
        # off).  Additive blending is order-independent, so accumulating
        # every front-of-solid floater hit reproduces GL exactly (up to the
        # per-tile candidate cap).
        flt_ids, flt_ok = _select_candidates(
            centers, r_bound, camera_center, dirs_t,
            base_mask & (alphas < alpha_limit), max_per_tile, select_chunk)
        _, _, _, _, add = _shade_pass(
            flt_ids, flt_ok, dirs_t, dv_t, centers, rotations, radii,
            colors, camera_center, znear, zfar, tmin, write_depth=False)
        rgb = rgb + add

    hit = jnp.isfinite(tmin)
    rgb = jnp.clip(jnp.where(hit[..., None], rgb, 0.0), 0.0, 1.0)
    depth = jnp.where(hit, tmin, 0.0)
    return RasterOutput(
        rgb=_untile_pixels(rgb, th, tw, tile, height, width),
        depth=_untile_pixels(depth, th, tw, tile, height, width),
        gid=_untile_pixels(gid, th, tw, tile, height, width),
        normal=_untile_pixels(nrm, th, tw, tile, height, width),
    )


def rasterize_scene(scene, colors, c2w_rotation, camera_center, fovy,
                    width, height, scaling_modifier=0.5, **kwargs):
    """Widget-parameter convenience wrapper over a GaussianScene.

    Applies the EllipsoidViewer conventions: half-axes
    2 * exp(scaling) * scaling_modifier (default modifier 0.5, i.e. the
    1-sigma ellipsoid), alpha = sigmoid(opacity), valid = live_mask.
    """
    from .activations import sigmoid_act

    radii = 2.0 * jnp.exp(scene.scaling) * scaling_modifier
    return rasterize_ellipsoids(
        scene.xyz, scene.rotation, radii, colors,
        sigmoid_act(scene.opacity), scene.live_mask,
        c2w_rotation, camera_center, fovy, width, height, **kwargs)
