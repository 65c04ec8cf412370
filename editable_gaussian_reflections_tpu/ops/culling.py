"""Spatial acceleration: Morton clustering + per-tile cone/sphere culling.

The TPU-native replacement for the reference's BVH (bvh_wrapper.h): instead
of a tree, Gaussians are sorted by Morton code of their means (one cheap XLA
sort per rebuild - the refit analog, gaussian_raytracer.py:139-140) and
grouped into fixed-size clusters with bounding spheres that include each
Gaussian's alpha-clipped ellipsoid extent.  Ray tiles are bounded by a cone
(apex sphere + direction cone); a cluster survives culling iff its sphere
intersects the tile's cone within [near, far].

All tests are fixed-shape [T, NC] masks -> per-tile top-MAXC candidate
cluster lists, consumed by the trace kernels via scalar-prefetch block
indexing (gather-free streaming of exactly the surviving clusters).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from .intersect import GaussianFrames


def morton_codes(points, lo, hi, bits: int = 10):
    """Quantize points into a [0, 2^bits)^3 grid and interleave bits."""
    q = jnp.clip(
        ((points - lo) / jnp.maximum(hi - lo, 1e-12) * (2**bits - 1)),
        0,
        2**bits - 1,
    ).astype(jnp.uint32)

    def spread(x):
        # spread 10 bits to every 3rd position
        x = (x | (x << 16)) & jnp.uint32(0x030000FF)
        x = (x | (x << 8)) & jnp.uint32(0x0300F00F)
        x = (x | (x << 4)) & jnp.uint32(0x030C30C3)
        x = (x | (x << 2)) & jnp.uint32(0x09249249)
        return x

    return (
        spread(q[:, 0]) | (spread(q[:, 1]) << 1) | (spread(q[:, 2]) << 2)
    )


def morton_order(frames: GaussianFrames) -> jnp.ndarray:
    """Permutation sorting live Gaussians by Morton code (dead ones last)."""
    live = frames.valid
    pts = frames.mean
    lo = jnp.min(jnp.where(live[:, None], pts, jnp.inf), axis=0)
    hi = jnp.max(jnp.where(live[:, None], pts, -jnp.inf), axis=0)
    codes = morton_codes(pts, lo, hi)
    key = jnp.where(live, codes, jnp.uint32(0xFFFFFFFF))
    return jnp.argsort(key)


def sort_within_clusters(frames: GaussianFrames, view_dir, cluster: int
                         ) -> jnp.ndarray:
    """Permutation depth-sorting gaussians WITHIN each `cluster`-sized group
    along `view_dir`, preserving cluster membership (so cluster_bounds and
    select_candidates outputs are unchanged).  Used by the v6 streaming
    scan-composite kernel: its per-chunk compositing follows table order,
    and a per-frame within-cluster depth sort tightens that toward true
    per-ray depth order (tests/test_render_kernel_v6.py measures the
    error reduction)."""
    n = frames.mean.shape[0]
    nc = n // cluster
    depth = frames.mean @ jnp.asarray(view_dir, jnp.float32)
    order = jnp.argsort(depth.reshape(nc, cluster), axis=1)
    base = (jnp.arange(nc, dtype=order.dtype) * cluster)[:, None]
    return (order + base).reshape(-1)


class ClusterBounds(NamedTuple):
    center: jnp.ndarray   # [NC, 3]
    radius: jnp.ndarray   # [NC]
    any_valid: jnp.ndarray  # [NC] bool


def cluster_bounds(frames: GaussianFrames, cluster: int = 256) -> ClusterBounds:
    """Bounding sphere per cluster of `cluster` consecutive Gaussians.

    Radius covers each member's ellipsoid: |mean - c| + max(sizes) where
    sizes = exp(scale)*sf (the alpha-threshold clip extent,
    bvh_wrapper.cu:49-58's AABB analog).
    """
    n = frames.mean.shape[0]
    assert n % cluster == 0, (n, cluster)
    nc = n // cluster
    mean = frames.mean.reshape(nc, cluster, 3)
    valid = frames.valid.reshape(nc, cluster)
    # per-gaussian max extent = max over axes of 1/inv_sizes (0 when dead)
    sizes = jnp.where(
        frames.inv_sizes > 0, 1.0 / jnp.maximum(frames.inv_sizes, 1e-30), 0.0
    )
    extent = jnp.max(sizes, axis=-1).reshape(nc, cluster)

    w = valid[..., None].astype(jnp.float32)
    cnt = jnp.maximum(jnp.sum(w, axis=1), 1.0)
    center = jnp.sum(mean * w, axis=1) / cnt
    dist = jnp.linalg.norm(mean - center[:, None, :], axis=-1)
    radius = jnp.max(jnp.where(valid, dist + extent, 0.0), axis=1)
    return ClusterBounds(center=center, radius=radius,
                         any_valid=jnp.any(valid, axis=1))


class TileCones(NamedTuple):
    origin: jnp.ndarray      # [T, 3] apex (mean ray origin)
    origin_radius: jnp.ndarray  # [T] max distance of any ray origin to apex
    axis: jnp.ndarray        # [T, 3] mean direction (normalized)
    cos_half: jnp.ndarray    # [T] cos of the cone half-angle


def tile_cones(rays_o, rays_d, tile: int) -> TileCones:
    """Bounding cone of each tile of `tile` consecutive rays."""
    R = rays_o.shape[0]
    assert R % tile == 0
    T = R // tile
    o = rays_o.reshape(T, tile, 3)
    d = rays_d.reshape(T, tile, 3)
    origin = jnp.mean(o, axis=1)
    origin_radius = jnp.max(
        jnp.linalg.norm(o - origin[:, None, :], axis=-1), axis=1
    )
    axis = jnp.mean(d, axis=1)
    axis = axis / jnp.maximum(jnp.linalg.norm(axis, axis=-1, keepdims=True),
                              1e-12)
    cos_half = jnp.min(jnp.sum(d * axis[:, None, :], axis=-1), axis=1)
    return TileCones(origin, origin_radius, axis, jnp.clip(cos_half, -1.0, 1.0))


def cone_sphere_visible(cones: TileCones, bounds: ClusterBounds,
                        near, far) -> jnp.ndarray:
    """[T, NC] conservative visibility: does the cluster sphere intersect the
    tile's (expanded) cone within the depth window?

    `near` / `far` may be scalars or per-tile [T] arrays (the split-far
    two-pass renderer bounds each pass's depth window per tile by the
    rays' split-sphere exit distances)."""
    near = jnp.asarray(near, jnp.float32)
    far = jnp.asarray(far, jnp.float32)
    if near.ndim == 1:
        near = near[:, None]
    if far.ndim == 1:
        far = far[:, None]
    rel = bounds.center[None, :, :] - cones.origin[:, None, :]   # [T, NC, 3]
    dist = jnp.linalg.norm(rel, axis=-1)                          # [T, NC]
    reff = bounds.radius[None, :] + cones.origin_radius[:, None]

    # depth window along the cone axis
    along = jnp.sum(rel * cones.axis[:, :, None].transpose(0, 2, 1), axis=-1)
    in_window = (along + reff > near) & (along - reff < far)

    # angle test: angle(rel, axis) <= half_angle + asin(reff/dist)
    cos_to = along / jnp.maximum(dist, 1e-12)
    sin_half = jnp.sqrt(jnp.maximum(1.0 - cones.cos_half**2, 0.0))[:, None]
    sin_extra = jnp.clip(reff / jnp.maximum(dist, 1e-12), 0.0, 1.0)
    cos_half = cones.cos_half[:, None]
    # cos(a+b) = cos a cos b - sin a sin b ; visible iff cos_to >= cos(a+b)
    cos_limit = cos_half * jnp.sqrt(jnp.maximum(1.0 - sin_extra**2, 0.0)) \
        - sin_half * sin_extra
    in_cone = cos_to >= cos_limit
    inside = dist <= reff  # apex inside the sphere

    return bounds.any_valid[None, :] & in_window & (in_cone | inside)


@partial(jax.jit, static_argnames=("tile", "max_clusters"))
def select_candidates(
    rays_o, rays_d, bounds: ClusterBounds, near, far,
    tile: int = 256, max_clusters: int = 64,
):
    """Per-tile candidate cluster lists, nearest-first along the tile axis.

    Overflow beyond max_clusters drops the FARTHEST clusters.  NOTE: dropped
    clusters are NOT covered by the compositor's truncated-tail correction -
    full_T only accumulates log-transmittance over chunks the kernel actually
    computed (render_kernel.py full_T accumulation), so their hits are simply
    absent.  The flag returned here is the raw per-TILE overflow; the render
    paths refine it per ray to the STARVED metric (raytracer._starved:
    overflowed AND the ray was still accumulating at list end - saturated
    rays truncate at the same point the reference's PPLL loop does), ride it
    on StepOutputs, and size max_clusters so starved stays ~0; bench.py and
    the parity run report it.
    Returns (candidates int32 [T, MC] (-1 = empty), cand_near f32 [T, MC]
    conservative near distance per candidate, num [T], overflow [T],
    t_drop f32 [T] - near distance of the first dropped cluster, +inf when
    none were dropped).
    """
    cones = tile_cones(rays_o, rays_d, tile)
    vis = cone_sphere_visible(cones, bounds, near, far)      # [T, NC]

    rel = bounds.center[None] - cones.origin[:, None]
    along = jnp.sum(rel * cones.axis[:, None, :], axis=-1)   # [T, NC]
    near_dist = along - (bounds.radius[None] + cones.origin_radius[:, None])
    key = jnp.where(vis, near_dist, jnp.inf)
    # one extra entry: the FIRST DROPPED cluster's conservative near
    # distance t_drop (+inf when nothing overflows).  A ray can only be
    # biased by the drop if its own depth window reaches past t_drop -
    # in the split-far near pass most rays' t_split ends before the
    # per-tile window does, so the per-tile overflow flag alone wildly
    # overstates starvation (measured 0.49 flagged vs actual at s32)
    kk = min(max_clusters + 1, key.shape[1])
    neg, idx = jax.lax.top_k(-key, kk)
    nearest = -neg
    got = jnp.isfinite(nearest[:, :max_clusters])
    candidates = jnp.where(
        got, idx[:, :max_clusters], -1).astype(jnp.int32)
    cand_near = jnp.where(got, nearest[:, :max_clusters], jnp.float32(3e38))
    num = jnp.sum(got.astype(jnp.int32), axis=1)
    overflow = jnp.sum(vis.astype(jnp.int32), axis=1) > max_clusters
    if kk > max_clusters:
        t_drop = jnp.where(jnp.isfinite(nearest[:, max_clusters]),
                           nearest[:, max_clusters], jnp.inf)
    else:
        t_drop = jnp.full(key.shape[:1], jnp.inf, jnp.float32)
    return candidates, cand_near, num, overflow, t_drop


@partial(jax.jit, static_argnames=("tile", "cluster", "max_clusters"))
def cull_clusters(
    rays_o, rays_d, frames: GaussianFrames, near, far,
    tile: int = 256, cluster: int = 256, max_clusters: int = 64,
):
    """Convenience: cluster_bounds + select_candidates in one call.
    Returns (candidates, num, overflow) for backward compatibility."""
    bounds = cluster_bounds(frames, cluster)
    candidates, _cand_near, num, overflow, _t_drop = select_candidates(
        rays_o, rays_d, bounds, near, far, tile=tile,
        max_clusters=max_clusters,
    )
    return candidates, num, overflow


def tile_pixel_order(height: int, width: int, th: int = 8, tw: int = 8):
    """Permutation grouping pixels into th x tw screen tiles.

    Row-major ray flattening makes 'tiles' long thin row segments with wide
    bounding cones; square pixel tiles give tight cones, which is what makes
    cone culling effective.  Returns (perm, inv_perm) numpy int32 arrays:
    rays_tiled = rays[perm], outputs_linear = outputs_tiled[inv_perm].
    """
    import numpy as np

    assert height % th == 0 and width % tw == 0, (height, width, th, tw)
    idx = np.arange(height * width, dtype=np.int32).reshape(height, width)
    tiles = (
        idx.reshape(height // th, th, width // tw, tw)
        .transpose(0, 2, 1, 3)
        .reshape(-1)
    )
    inv = np.empty_like(tiles)
    inv[tiles] = np.arange(tiles.size, dtype=np.int32)
    return tiles, inv
