"""Depth-ordered hit gathering: the TPU replacement for BVH traversal + PPLL.

The reference traverses an OptiX BVH, appends every hit to a per-pixel linked
list, then repeatedly rescans it with a 16-deep k-buffer to composite hits in
depth order (forward_pass.cu:49-137).  On TPU we instead:

  1. stream over Gaussian chunks, keeping a per-ray top-K nearest-hit list
     (ids + distances only - a flat [R, K] "PPLL" instead of linked lists),
     while accumulating log(1-alpha) of *every* hit, which yields the exact
     total transmittance the reference tracks via payload 1 (shaders.cu:68-71);
  2. gather the K winners' Gaussian data and recompute their intersection
     quantities (cheap: K per ray), already depth-sorted.

The per-ray hit cap K plays the role of BUFFER_SIZE x MAX_ITERATIONS; the
truncated-tail correction in compositing (forward_pass.cu:142-155) compensates
for anything beyond it, exactly as in the reference.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from .gaussian_kernel import MAX_ALPHA, eval_gaussian_sq
from .intersect import GaussianFrames, intersect_block

INF = jnp.inf


class RayHits(NamedTuple):
    """Per-ray depth-sorted hit records (the flat PPLL equivalent)."""

    ids: jnp.ndarray        # [R, K] int32 gaussian index (undefined where ~valid)
    t: jnp.ndarray          # [R, K] sorted ascending
    alpha: jnp.ndarray      # [R, K]
    gaussval: jnp.ndarray   # [R, K]
    local_hit: jnp.ndarray  # [R, K, 3]
    valid: jnp.ndarray      # [R, K] bool
    full_T: jnp.ndarray     # [R] exact product of (1-alpha) over ALL hits
    num_traversed: jnp.ndarray  # [R] int32 stats (intersection tests run)


def gather_frames(frames: GaussianFrames, ids) -> GaussianFrames:
    return jax.tree_util.tree_map(lambda a: a[ids], frames)


def intersect_gathered(rays_o, rays_d, frames_g: GaussianFrames, exp_power,
                       secondary=False, backfacing_max_dist=0.1,
                       backfacing_invalid_normal_threshold=0.9):
    """Recompute intersection quantities for gathered per-(ray,k) Gaussians.

    frames_g leaves have leading shape [R, K].  Only the quantities needed by
    compositing/backward are returned: (alpha, gaussval, local_hit, t).
    Validity was already decided during the streaming pass.
    """
    rel = rays_o[:, None, :] - frames_g.mean                       # [R, K, 3]
    lo = jnp.sum(frames_g.rot * rel[..., :, None], axis=-2) * frames_g.inv_sizes
    ld = (
        jnp.sum(frames_g.rot * rays_d[:, None, :, None], axis=-2)
        * frames_g.inv_sizes
    )
    norm = jnp.sqrt(jnp.sum(ld * ld, axis=-1))
    safe_norm = jnp.maximum(norm, 1e-20)
    ldn = ld / safe_norm[..., None]
    t_loc = -jnp.sum(lo * ldn, axis=-1)
    t_world = t_loc / safe_norm
    u = lo + t_loc[..., None] * ldn
    sq = jnp.sum(u * u, axis=-1)
    local_hit = u * frames_g.sf[..., None]
    sq_scaled = sq * frames_g.sf * frames_g.sf
    gaussval = eval_gaussian_sq(sq_scaled, exp_power)
    alpha = MAX_ALPHA * gaussval * frames_g.opacity
    return alpha, gaussval, local_hit, t_world


@partial(
    jax.jit,
    static_argnames=("exp_power", "max_hits", "chunk", "tile", "interpret",
                     "extract_attrs"),
)
def trace_rays_pallas(
    rays_o,
    rays_d,
    frames: GaussianFrames,
    gpack,                   # pack_frames(frames), built once per render call
    exp_power,
    near,
    far,
    secondary,               # traced 0.0/1.0
    max_hits: int = 32,
    chunk: int = 512,
    tile: int = 256,
    backfacing_max_dist=0.1,
    backfacing_invalid_normal_threshold=0.9,
    interpret: bool = False,
    extract_attrs: bool = False,
) -> RayHits:
    """Pallas-kernel trace producing the same RayHits as trace_rays.

    The fused kernel returns unsorted K-nearest (t, id) slots + exact log
    total transmittance; here we sort, gather, and recompute the per-hit
    quantities (alpha/gaussval/local_hit) for compositing/backward.
    """
    from .pallas.trace_kernel import pallas_trace_fused

    R = rays_o.shape[0]
    if R % tile != 0:  # largest power-of-two tile dividing R
        tile = 8
        while R % (tile * 2) == 0 and tile < 512:
            tile *= 2
    # VMEM budget: the kernel's live [tile, chunk] temporaries cap the product
    N = gpack.shape[1]
    max_chunk = max(128, (256 * 512) // tile)
    chunk = min(chunk, max_chunk)
    # Mosaic requires lane-dim blocks in multiples of 128: never shrink the
    # chunk below that to divide a small N (the round-4 red-suite TPU
    # lowering error: chunk 64 vs N=192) - round the chunk to 128 and
    # zero-pad gpack instead (ROW_VALID=0 rows can never hit: gvalid=0
    # masks them out of slots, log-T and traversal counters alike).
    chunk = max(128, (chunk // 128) * 128)
    if N % chunk:
        pad_n = ((N + chunk - 1) // chunk) * chunk - N
        gpack = jnp.pad(gpack, ((0, 0), (0, pad_n)))
    t_sorted, ids, alpha, gaussval, local_hit, slot_attrs, log_T, traversed = (
        pallas_trace_fused(
            rays_o, rays_d, gpack, near, far, exp_power, secondary,
            backfacing_max_dist, backfacing_invalid_normal_threshold,
            max_hits=max_hits, chunk=chunk, tile=tile, interpret=interpret,
            extract_attrs=extract_attrs,
        )
    )
    valid = t_sorted < 1e37
    ids = jnp.where(valid, ids, 0)
    hits = RayHits(
        ids=ids,
        t=jnp.where(valid, t_sorted, 0.0),
        alpha=jnp.where(valid, alpha, 0.0),
        gaussval=gaussval,
        local_hit=local_hit,
        valid=valid,
        full_T=jnp.exp(log_T),
        num_traversed=traversed,
    )
    return hits, slot_attrs


@partial(
    jax.jit,
    static_argnames=("exp_power", "max_hits", "cluster", "tile", "interpret"),
)
def trace_rays_culled(
    rays_o,
    rays_d,
    frames: GaussianFrames,
    gpack,
    candidates,              # [T, MC] int32 from culling.select_candidates
    cand_near,               # [T, MC] f32
    exp_power,
    near,
    far,
    secondary,
    transmittance_threshold=0.01,
    max_hits: int = 32,
    cluster: int = 256,
    tile: int = 256,
    backfacing_max_dist=0.1,
    backfacing_invalid_normal_threshold=0.9,
    interpret: bool = False,
) -> RayHits:
    """Culled Pallas trace (cluster candidates + in-kernel early termination).

    Same RayHits contract as trace_rays; full_T omits hits in skipped
    clusters (they sit behind the K composited hits or beyond saturation -
    the truncated-tail correction absorbs the residual, matching the
    reference's early-out semantics, forward_pass.cu:131-134).
    """
    from .pallas.trace_kernel import pallas_trace_culled_fused

    t_sorted, ids, alpha, gaussval, local_hit, slot_attrs, log_T, traversed = (
        pallas_trace_culled_fused(
            rays_o, rays_d, gpack, candidates, cand_near, near, far,
            exp_power, secondary, backfacing_max_dist,
            backfacing_invalid_normal_threshold,
            transmittance_threshold=transmittance_threshold,
            max_hits=max_hits, cluster=cluster, tile=tile,
            interpret=interpret,
        )
    )
    valid = t_sorted < 1e37
    ids = jnp.where(valid, ids, 0)
    hits = RayHits(
        ids=ids,
        t=jnp.where(valid, t_sorted, 0.0),
        alpha=jnp.where(valid, alpha, 0.0),
        gaussval=gaussval,
        local_hit=local_hit,
        valid=valid,
        full_T=jnp.exp(log_T),
        num_traversed=traversed,
    )
    return hits, slot_attrs


@partial(jax.jit, static_argnames=("max_hits", "chunk", "secondary"))
def trace_rays(
    rays_o,                  # [R, 3]
    rays_d,                  # [R, 3]
    frames: GaussianFrames,  # full scene, N padded to a multiple of `chunk`
    exp_power,
    near,                    # scalar (znear for primary, 0 for bounces)
    far,
    max_hits: int = 32,
    chunk: int = 2048,
    secondary: bool = False,
    backfacing_max_dist=0.1,
    backfacing_invalid_normal_threshold=0.9,
) -> RayHits:
    R = rays_o.shape[0]
    N = frames.mean.shape[0]
    assert N % chunk == 0, f"N={N} must be padded to a multiple of chunk={chunk}"
    num_chunks = N // chunk
    K = max_hits

    def body(carry, c):
        top_t, top_id, log_T, traversed = carry
        blk = jax.tree_util.tree_map(
            lambda a: jax.lax.dynamic_slice_in_dim(a, c * chunk, chunk, 0), frames
        )
        hits = intersect_block(
            rays_o, rays_d, blk, exp_power, near, far,
            secondary=secondary,
            backfacing_max_dist=backfacing_max_dist,
            backfacing_invalid_normal_threshold=backfacing_invalid_normal_threshold,
        )
        log_T = log_T + jnp.sum(
            jnp.where(hits.valid, jnp.log1p(-hits.alpha), 0.0), axis=-1
        )
        traversed = traversed + jnp.sum(
            # count center-in-front tests like payload-7 stats (shaders.cu:33)
            jnp.ones_like(hits.t, dtype=jnp.int32) * blk.valid[None, :].astype(jnp.int32),
            axis=-1,
        )

        # Per-chunk K nearest, then merge with the running top-K.
        t_masked = jnp.where(hits.valid, hits.t, INF)
        neg_t, idx = jax.lax.top_k(-t_masked, min(K, chunk))      # [R, <=K]
        cand_t = -neg_t
        cand_id = idx + c * chunk

        merged_t = jnp.concatenate([top_t, cand_t], axis=-1)      # [R, 2K]
        merged_id = jnp.concatenate([top_id, cand_id], axis=-1)
        order = jnp.argsort(merged_t, axis=-1)[:, :K]
        top_t = jnp.take_along_axis(merged_t, order, axis=-1)
        top_id = jnp.take_along_axis(merged_id, order, axis=-1)
        return (top_t, top_id, log_T, traversed), None

    init = (
        jnp.full((R, K), INF, rays_o.dtype),
        jnp.zeros((R, K), jnp.int32),
        jnp.zeros((R,), rays_o.dtype),
        jnp.zeros((R,), jnp.int32),
    )
    (top_t, top_id, log_T, traversed), _ = jax.lax.scan(
        body, init, jnp.arange(num_chunks)
    )

    valid = jnp.isfinite(top_t)
    top_id = jnp.where(valid, top_id, 0)
    frames_g = gather_frames(frames, top_id)
    alpha, gaussval, local_hit, t_world = intersect_gathered(
        rays_o, rays_d, frames_g, exp_power
    )
    alpha = jnp.where(valid, alpha, 0.0)

    return RayHits(
        ids=top_id,
        t=jnp.where(valid, top_t, 0.0),
        alpha=alpha,
        gaussval=gaussval,
        local_hit=local_hit,
        valid=valid,
        full_T=jnp.exp(log_T),
        num_traversed=traversed,
    )
