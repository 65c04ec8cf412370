"""The raytracer core: bounce loop, compositing, and loss-fused backward.

TPU-native twin of the OptiX __raygen__rg megakernel
(reference editable_gauss_refl/cuda/csrc/shaders.cu:77-173) restructured
wavefront-style: all rays advance one bounce together (a Python-unrolled loop
over <= MAX_BOUNCES+1 full-frame passes), with per-ray liveness masks instead
of per-thread breaks.  The device-resident mutable Config
(cuda/csrc/core/config.h) becomes the RenderSettings pytree of traced scalars
passed into the jitted step - mutate on the host, no recompile.

Rays are processed in fixed-size tiles via lax.scan to bound memory (the
[tile, chunk] intersection blocks and [tile, K] hit records live in VMEM/HBM
only per-tile); gradients accumulate across tiles inside the scan carry.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import ggx
from ..ops.camera_rays import primary_ray_directions
from ..ops.composite import composite
from ..ops.gaussian_kernel import (
    MAX_BOUNCES,
    ROUGHNESS_DOWNWEIGHT_GRAD,
    ROUGHNESS_DOWNWEIGHT_GRAD_POWER,
)
from ..ops.render_grads import backward_step, scatter_grads, sign, zero_grads
from ..ops.trace import gather_frames, trace_rays
from ..scene.gaussian_scene import GaussianScene, build_frames


class RenderSettings(NamedTuple):
    """Traced runtime knobs (cuda/csrc/core/config.h:31-51 defaults)."""

    exp_power: float = 3.0
    alpha_threshold: float = 0.005
    transmittance_threshold: float = 0.01
    global_scale_factor: float = 1.0
    loss_weight_diffuse: float = 1.0
    loss_weight_specular: float = 1.0
    loss_weight_depth: float = 1.0
    loss_weight_normal: float = 1.0
    loss_weight_f0: float = 1.0
    loss_weight_roughness: float = 1.0
    eps_forward_normalization: float = 1e-12
    eps_scale_grad: float = 1e-12
    eps_ray_surface_offset: float = 0.01
    eps_min_roughness: float = 0.01
    reflection_invalid_normal_threshold: float = 0.7
    backfacing_invalid_normal_threshold: float = 0.9
    backfacing_max_dist: float = 0.1
    # kill secondary rays whose cumulative throughput max-channel falls to
    # or below this value: they cannot contribute visibly, but the
    # reference traces them anyway (shaders.cu's bounce loop has no
    # throughput cutoff), so the default -1 disables the cutoff entirely
    # for bit-parity; 0.0 kills only exactly-zero rays (rgb-identical
    # output), small positive values (~1e-3) trade invisible contributions
    # for skipping most of the last bounce pass (render-only knob -
    # training never reads it)
    secondary_throughput_threshold: float = -1.0


class CameraParams(NamedTuple):
    """Pose + intrinsics (cuda/csrc/core/camera.h:8-36)."""

    origin: jnp.ndarray          # [3]
    c2w: jnp.ndarray             # [3, 3]
    fov_y: jnp.ndarray           # scalar, radians
    znear: jnp.ndarray           # scalar
    zfar: jnp.ndarray            # scalar


class StepOutputs(NamedTuple):
    """Per-bounce-step framebuffer slices, [S, R, ...] stacked over steps."""

    rgb: jnp.ndarray             # [S, R, 3] (throughput-premultiplied)
    normal: jnp.ndarray          # [S, R, 3]
    f0: jnp.ndarray              # [S, R, 3]
    roughness: jnp.ndarray       # [S, R]
    depth: jnp.ndarray           # [S, R]
    transmittance: jnp.ndarray   # [S, R] T_final per step
    total_transmittance: jnp.ndarray  # [S, R] exact full_T per step
    throughput: jnp.ndarray      # [S, R, 3]
    alive: jnp.ndarray           # [S, R] ray was active at this step
    overflow: jnp.ndarray        # [S, R] STARVED-ray flag: the cull tile's
                                 # candidate list overflowed max_clusters
                                 # (farthest clusters dropped, NOT
                                 # tail-corrected) AND this ray was still
                                 # accumulating when the list ran out
                                 # (full_T > transmittance_threshold).
                                 # Rays that saturated before the dropped
                                 # tail are unaffected - the reference
                                 # truncates at saturation the same way
                                 # (forward_pass.cu MAX_ITERATIONS loop)


class RayTargets(NamedTuple):
    """Per-ray supervision targets (framebuffer.h:145-152)."""

    diffuse: jnp.ndarray         # [R, 3]
    specular: jnp.ndarray        # [R, 3]
    depth: jnp.ndarray           # [R]
    normal: jnp.ndarray          # [R, 3]
    roughness: jnp.ndarray       # [R]
    f0: jnp.ndarray              # [R, 3]


def _mask_hits(hits, alive):
    """Disable hits of dead rays (wavefront substitute for per-thread break)."""
    valid = hits.valid & alive[:, None]
    return hits._replace(
        valid=valid,
        alpha=jnp.where(valid, hits.alpha, 0.0),
        full_T=jnp.where(alive, hits.full_T, 1.0),
    )


def _starved(t_drop_ray, t_limit, full_T, alive, transmittance_threshold):
    """Refine the per-tile overflow to the rays it can actually bias.

    A cluster dropped beyond max_clusters is the FARTHEST one in the tile's
    list (conservative near distance t_drop); it can only change a ray that
    (a) was still accumulating (full_T above the transmittance threshold)
    when the computed list ran out - saturated rays truncate there
    regardless, identically to the reference, whose PPLL loop stops at
    saturation (forward_pass.cu:55-83) - and (b) whose own depth window
    reaches past t_drop: in the split-far near pass a ray's window ends at
    its OWN split-sphere exit `t_limit`, typically well before the per-tile
    window (everything beyond is the far pass's job), so the per-tile flag
    alone overstates starvation several-fold.  Dead rays composite
    nothing."""
    reaches = jnp.asarray(t_limit, jnp.float32) > t_drop_ray
    return (reaches & (full_T > transmittance_threshold) & alive).astype(
        jnp.float32)


def render_tile(
    rays_o,               # [R, 3]
    rays_d,               # [R, 3]
    frames,
    attrs,
    settings: RenderSettings,
    znear,
    zfar,
    key,
    num_bounces: int,
    max_hits: int,
    chunk: int,
    keep_residuals: bool = False,
    use_pallas: bool = False,
    exp_power_static: float = 3.0,   # pallas path only (static)
    gpack=None,                      # pack_frames(frames) when use_pallas
    pallas_tile: int = 256,
    culling: dict = None,            # {bounds, cull_tile, cluster, mc}
    interpret: bool = False,         # pallas interpret mode (CPU testing)
):
    """Forward bounce loop for one ray tile.

    Returns (StepOutputs, final_rgb, residuals) where residuals is a list of
    (hits, comp, gathered-attr) tuples per step when keep_residuals.
    """
    R = rays_o.shape[0]
    dtype = rays_o.dtype
    num_steps = num_bounces + 1

    alive = jnp.ones((R,), bool)
    throughput = jnp.ones((R, 3), dtype)
    outs = []
    residuals = []

    for step in range(num_steps):
        near = znear if step == 0 else jnp.zeros_like(znear)
        if use_pallas and culling is not None:
            from ..ops.culling import select_candidates
            from ..ops.trace import trace_rays_culled
            cands, cnear, _num, _ovf, tdrop = select_candidates(
                rays_o, rays_d, culling["bounds"], near, zfar,
                tile=culling["cull_tile"], max_clusters=culling["mc"],
            )
            tdrop_ray = jnp.repeat(tdrop, culling["cull_tile"])
            hits, slot_attrs = trace_rays_culled(
                rays_o, rays_d, frames, gpack, cands, cnear,
                exp_power_static, near, zfar,
                jnp.float32(1.0 if step > 0 else 0.0),
                transmittance_threshold=settings.transmittance_threshold,
                max_hits=max_hits, cluster=culling["cluster"],
                tile=culling["cull_tile"],
                backfacing_max_dist=settings.backfacing_max_dist,
                backfacing_invalid_normal_threshold=settings.backfacing_invalid_normal_threshold,
                interpret=interpret,
            )
        elif use_pallas:
            from ..ops.trace import trace_rays_pallas
            hits, slot_attrs = trace_rays_pallas(
                rays_o, rays_d, frames, gpack, exp_power_static, near, zfar,
                jnp.float32(1.0 if step > 0 else 0.0),
                max_hits=max_hits, chunk=chunk, tile=min(pallas_tile, R),
                backfacing_max_dist=settings.backfacing_max_dist,
                backfacing_invalid_normal_threshold=settings.backfacing_invalid_normal_threshold,
                interpret=interpret,
            )
        else:
            hits = trace_rays(
                rays_o, rays_d, frames, settings.exp_power, near, zfar,
                max_hits=max_hits, chunk=chunk, secondary=(step > 0),
                backfacing_max_dist=settings.backfacing_max_dist,
                backfacing_invalid_normal_threshold=settings.backfacing_invalid_normal_threshold,
            )
            slot_attrs = None
        if not (use_pallas and culling is not None):
            tdrop_ray = jnp.full((R,), jnp.inf, jnp.float32)
        hits = _mask_hits(hits, alive)

        if slot_attrs is not None:
            # attributes were extracted in-kernel; no [R,K] gathers needed
            g_rgb, g_normal = slot_attrs["rgb"], slot_attrs["normal"]
            g_f0, g_rough = slot_attrs["f0"], slot_attrs["roughness"]
        else:
            g_attrs = jax.tree_util.tree_map(lambda a: a[hits.ids], attrs)
            g_rgb, g_normal = g_attrs.rgb, g_attrs.normal
            g_f0, g_rough = g_attrs.f0, g_attrs.roughness
        comp = composite(
            hits, g_rgb, g_normal, g_f0, g_rough,
            settings.transmittance_threshold,
            settings.eps_forward_normalization,
        )
        if keep_residuals:
            residuals.append((hits, comp))

        # * Multiply step color by previous throughput (shaders.cu:111-114)
        rgb_step = comp.rgb if step == 0 else comp.rgb * throughput

        # * Normal post-processing + path termination (shaders.cu:116-124)
        nlen = jnp.linalg.norm(comp.normal, axis=-1)
        eff_normal = comp.normal / jnp.maximum(nlen, 1e-20)[:, None]
        eff_roughness = jnp.maximum(comp.roughness, settings.eps_min_roughness)
        next_alive = alive & (nlen >= settings.reflection_invalid_normal_threshold)

        # * Reflection ray via GGX importance sampling (shaders.cu:126-131)
        key, kstep = jax.random.split(key)
        u = jax.random.uniform(kstep, (R, 2), dtype)
        eff_position = rays_o + comp.depth[:, None] * rays_d
        next_dir = ggx.sample_cook_torrance(eff_normal, -rays_d, eff_roughness, u)
        next_origin = eff_position + settings.eps_ray_surface_offset * next_dir

        # * Cumulative throughput (shaders.cu:133-140). Dead rays produce
        # degenerate normals/directions whose weight can be NaN; zero their
        # throughput so 0*NaN never contaminates later (masked) bounces.
        w = ggx.cook_torrance_weight(
            eff_normal, -rays_d, next_dir, eff_roughness, comp.f0
        )
        next_throughput = jnp.where(
            next_alive[:, None], throughput * jnp.nan_to_num(w), 0.0
        )

        outs.append(
            dict(
                rgb=rgb_step, normal=comp.normal, f0=comp.f0,
                roughness=comp.roughness, depth=comp.depth,
                transmittance=comp.T_final,
                total_transmittance=comp.full_T,
                throughput=next_throughput,
                alive=alive.astype(dtype),  # float so SPP accumulation can sum
                overflow=_starved(tdrop_ray, zfar, comp.full_T, alive,
                                  settings.transmittance_threshold),
            )
        )
        rays_o, rays_d = next_origin, next_dir
        throughput = next_throughput
        alive = next_alive

    stacked = StepOutputs(
        **{
            k: jnp.stack([o[k] for o in outs], axis=0)
            for k in outs[0]
        }
    )
    final = jnp.sum(stacked.rgb, axis=0)
    return stacked, final, residuals


def loss_gradients_per_step(
    steps: StepOutputs,
    targets: RayTargets,
    settings: RenderSettings,
    num_bounces: int,
):
    """Per-ray upstream gradients of the fused L1 losses, per step.

    Mirrors backward_pass.cu:80-108: sign-of-difference times loss weight,
    deliberately NOT averaged over pixels (num_pixels=1), with the specular
    term shared across bounce steps, weighted by the previous step's
    throughput and (1-roughness)^3 downweighting.
    """
    out = []
    spec_pred = jnp.sum(steps.rgb[1:], axis=0) if num_bounces > 0 else None
    for step in range(num_bounces + 1):
        if step == 0:
            dL_drgb = (1.0 / 3.0) * sign(steps.rgb[0] - targets.diffuse) * settings.loss_weight_diffuse
            dL_ddepth = sign(steps.depth[0] - targets.depth) * settings.loss_weight_depth
            dL_dnormal = (1.0 / 3.0) * sign(steps.normal[0] - targets.normal) * settings.loss_weight_normal
            dL_df0 = (1.0 / 3.0) * sign(steps.f0[0] - targets.f0) * settings.loss_weight_f0
            dL_drough = sign(steps.roughness[0] - targets.roughness) * settings.loss_weight_roughness
        else:
            if ROUGHNESS_DOWNWEIGHT_GRAD:
                downweight = jnp.power(
                    jnp.maximum(1.0 - steps.roughness[step - 1], 0.0),
                    ROUGHNESS_DOWNWEIGHT_GRAD_POWER,
                )
            else:
                downweight = jnp.ones_like(steps.roughness[step - 1])
            dL_drgb = (
                (1.0 / 3.0)
                * sign(spec_pred - targets.specular)
                * settings.loss_weight_specular
                * downweight[:, None]
            )
            # * x= throughput of the previous step (backward_pass.cu:107)
            dL_drgb = dL_drgb * steps.throughput[step - 1]
            z = jnp.zeros_like(targets.depth)
            dL_ddepth = z
            dL_dnormal = jnp.zeros_like(targets.normal)
            dL_df0 = jnp.zeros_like(targets.f0)
            dL_drough = z
        out.append((dL_drgb, dL_dnormal, dL_df0, dL_drough, dL_ddepth))
    return out


def render_tile_with_grads(
    rays_o, rays_d, frames, attrs, raw_scene: GaussianScene,
    targets: RayTargets,
    settings: RenderSettings, znear, zfar, key,
    num_bounces: int, max_hits: int, chunk: int,
    use_pallas: bool = False, exp_power_static: float = 3.0, gpack=None,
    culling: dict = None, interpret: bool = False,
):
    """Forward + hand-written backward for one ray tile.

    Returns (StepOutputs, final_rgb, ParamGrads over the full [N] capacity).
    When `culling` is set, raw_scene/frames/attrs must all be in the SAME
    (Morton-sorted) layout - grads come back in that layout.
    """
    steps, final, residuals = render_tile(
        rays_o, rays_d, frames, attrs, settings, znear, zfar, key,
        num_bounces, max_hits, chunk, keep_residuals=True,
        use_pallas=use_pallas, exp_power_static=exp_power_static, gpack=gpack,
        culling=culling, interpret=interpret,
    )
    dLs = loss_gradients_per_step(steps, targets, settings, num_bounces)

    n = raw_scene.capacity
    grads = zero_grads(n, rays_o.dtype)
    g_scaling_act = jnp.exp(raw_scene.scaling)
    for step in range(num_bounces + 1):
        hits, comp = residuals[step]
        dL_drgb, dL_dnormal, dL_df0, dL_drough, dL_ddepth = dLs[step]
        ids = hits.ids
        fg = gather_frames(frames, ids)
        g_attrs = jax.tree_util.tree_map(lambda a: a[ids], attrs)
        per_hit = backward_step(
            hits, comp,
            g_attrs.rgb, g_attrs.normal, g_attrs.f0, g_attrs.roughness,
            fg.opacity, g_scaling_act[ids], raw_scene.rotation[ids],
            fg.rot, fg.inv_sizes, fg.sf,
            dL_drgb, dL_dnormal, dL_df0, dL_drough, dL_ddepth,
            settings.exp_power, settings.eps_scale_grad, n,
            settings.global_scale_factor,
        )
        grads = grads + scatter_grads(per_hit, ids, n)
    return steps, final, grads


def render_tile_with_grads_fused(
    rays_o, rays_d, targets: RayTargets,
    settings: RenderSettings, znear, zfar, key,
    num_bounces: int, max_hits: int, *,
    gpack, table, ftable, bounds, cull_tile: int, cull_cluster: int,
    max_clusters: int, n_capacity: int, exp_power_static: float = 3.0,
    interpret: bool = False, use_mxu_scatter: bool = False,
    split_far: bool = False, mc_far: int = 32, max_hits_far: int = 0,
    split_radius_scale: float = 1.5,
):
    """Forward + loss-fused backward via the slots kernel: ZERO XLA gathers.

    Per bounce ONE Pallas call returns depth-sorted slots carrying t/alpha/
    id plus all shading attrs AND frame fields (two one-hot MXU dots per
    inserted hit); compositing, the GGX epilogue, and backward_step then run
    on [R, K] slot data directly.  Replaces render_tile_with_grads'
    attrs[ids]/gather_frames stages, which dominated the 768px training
    step (~15 s/iter -> the gathers were most of it).

    Same RNG stream as render_tile, so single-device equivalence holds.

    `split_far=True` (VMEM-resident scenes only) traces each bounce as a
    near pass (t < per-ray split-sphere exit) plus a direction-sorted far
    pass (t beyond; `mc_far` candidates, `max_hits_far` slots - 0 means
    max(8, max_hits // 2)); the two depth-sorted slot buffers CONCATENATE
    into one sorted list (merge_slots), so composite/backward/scatter run
    unchanged at K_total = K + K_far - with single-pass threshold
    semantics exactly (T_before spans both sets).  Incompatible with the
    opt-in MXU scatter (per-tile candidate matching assumes one pass)."""
    from ..ops.culling import select_candidates
    from ..ops.pallas.render_kernel import (
        merge_slots,
        pallas_trace_slots,
        unpack_slots,
    )
    from ..ops.pallas.render_kernel_v3 import (
        pallas_trace_slots_v4,
        slots_resident_fits,
    )
    from ..ops.pallas.scatter_kernel import (
        scatter_fits,
        scatter_grads_pallas_multi,
    )
    from ..ops.trace import RayHits

    R = rays_o.shape[0]
    K = max_hits
    num_steps = num_bounces + 1
    alive = jnp.ones((R,), bool)
    throughput = jnp.ones((R, 3), jnp.float32)
    outs, residuals = [], []

    split = split_far and slots_resident_fits(n_capacity)
    Kf = (max_hits_far or max(8, K // 2)) if split else 0
    use_mxu_scatter = use_mxu_scatter and not split
    if split:
        # split sphere from the valid cluster bounds (exactness never
        # depends on the sphere - only the far-pass culling win does)
        vmask = bounds.any_valid
        cntc = jnp.maximum(jnp.sum(vmask.astype(jnp.float32)), 1.0)
        split_c = jnp.sum(
            jnp.where(vmask[:, None], bounds.center, 0.0), axis=0) / cntc
        dcl = jnp.linalg.norm(bounds.center - split_c[None], axis=-1)
        sk = jnp.sort(jnp.where(vmask, dcl, jnp.inf))
        nvc = jnp.sum(vmask.astype(jnp.int32))
        r_split = jnp.float32(split_radius_scale) * jax.lax.dynamic_index_in_dim(
            sk, jnp.maximum(nvc // 2, 0), keepdims=False)

        def split_exit_t(ro, rd):
            oc = ro - split_c[None]
            a2 = jnp.sum(rd * rd, axis=-1)
            b = jnp.sum(rd * oc, axis=-1)
            cc = jnp.sum(oc * oc, axis=-1) - r_split * r_split
            disc = b * b - a2 * cc
            t = jnp.where(
                disc > 0,
                (-b + jnp.sqrt(jnp.maximum(disc, 0.0)))
                / jnp.maximum(a2, 1e-30), 0.0)
            return jnp.maximum(t, 0.0)

    # scene bbox (from the conservative cluster spheres) for secondary-ray
    # Morton re-tiling - same coherence trick as render_frame_fused: GGX
    # secondary rays in pixel-tile order have wide per-tile cones, so their
    # candidate lists run to the max_clusters cap; re-tiled by (origin
    # Morton cell, direction bin) the early-exit fires ~2x sooner.  Culling
    # is conservative per ray, so with overflow ~0 the traced result is
    # IDENTICAL - re-tiling only changes which tile a ray shares its
    # candidate list with (asserted vs the XLA path in tests).
    bc = jnp.where(bounds.any_valid[:, None], bounds.center, jnp.nan)
    rad = jnp.where(bounds.any_valid, bounds.radius, 0.0)
    scene_lo = jnp.nanmin(bc - rad[:, None], axis=0)
    scene_hi = jnp.nanmax(bc + rad[:, None], axis=0)

    for step in range(num_steps):
        near = znear if step == 0 else jnp.zeros_like(znear)
        if step > 0:
            from ..ops.culling import morton_codes
            pos_bits = morton_codes(rays_o, scene_lo, scene_hi, bits=5)
            qd = jnp.clip(((rays_d * 0.5 + 0.5) * 4.0), 0, 3).astype(
                jnp.uint32)
            dir_bits = (qd[:, 0] << 4) | (qd[:, 1] << 2) | qd[:, 2]
            keys = (
                jnp.where(alive, jnp.uint32(0), jnp.uint32(1 << 26))
                | (pos_bits << 6) | dir_bits
            )
            order = jnp.argsort(keys)
            inv_order = jnp.zeros_like(order).at[order].set(
                jnp.arange(R, dtype=order.dtype))
            rays_o_k, rays_d_k, alive_k = (
                rays_o[order], rays_d[order], alive[order])
        else:
            order = inv_order = None
            rays_o_k, rays_d_k, alive_k = rays_o, rays_d, alive

        def trace_pass(ro_k, rd_k, al_k, ts_k, cull_near, cull_far, mc_p,
                       K_p, wmode, inv_p):
            """One slots-kernel trace in the given ray order; returns
            (slots, acc, raw-overflow, cands) in CANONICAL order."""
            cands, cnear, _n, _ovf, tdrop = select_candidates(
                ro_k, rd_k, bounds, cull_near, cull_far, tile=cull_tile,
                max_clusters=mc_p,
            )
            tdrop_r = jnp.repeat(tdrop, cull_tile)
            if slots_resident_fits(n_capacity):
                # VMEM-resident path: zero per-chunk HBM fetches (round-3)
                slots, acc = pallas_trace_slots_v4(
                    ro_k, rd_k, gpack, ftable, cands, cnear, near, zfar,
                    exp_power_static, jnp.float32(1.0 if step > 0 else 0.0),
                    settings.backfacing_max_dist,
                    settings.backfacing_invalid_normal_threshold,
                    transmittance_threshold=settings.transmittance_threshold,
                    max_hits=K_p, cluster=cull_cluster, tile=cull_tile,
                    interpret=interpret, alive=al_k,
                    t_split=ts_k, window_mode=wmode,
                    secondary_static=1 if step > 0 else 0,
                )
            else:
                slots, acc = pallas_trace_slots(
                    ro_k, rd_k, gpack, table, ftable, cands, cnear, near,
                    zfar, exp_power_static,
                    jnp.float32(1.0 if step > 0 else 0.0),
                    settings.backfacing_max_dist,
                    settings.backfacing_invalid_normal_threshold,
                    transmittance_threshold=settings.transmittance_threshold,
                    max_hits=K_p, cluster=cull_cluster, tile=cull_tile,
                    interpret=interpret, alive=al_k,
                    secondary_static=1 if step > 0 else 0,
                )
            if inv_p is not None:
                # [R, lanes] row-gathers return the slots to original ray
                # order; everything downstream (composite, GGX epilogue,
                # backward, scatter) is row-local
                slots = slots[inv_p]
                acc = acc[inv_p]
                tdrop_r = tdrop_r[inv_p]
            return slots, acc, tdrop_r, cands

        if not split:
            slots, acc, tdrop_ray, cands = trace_pass(
                rays_o_k, rays_d_k, alive_k, None, near, zfar,
                max_clusters, K, 0, inv_order,
            )
            K_step = K
            acc_near = acc
            tdrop_near = tdrop_ray
            alive_far = alive
        else:
            ts = split_exit_t(rays_o, rays_d)
            ts_k = ts[order] if order is not None else ts
            far_n = jnp.max(ts_k.reshape(-1, cull_tile), axis=1)
            slots_n, acc_n, tdrop_near, cands = trace_pass(
                rays_o_k, rays_d_k, alive_k, ts_k, near, far_n,
                max_clusters, K, 1, inv_order,
            )
            alive_far = alive & (jnp.exp(acc_n[:, 0]) >
                                 settings.transmittance_threshold)
            if step > 0:
                dirm = morton_codes(rays_d, -jnp.ones(3), jnp.ones(3),
                                    bits=5)
                posm = morton_codes(rays_o, scene_lo, scene_hi, bits=2)
                keys_f = (
                    jnp.where(alive_far, jnp.uint32(0), jnp.uint32(1 << 26))
                    | (dirm << 6) | posm
                )
                order_f = jnp.argsort(keys_f)
                inv_f = jnp.zeros_like(order_f).at[order_f].set(
                    jnp.arange(R, dtype=order_f.dtype))
                ro_f, rd_f, al_f, ts_f = (
                    rays_o[order_f], rays_d[order_f], alive_far[order_f],
                    ts[order_f])
            else:
                inv_f = None
                ro_f, rd_f, al_f, ts_f = rays_o, rays_d, alive_far, ts
            near_f = jnp.min(ts_f.reshape(-1, cull_tile), axis=1)
            slots_f, acc_f, tdrop_far, _cf = trace_pass(
                ro_f, rd_f, al_f, ts_f, near_f, zfar, mc_far, Kf, 2, inv_f,
            )
            slots, acc = merge_slots(slots_n, acc_n, slots_f, acc_f, K, Kf)
            K_step = K + Kf
            acc_near = acc_n
        hits_d, attrs_d, frames_d = unpack_slots(slots, acc, K_step, rays_o,
                                                 rays_d)
        hits = RayHits(**{k: hits_d[k] for k in RayHits._fields})
        comp = composite(
            hits, attrs_d["rgb"], attrs_d["normal"], attrs_d["f0"],
            attrs_d["roughness"],
            settings.transmittance_threshold,
            settings.eps_forward_normalization,
        )
        residuals.append((hits, comp, attrs_d, frames_d, cands,
                          None if inv_order is None else order))

        rgb_step = comp.rgb if step == 0 else comp.rgb * throughput
        nlen = jnp.linalg.norm(comp.normal, axis=-1)
        eff_normal = comp.normal / jnp.maximum(nlen, 1e-20)[:, None]
        eff_roughness = jnp.maximum(comp.roughness, settings.eps_min_roughness)
        next_alive = alive & (nlen >= settings.reflection_invalid_normal_threshold)
        key, kstep = jax.random.split(key)
        u = jax.random.uniform(kstep, (R, 2), jnp.float32)
        eff_position = rays_o + comp.depth[:, None] * rays_d
        next_dir = ggx.sample_cook_torrance(eff_normal, -rays_d,
                                            eff_roughness, u)
        next_origin = eff_position + settings.eps_ray_surface_offset * next_dir
        w = ggx.cook_torrance_weight(
            eff_normal, -rays_d, next_dir, eff_roughness, comp.f0
        )
        next_throughput = jnp.where(
            next_alive[:, None], throughput * jnp.nan_to_num(w), 0.0
        )
        if split:
            # near pass: a ray's window ends at its own split exit ts
            starved_step = jnp.maximum(
                _starved(tdrop_near, ts, jnp.exp(acc_near[:, 0]), alive,
                         settings.transmittance_threshold),
                _starved(tdrop_far, zfar, comp.full_T, alive_far,
                         settings.transmittance_threshold),
            )
        else:
            starved_step = _starved(tdrop_near, zfar, comp.full_T, alive,
                                    settings.transmittance_threshold)
        outs.append(dict(
            rgb=rgb_step, normal=comp.normal, f0=comp.f0,
            roughness=comp.roughness, depth=comp.depth,
            transmittance=comp.T_final, total_transmittance=comp.full_T,
            throughput=next_throughput, alive=alive.astype(jnp.float32),
            overflow=starved_step,
        ))
        rays_o, rays_d = next_origin, next_dir
        throughput = next_throughput
        alive = next_alive

    steps = StepOutputs(
        **{k: jnp.stack([o[k] for o in outs], axis=0) for k in outs[0]}
    )
    final = jnp.sum(steps.rgb, axis=0)
    dLs = loss_gradients_per_step(steps, targets, settings, num_bounces)

    per_hits, ids_list, cands_list = [], [], []
    for step in range(num_steps):
        hits, comp, attrs_d, frames_d, cands, order = residuals[step]
        dL_drgb, dL_dnormal, dL_df0, dL_drough, dL_ddepth = dLs[step]
        per_hit = backward_step(
            hits, comp,
            attrs_d["rgb"], attrs_d["normal"], attrs_d["f0"],
            attrs_d["roughness"],
            frames_d["opacity"], frames_d["scaling_act"],
            frames_d["rotation_raw"], frames_d["rot_mat"],
            frames_d["inv_sizes"], frames_d["sf"],
            dL_drgb, dL_dnormal, dL_df0, dL_drough, dL_ddepth,
            settings.exp_power, settings.eps_scale_grad, n_capacity,
            settings.global_scale_factor,
        )
        ids = hits.ids
        if use_mxu_scatter and order is not None:
            # the MXU scatter matches hit rows to per-TILE candidate lists,
            # which live in the step's re-tiled ray order
            per_hit = {k: v[order] for k, v in per_hit.items()}
            ids = ids[order]
        per_hits.append(per_hit)
        ids_list.append(ids)
        cands_list.append(cands)
    if use_mxu_scatter and scatter_fits(n_capacity, cull_cluster):
        # MXU scatter kernel: ONE launch covers every bounce's hits
        # (atomicAdd analog, backward_pass.cu:209-220); exact vs the XLA
        # segment-sum - tests/test_scatter_kernel.py.  OPT-IN: its one-hot
        # dot work scales with max_clusters x max_hits, and at training
        # scale (768px / 175k / mc=192 / K=32) it MEASURED 12.0 s/iter vs
        # 7.35 for the XLA scatter-add - the wide one-hot lane dimension
        # costs more MXU FLOPs than XLA's sort-based scatter costs HBM.
        grads = scatter_grads_pallas_multi(
            per_hits, ids_list, cands_list, n_capacity,
            cluster=cull_cluster, tile=cull_tile, interpret=interpret)
    else:
        grads = zero_grads(n_capacity, jnp.float32)
        for per_hit, ids in zip(per_hits, ids_list):
            grads = grads + scatter_grads(per_hit, ids, n_capacity)
    return steps, final, grads


@partial(
    jax.jit,
    static_argnames=("width", "height", "num_bounces", "max_hits", "chunk",
                     "tile", "jitter", "use_pallas", "exp_power_static",
                     "use_culling", "cull_tile", "cull_cluster",
                     "max_clusters", "interpret"),
)
def render_frame(
    scene: GaussianScene,
    camera: CameraParams,
    settings: RenderSettings,
    key,
    width: int,
    height: int,
    num_bounces: int = 2,
    max_hits: int = 32,
    chunk: int = 2048,
    tile: int = 8192,
    jitter: bool = True,
    use_pallas: bool = False,
    exp_power_static: float = 3.0,
    use_culling: bool = False,
    cull_tile: int = 256,
    cull_cluster: int = 256,
    max_clusters: int = 192,
    interpret: bool = False,
):
    """Full-frame forward render. Returns StepOutputs [S, H*W, ...] + final."""
    cull_tile = min(cull_tile, 256)  # fused-kernel VMEM budget
    # culling needs dividing tiles/clusters (all static); warn loudly on the
    # fallback - the brute path is ~10x slower (VERDICT r1 "silent fallback")
    if use_culling and (
        (width * height) % cull_tile != 0
        or scene.capacity % cull_cluster != 0
        or min(tile, width * height) % cull_tile != 0
    ):
        import warnings
        warnings.warn(
            f"culling disabled: shapes must divide (H*W={width * height}, "
            f"cull_tile={cull_tile}, capacity={scene.capacity}, "
            f"cull_cluster={cull_cluster}, tile={min(tile, width * height)}) "
            "- falling back to the brute trace (~10x slower). Pad the scene "
            "capacity to a multiple of cull_cluster and pick a resolution "
            "divisible by cull_tile.",
            stacklevel=2,
        )
        use_culling = False
    frames, attrs = build_frames(
        scene, settings.alpha_threshold, settings.exp_power,
        settings.global_scale_factor,
    )
    gpack = None
    culling = None
    ray_perm = None
    if use_pallas and use_culling:
        # Morton-sort the scene (the per-rebuild analog of the BVH refit) so
        # clusters are spatially tight, then bound them once per frame.
        from ..ops.culling import (
            cluster_bounds,
            morton_order,
            tile_pixel_order,
        )
        perm = morton_order(frames)
        frames = jax.tree_util.tree_map(lambda a: a[perm], frames)
        attrs = jax.tree_util.tree_map(lambda a: a[perm], attrs)
        bounds = cluster_bounds(frames, cull_cluster)
        culling = dict(bounds=bounds, cull_tile=cull_tile,
                       cluster=cull_cluster, mc=max_clusters)
        # square pixel tiles give tight bounding cones
        th = tw = int(cull_tile ** 0.5)
        if height % th or width % tw or th * tw != cull_tile:
            th, tw = 16, cull_tile // 16
        if height % th == 0 and width % tw == 0:
            ray_perm, ray_inv = tile_pixel_order(height, width, th, tw)
            ray_perm = jnp.asarray(ray_perm)
            ray_inv = jnp.asarray(ray_inv)
    if use_pallas:
        from ..ops.pallas.trace_kernel import pack_frames
        gpack = pack_frames(frames, attrs)
    key_jit, key_b = jax.random.split(key)
    dirs = primary_ray_directions(
        width, height, camera.fov_y, camera.c2w,
        jitter_key=key_jit if jitter else None,
    ).reshape(-1, 3)
    if ray_perm is not None:
        dirs = dirs[ray_perm]
    R = dirs.shape[0]
    tile = min(tile, R)
    num_tiles = (R + tile - 1) // tile
    pad = num_tiles * tile - R
    if pad:
        dirs = jnp.concatenate([dirs, dirs[:pad]], axis=0)
    dirs_t = dirs.reshape(num_tiles, tile, 3)
    origins = jnp.broadcast_to(camera.origin, (tile, 3))

    def one_tile(i):
        steps, final, _ = render_tile(
            origins, dirs_t[i], frames, attrs, settings,
            camera.znear, camera.zfar, jax.random.fold_in(key_b, i),
            num_bounces, max_hits, chunk,
            use_pallas=use_pallas, exp_power_static=exp_power_static,
            gpack=gpack, culling=culling, interpret=interpret,
        )
        return steps, final

    steps, final = jax.lax.map(one_tile, jnp.arange(num_tiles))
    # [T, S, tile, ...] -> [S, R, ...]
    def unflatten(a):
        a = jnp.moveaxis(a, 0, 1)  # [S, T, tile, ...]
        a = a.reshape((a.shape[0], num_tiles * tile) + a.shape[3:])
        return a[:, :R]

    steps = jax.tree_util.tree_map(unflatten, steps)
    final = final.reshape(num_tiles * tile, 3)[:R]
    if ray_perm is not None:
        steps = jax.tree_util.tree_map(lambda a: a[:, ray_inv], steps)
        final = final[ray_inv]
    return steps, final


def _prepare_fused_frame(
    scene, camera, settings, key, width: int, height: int, *,
    jitter: bool, cull_cluster: int, cull_tile_primary: int,
    num_steps: int, split_far: bool, split_radius_scale: float,
    composite_mode: str = "kbuffer",
):
    """Shared prologue of render_frame_fused / sharded_render_fused: Morton
    sort + cluster bounds + gpack, pixel-tile ray ordering, per-step GGX
    uniforms (linear-pixel-order stream), scene bbox and the auto split
    sphere.  Returns a dict of everything _fused_bounce_core consumes plus
    (ray_perm, ray_inv, R)."""
    if composite_mode not in ("kbuffer", "scan", "scanq"):
        # composite_mode is a static jit arg: this raises at trace time, so a
        # typo'd config can never silently render with the wrong kernel
        raise ValueError(
            f"composite_mode={composite_mode!r}: expected one of "
            "'kbuffer' | 'scan' | 'scanq'")
    from ..ops.culling import (
        cluster_bounds,
        morton_order,
        tile_pixel_order,
    )
    from ..ops.pallas.trace_kernel import pack_frames

    frames, attrs = build_frames(
        scene, settings.alpha_threshold, settings.exp_power,
        settings.global_scale_factor,
    )
    perm = morton_order(frames)
    frames = jax.tree_util.tree_map(lambda a: a[perm], frames)
    attrs = jax.tree_util.tree_map(lambda a: a[perm], attrs)
    if composite_mode in ("scan", "scanq"):
        # the v6 streaming composite follows table order within a chunk: a
        # per-frame within-cluster depth sort along the camera forward axis
        # tightens it toward true per-ray order (membership - and therefore
        # cluster_bounds / select_candidates - is unchanged)
        from ..ops.culling import sort_within_clusters

        fwd = -camera.c2w[:, 2]
        perm2 = sort_within_clusters(frames, fwd, cull_cluster)
        frames = jax.tree_util.tree_map(lambda a: a[perm2], frames)
        attrs = jax.tree_util.tree_map(lambda a: a[perm2], attrs)
    bounds = cluster_bounds(frames, cull_cluster)
    # the kernels extract shading attrs straight from gpack rows 16..31
    gpack = pack_frames(frames, attrs)

    # transpose/quadric repack ONCE per frame (not per lax.map iteration
    # inside the bounce core - ADVICE r4: the v7 quadric pack is O(N) of
    # HIGHEST-precision einsums, the v6 transpose an [N, 128]
    # materialization)
    scan_pack = None
    if composite_mode in ("scan", "scanq"):
        from ..ops.pallas.render_kernel_v5 import (
            pack_frames_lanes,
            resident_fits_v5,
        )
        from ..ops.pallas.render_kernel_v7 import pack_quadric_lanes

        if resident_fits_v5(gpack.shape[1], cull_cluster):
            padded = jnp.pad(gpack, ((0, 0), (0, cull_cluster)))
            scan_pack = (pack_quadric_lanes(padded)
                         if composite_mode == "scanq"
                         else pack_frames_lanes(padded))

    # square pixel tiles sized to the primary cull tile (256 -> 16x16,
    # 64 -> 8x8: tighter bounding cones, fewer candidates per tile)
    tpx = int(cull_tile_primary ** 0.5)
    assert tpx * tpx == cull_tile_primary, cull_tile_primary
    ray_perm, ray_inv = tile_pixel_order(height, width, tpx, tpx)
    ray_perm = jnp.asarray(ray_perm)
    ray_inv = jnp.asarray(ray_inv)
    key_jit, key_b = jax.random.split(key)
    dirs = primary_ray_directions(
        width, height, camera.fov_y, camera.c2w,
        jitter_key=key_jit if jitter else None,
    ).reshape(-1, 3)[ray_perm]
    R = dirs.shape[0]

    live = frames.valid
    scene_lo = jnp.min(jnp.where(live[:, None], frames.mean, jnp.inf),
                       axis=0)
    scene_hi = jnp.max(jnp.where(live[:, None], frames.mean, -jnp.inf),
                       axis=0)

    if split_far:
        # Auto split sphere: centroid of live means, radius = scale x the
        # median live distance (the dense scene sits inside, the far-field
        # cloud's bulk outside).  Correctness NEVER depends on the choice -
        # the t-window partition is exact for any sphere - only the culling
        # win does.
        livef = live.astype(jnp.float32)
        cnt = jnp.maximum(jnp.sum(livef), 1.0)
        split_c = jnp.sum(jnp.where(live[:, None], frames.mean, 0.0),
                          axis=0) / cnt
        dist_c = jnp.linalg.norm(frames.mean - split_c[None], axis=-1)
        skey = jnp.sort(jnp.where(live, dist_c, jnp.inf))
        n_live = jnp.sum(live.astype(jnp.int32))
        r_med = jax.lax.dynamic_index_in_dim(
            skey, jnp.maximum(n_live // 2, 0), keepdims=False)
        r_split = jnp.float32(split_radius_scale) * r_med
    else:
        split_c = jnp.zeros((3,), jnp.float32)
        r_split = jnp.float32(0.0)

    # per-step GGX uniforms drawn in linear pixel order then tile-permuted:
    # each PIXEL consumes the same randomness as render_frame (bit-for-bit
    # comparable in tests), and the pre-drawn [S, R, 2] block makes the
    # bounce core layout-independent (shardable over rays)
    key_t = jax.random.fold_in(key_b, 0)
    us = []
    for _step in range(num_steps):
        key_t, kstep = jax.random.split(key_t)
        us.append(jax.random.uniform(kstep, (R, 2), jnp.float32)[ray_perm])
    us = jnp.stack(us)
    rays_o = jnp.broadcast_to(camera.origin, (R, 3))

    return dict(
        gpack=gpack, bounds=bounds, scene_lo=scene_lo, scene_hi=scene_hi,
        split_c=split_c, r_split=r_split, rays_o=rays_o, dirs=dirs, us=us,
        ray_perm=ray_perm, ray_inv=ray_inv, R=R, scan_pack=scan_pack,
    )


def _fused_bounce_core(
    rays_o, rays_d, us, gpack, bounds, scene_lo, scene_hi,
    split_c, r_split, settings, znear, zfar, *,
    capacity: int, num_bounces: int, max_hits: int,
    exp_power_static: float, cull_cluster: int, max_clusters: int,
    rays_per_call: int, interpret: bool,
    max_clusters_secondary: int | None, cull_tile_secondary: int,
    cull_tile_primary: int, split_far: bool, mc_far: int,
    max_hits_far: int, composite_mode: str = "kbuffer",
    scan_pack=None, kernel_stats: bool = True,
    attr_precision: str = "highest",
):
    """The fused per-bounce wavefront loop over a PREPARED ray batch.

    Shared by render_frame_fused (whole frame, single device) and
    parallel.sharding.sharded_render_fused (rays sharded over a mesh -
    inside shard_map every re-sort/culling decision is shard-local, which
    only changes which tile a ray shares its candidate list with; culling
    is conservative per ray, so with honest budgets the result is
    IDENTICAL to the single-device path - asserted in tests).

    `rays_o`/`rays_d` are tile-ordered and padded to a multiple of
    rays_per_call; `us` is [num_steps, R, 2] of per-step GGX uniforms
    (pre-drawn so the sample stream is layout-independent); `split_c` /
    `r_split` define the split sphere when split_far (zeros otherwise).
    Returns (StepOutputs [S, R, ...], final [R, 3]) in the given order."""
    from ..ops.culling import morton_codes, select_candidates
    from ..ops.pallas.render_kernel import unpack_composite
    from ..ops.pallas.render_kernel_v3 import (
        pallas_render_culled_v3,
        pallas_render_culled_v4,
        resident_fits,
    )

    Rp = rays_o.shape[0]
    rays_per_call = min(rays_per_call, Rp)
    assert Rp % rays_per_call == 0, (Rp, rays_per_call)
    n_call = Rp // rays_per_call
    alive = jnp.ones((Rp,), bool)
    throughput = jnp.ones((Rp, 3), jnp.float32)
    outs = []
    num_steps = num_bounces + 1

    def split_exit_t(ro, rd):
        """Per-ray exit distance of the split sphere (same t-parameter as
        the kernel's unnormalized-direction intersection).  Rays that miss
        the sphere (origin outside, heading away) get 0: everything on
        them composites in the far pass."""
        oc = ro - split_c[None]
        a2 = jnp.sum(rd * rd, axis=-1)
        b = jnp.sum(rd * oc, axis=-1)
        cc = jnp.sum(oc * oc, axis=-1) - r_split * r_split
        disc = b * b - a2 * cc
        t = jnp.where(
            disc > 0,
            (-b + jnp.sqrt(jnp.maximum(disc, 0.0)))
            / jnp.maximum(a2, 1e-30),
            0.0,
        )
        return jnp.maximum(t, 0.0)

    for step in range(num_steps):
        near = znear if step == 0 else jnp.zeros_like(znear)
        if step > 0:
            # Reflected rays are incoherent within pixel tiles (wide bounding
            # cones -> ~3x more candidate clusters).  Re-tile them by
            # (liveness, origin Morton cell, direction bin) so cones stay
            # tight and fully-dead tiles skip instantly - the wavefront
            # substitute for the per-ray BVH traversal the reference gets.
            pos_bits = morton_codes(rays_o, scene_lo, scene_hi, bits=5)
            qd = jnp.clip(((rays_d * 0.5 + 0.5) * 4.0), 0, 3).astype(
                jnp.uint32)
            dir_bits = (qd[:, 0] << 4) | (qd[:, 1] << 2) | qd[:, 2]
            keys = (
                jnp.where(alive, jnp.uint32(0), jnp.uint32(1 << 26))
                | (pos_bits << 6) | dir_bits
            )
            order = jnp.argsort(keys)
            inv_order = jnp.zeros_like(order).at[order].set(
                jnp.arange(Rp, dtype=order.dtype))
            rays_o_k = rays_o[order]
            rays_d_k = rays_d[order]
            alive_k = alive[order]
        else:
            order = inv_order = None
            rays_o_k, rays_d_k, alive_k = rays_o, rays_d, alive
        # GGX secondary rays have wider per-tile cones (cand/tile ~85 vs ~43
        # primary on the bench room) - a per-pass cap keeps the primary pass
        # cheap while sizing the secondary list so overflow stays ~0
        mc_step = (max_clusters if step == 0 or max_clusters_secondary is None
                   else max_clusters_secondary)
        # smaller secondary tiles tighten the cone UNION each tile pays for
        # (the tile-granularity analog of the reference's per-ray BVH
        # traversal) - after the Morton/direction re-sort, a secondary
        # "tile" is just a run of coherent rays, so its size is free to
        # shrink; primary tiles stay 16x16 pixels
        tile_step = cull_tile_primary if step == 0 else cull_tile_secondary

        def run_pass(ro_k, rd_k, al_k, ts_k, cull_near, cull_far, mc_p,
                     tile_p, wmode, inv_p, K_p=max_hits):
            """One culled kernel pass over the (ordered) wavefront; returns
            (composite dict, per-ray raw-overflow) in CANONICAL order."""
            cands, cnear, num, _ovf, tdrop = select_candidates(
                rays_o=ro_k, rays_d=rd_k, bounds=bounds,
                near=cull_near, far=cull_far,
                tile=tile_p, max_clusters=mc_p,
            )
            tdrop_ray = jnp.repeat(tdrop, tile_p)
            # Decide the kernel BEFORE the candidate re-sort: the k-buffer
            # fallback (v4) early-exits on `kth < cand_near` and therefore
            # REQUIRES near-ascending candidate lists - feeding it the scan
            # kernels' center-depth-sorted lists silently drops hits
            # (ADVICE r4 high).  Scan only runs when the packed scene is
            # VMEM-resident; otherwise keep near-sorted lists for v4/v3.
            from ..ops.pallas.render_kernel_v5 import resident_fits_v5
            use_scan = (composite_mode in ("scan", "scanq")
                        and resident_fits_v5(capacity, cull_cluster))
            if use_scan:
                # the streaming composite is most accurate when candidates
                # arrive in expected per-ray depth order: re-sort each
                # tile's list by cluster-CENTER depth along the tile's mean
                # direction (near-sorted lists bias large clusters early,
                # measured ~1.5x worse misordering error)
                tpo = ro_k.reshape(-1, tile_p, 3).mean(1)
                tpd = rd_k.reshape(-1, tile_p, 3).mean(1)
                tpd = tpd / jnp.maximum(
                    jnp.linalg.norm(tpd, axis=-1, keepdims=True), 1e-12)
                cid = jnp.where(cands < 0, 0, cands)
                # HIGHEST: at the default bf16 matmul precision the depth
                # keys round differently on TPU vs CPU, permuting near-tie
                # candidates and making the streaming composite order
                # backend-dependent (hw_equality scan_b2 divergence, r5)
                cdep = jnp.einsum(
                    "tmc,tc->tm", bounds.center[cid] - tpo[:, None, :], tpd,
                    precision=jax.lax.Precision.HIGHEST)
                ckey = jnp.where(cands < 0, jnp.inf, cdep)
                corder = jnp.argsort(ckey, axis=1)
                cands = jnp.take_along_axis(cands, corder, axis=1)
                cnear = jnp.take_along_axis(cnear, corder, axis=1)
            mc = cands.shape[1]
            tpc = rays_per_call // tile_p    # tiles per kernel call

            def one_call(args):
                ro, rd, al, ts, cd, cn, nm = args
                # VMEM-resident kernel when the packed scene fits on-chip
                # (no per-chunk HBM fetches - the measured v3 bottleneck);
                # streaming v3 otherwise
                if use_scan:
                    from ..ops.pallas.render_kernel_v6 import (
                        pallas_render_culled_v6,
                    )
                    from ..ops.pallas.render_kernel_v7 import (
                        pallas_render_culled_v7,
                    )

                    kern = (pallas_render_culled_v7
                            if composite_mode == "scanq"
                            else pallas_render_culled_v6)
                else:
                    kern = (pallas_render_culled_v4
                            if resident_fits(capacity)
                            else pallas_render_culled_v3)
                extra = {}
                if use_scan:
                    if scan_pack is not None:
                        extra["tpack"] = scan_pack
                    extra["stats"] = kernel_stats
                    if composite_mode == "scanq":
                        extra["attr_precision"] = attr_precision
                out = kern(
                    ro, rd, gpack, cd, cn, nm, near, zfar,
                    exp_power_static, jnp.float32(1.0 if step > 0 else 0.0),
                    settings.backfacing_max_dist,
                    settings.backfacing_invalid_normal_threshold,
                    transmittance_threshold=settings.transmittance_threshold,
                    eps_forward_normalization=(
                        settings.eps_forward_normalization),
                    max_hits=K_p, cluster=cull_cluster, tile=tile_p,
                    interpret=interpret, alive=al,
                    t_split=ts, window_mode=wmode,
                    # the bounce index is a Python constant: compile the
                    # backfacing-reject test out of primary passes (~15%
                    # of the pair math) instead of gating it on the traced
                    # `secondary` scalar
                    secondary_static=1 if step > 0 else 0,
                    **extra,
                )
                return out

            out = jax.lax.map(one_call, (
                ro_k.reshape(n_call, rays_per_call, 3),
                rd_k.reshape(n_call, rays_per_call, 3),
                al_k.reshape(n_call, rays_per_call),
                ts_k.reshape(n_call, rays_per_call),
                cands.reshape(n_call, tpc, mc),
                cnear.reshape(n_call, tpc, mc),
                num.reshape(n_call, tpc),
            ))
            out = out.reshape(Rp, -1)
            if inv_p is not None:
                out = out[inv_p]
                tdrop_ray = tdrop_ray[inv_p]
            return unpack_composite(out), tdrop_ray

        if not split_far:
            zeros_ts = jnp.zeros((Rp,), jnp.float32)
            comp, tdrop_ray = run_pass(
                rays_o_k, rays_d_k, alive_k, zeros_ts, near, zfar,
                mc_step, tile_step, 0, inv_order,
            )
            starved_step = _starved(tdrop_ray, zfar, comp["full_T"], alive,
                                    settings.transmittance_threshold)
        else:
            ts = split_exit_t(rays_o, rays_d)
            ts_k = ts[order] if order is not None else ts
            # near pass: per-tile depth window capped at the tile's largest
            # split distance (shell clusters cull out of the window)
            far_n = jnp.max(ts_k.reshape(-1, tile_step), axis=1)
            comp_n, tdrop_n = run_pass(
                rays_o_k, rays_d_k, alive_k, ts_k, near, far_n,
                mc_step, tile_step, 1, inv_order,
            )
            # far pass: saturated rays are dead; secondary rays re-sort by
            # DIRECTION (the shell is at near-constant distance, so a
            # direction-coherent tile's cone sees only a few shell clusters)
            alive_f = alive & (comp_n["full_T"] >
                               settings.transmittance_threshold)
            if step > 0:
                dirm = morton_codes(rays_d, -jnp.ones(3), jnp.ones(3),
                                    bits=5)
                posm = morton_codes(rays_o, scene_lo, scene_hi, bits=2)
                keys_f = (
                    jnp.where(alive_f, jnp.uint32(0), jnp.uint32(1 << 26))
                    | (dirm << 6) | posm
                )
                order_f = jnp.argsort(keys_f)
                inv_f = jnp.zeros_like(order_f).at[order_f].set(
                    jnp.arange(Rp, dtype=order_f.dtype))
                ro_f = rays_o[order_f]
                rd_f = rays_d[order_f]
                al_f = alive_f[order_f]
                ts_f = ts[order_f]
            else:
                inv_f = None
                ro_f, rd_f, al_f, ts_f = rays_o, rays_d, alive_f, ts
            near_f = jnp.min(ts_f.reshape(-1, tile_step), axis=1)
            comp_f, tdrop_f = run_pass(
                ro_f, rd_f, al_f, ts_f, near_f, zfar,
                mc_far, tile_step, 2, inv_f,
                K_p=max_hits_far or max_hits,
            )
            # exact combine: every far hit is behind every near hit, so the
            # far pass composites into the near pass's remaining
            # transmittance (linear in the per-hit weights -> all
            # accumulated attributes combine the same way)
            fTn = comp_n["full_T"]
            comp = dict(
                rgb=comp_n["rgb"] + fTn[:, None] * comp_f["rgb"],
                normal=comp_n["normal"] + fTn[:, None] * comp_f["normal"],
                f0=comp_n["f0"] + fTn[:, None] * comp_f["f0"],
                roughness=comp_n["roughness"] + fTn * comp_f["roughness"],
                depth=comp_n["depth"] + fTn * comp_f["depth"],
                T_final=comp_n["T_final"] * comp_f["T_final"],
                full_T=fTn * comp_f["full_T"],
            )
            starved_step = jnp.maximum(
                _starved(tdrop_n, ts, comp_n["full_T"], alive,
                         settings.transmittance_threshold),
                _starved(tdrop_f, zfar, comp["full_T"], alive_f,
                         settings.transmittance_threshold),
            )

        rgb_step = (comp["rgb"] if step == 0
                    else comp["rgb"] * throughput)
        nlen = jnp.linalg.norm(comp["normal"], axis=-1)
        eff_normal = comp["normal"] / jnp.maximum(nlen, 1e-20)[:, None]
        eff_roughness = jnp.maximum(comp["roughness"],
                                    settings.eps_min_roughness)
        next_alive = alive & (
            nlen >= settings.reflection_invalid_normal_threshold
        )
        u = us[step]
        eff_position = rays_o + comp["depth"][:, None] * rays_d
        next_dir = ggx.sample_cook_torrance(
            eff_normal, -rays_d, eff_roughness, u
        )
        next_origin = eff_position + settings.eps_ray_surface_offset * next_dir
        w = ggx.cook_torrance_weight(
            eff_normal, -rays_d, next_dir, eff_roughness, comp["f0"]
        )
        next_throughput = jnp.where(
            next_alive[:, None], throughput * jnp.nan_to_num(w), 0.0
        )
        # throughput cutoff (default off, see RenderSettings): a ray whose
        # max-channel throughput is <= the threshold composites nothing
        # visible at any later bounce - its tiles drop out of the next
        # pass's wavefront entirely after the liveness re-sort
        next_alive &= (
            jnp.max(next_throughput, axis=-1)
            > settings.secondary_throughput_threshold
        )
        outs.append(
            dict(
                rgb=rgb_step, normal=comp["normal"], f0=comp["f0"],
                roughness=comp["roughness"], depth=comp["depth"],
                transmittance=comp["T_final"],
                total_transmittance=comp["full_T"],
                throughput=next_throughput,
                alive=alive.astype(jnp.float32),
                overflow=starved_step,
            )
        )
        rays_o, rays_d = next_origin, next_dir
        throughput = next_throughput
        alive = next_alive

    stacked = StepOutputs(
        **{k: jnp.stack([o[k] for o in outs], axis=0) for k in outs[0]}
    )
    final = jnp.sum(stacked.rgb, axis=0)
    return stacked, final


@partial(
    jax.jit,
    static_argnames=("width", "height", "num_bounces", "max_hits", "jitter",
                     "exp_power_static", "cull_cluster", "max_clusters",
                     "split_far", "mc_far", "split_radius_scale",
                     "max_hits_far", "composite_mode",
                     "rays_per_call", "interpret", "max_clusters_secondary",
                     "cull_tile_secondary", "cull_tile_primary",
                     "kernel_stats", "attr_precision"),
)
def render_frame_fused(
    scene: GaussianScene,
    camera: CameraParams,
    settings: RenderSettings,
    key,
    width: int,
    height: int,
    num_bounces: int = 2,
    max_hits: int = 32,
    jitter: bool = True,
    exp_power_static: float = 3.0,
    cull_cluster: int = 256,
    max_clusters: int = 64,
    rays_per_call: int = 65536,
    interpret: bool = False,
    max_clusters_secondary: int | None = None,
    cull_tile_secondary: int = 256,
    cull_tile_primary: int = 256,
    split_far: bool = False,
    mc_far: int = 32,
    split_radius_scale: float = 1.5,
    max_hits_far: int = 0,
    composite_mode: str = "kbuffer",
    kernel_stats: bool = True,
    attr_precision: str = "highest",
):
    """Whole-frame render where each bounce is ONE fused Pallas kernel.

    `kernel_stats=False` compiles the per-pair diagnostic counters
    (num_accumulated / num_traversed / chunks) out of the scan kernels -
    the inference-FPS configuration; the k-buffer kernels ignore it.
    `attr_precision="bf16"` drops the scanq attribute dot from 6-pass
    f32-exact to single-pass bf16 (the weights are non-negative
    compositing weights, no cancellation - only the quadric FEATURE dots
    need f32-exact); Mosaic supports no intermediate precision.

    `composite_mode="scan"` swaps the top-K k-buffer kernel for the v6
    drain-free streaming scan composite (ops/pallas/render_kernel_v6.py):
    ~2.6x faster per pass (measured round 4), composites ALL hits (no K
    cap) in streaming (cluster-center, within-cluster depth presorted)
    order instead of exact per-ray t order - the inference fast path for
    measure_fps / viewer / preview; training keeps "kbuffer" (the backward
    replays exact slot records).  Requires the packed scene VMEM-resident
    (falls back to the k-buffer kernel otherwise) and supports
    cull_cluster down to 32 (8-sublane slicing).

    The kernel (ops/pallas/render_kernel.py) does trace + top-K + composite
    + truncated-tail correction; only the per-ray bounce epilogue (normal
    normalization, GGX sampling, throughput - shaders.cu:116-146) remains in
    XLA.  The frame is chunked into `rays_per_call` slabs purely to respect
    the SMEM scalar-prefetch budget for the candidate lists.

    Requires sqrt(cull_tile_primary) | height and | width (square pixel
    tiles for the bounding cones; 16x16 at the default 256) and the scene
    capacity padded to cull_cluster; render_frame is the general fallback
    (fused_path_ok gates on the default tiling).

    `split_far=True` renders each bounce as TWO kernel passes partitioned
    EXACTLY by hit distance against a per-ray split-sphere exit t (auto
    sphere: live-centroid center, split_radius_scale x median live radius):
    a near pass (t < t_split) in the usual tiling, then a far pass
    (t > t_split) over DIRECTION-sorted rays, composited behind the near
    pass via the transmittance product (exact because every far hit is
    farther than every near hit by construction).  The far-field shell -
    the measured cause of secondary-ray candidate starvation (RESULTS.md
    round 3: escaping GGX rays traverse ~100 unsaturated shell clusters) -
    culls by ray DIRECTION in the far pass, so `max_clusters_secondary`
    can shrink toward the near-scene budget while `mc_far` (default 32)
    covers the shell, and rays saturated by the near pass skip the far
    pass entirely (per-ray aliveness gate)."""
    num_steps = num_bounces + 1
    prep = _prepare_fused_frame(
        scene, camera, settings, key, width, height, jitter=jitter,
        cull_cluster=cull_cluster, cull_tile_primary=cull_tile_primary,
        num_steps=num_steps, split_far=split_far,
        split_radius_scale=split_radius_scale, composite_mode=composite_mode,
    )
    dirs, us, ray_inv, R = prep["dirs"], prep["us"], prep["ray_inv"], prep["R"]
    rays_per_call = min(rays_per_call, R)
    # SMEM scalar-prefetch budget: every pass prefetches its whole call's
    # candidate lists - candidates (i32) + cand_near (f32) per tile for the
    # k-buffer kernels, one bit-packed i32 word for the scan kernels.  The
    # core has ~1 MB SMEM shared with spills/windows; cap the pair at 0.5 MB
    # by shrinking rays_per_call (more, smaller kernel calls - the resident
    # gpack block re-DMAs per call at ~13 us, noise next to a multi-ms pass).
    # r4's sweep2_split configs died here with a 512 KB operand + overflow.
    _pad8 = lambda m: (m + 7) // 8 * 8  # noqa: E731
    cand_bytes = 4.0 if composite_mode in ("scan", "scanq") else 8.0
    per_ray = max(
        _pad8(max_clusters) / cull_tile_primary,
        _pad8(max_clusters_secondary or max_clusters) / cull_tile_secondary,
        (_pad8(mc_far) / cull_tile_secondary if split_far else 0.0),
    ) * cand_bytes
    tile_lcm = max(cull_tile_primary, cull_tile_secondary)
    # 0.4 MB, not 0.5: the r5 sweep_split run measured ~0.5 MB of windows
    # and spills next to the prefetched lists and still overflowed the 1 MB
    # SMEM by 1.6 KB at tile_s=64 with the 0.5 MB cap
    cap = max(tile_lcm, int(0.4 * 2**20 / per_ray) // tile_lcm * tile_lcm)
    rays_per_call = min(rays_per_call, cap)
    assert R % 256 == 0
    n_call = (R + rays_per_call - 1) // rays_per_call
    pad = n_call * rays_per_call - R
    if pad:
        # duplicate leading rays into the padded tail (their outputs are
        # sliced off below); the uniforms pad identically so the per-pixel
        # sample stream is unchanged
        dirs = jnp.concatenate([dirs, dirs[:pad]], axis=0)
        us = jnp.concatenate([us, us[:, :pad]], axis=1)
    Rp = n_call * rays_per_call
    rays_o = jnp.broadcast_to(camera.origin, (Rp, 3))

    stacked, final = _fused_bounce_core(
        rays_o, dirs, us, prep["gpack"], prep["bounds"], prep["scene_lo"],
        prep["scene_hi"], prep["split_c"], prep["r_split"], settings,
        camera.znear, camera.zfar,
        capacity=scene.capacity, num_bounces=num_bounces, max_hits=max_hits,
        exp_power_static=exp_power_static, cull_cluster=cull_cluster,
        max_clusters=max_clusters, rays_per_call=rays_per_call,
        interpret=interpret, max_clusters_secondary=max_clusters_secondary,
        cull_tile_secondary=cull_tile_secondary,
        cull_tile_primary=cull_tile_primary, split_far=split_far,
        mc_far=mc_far, max_hits_far=max_hits_far,
        composite_mode=composite_mode, scan_pack=prep["scan_pack"],
        kernel_stats=kernel_stats, attr_precision=attr_precision,
    )
    unpad = jax.tree_util.tree_map(lambda a: a[:, :R][:, ray_inv], stacked)
    return unpad, final[:R][ray_inv]


def fused_path_ok(scene: GaussianScene, width: int, height: int,
                  cull_cluster: int, composite_mode: str = "kbuffer") -> bool:
    """Static shape conditions for render_frame_fused (16x16 pixel tiles,
    cluster-padded capacity).  The k-buffer kernels slice gpack on the LANE
    dim at cluster granularity, which Mosaic cannot compile below 128; the
    scan kernels slice sublanes of a transposed resident pack, so 32
    suffices - but only when the pack actually fits VMEM
    (resident_fits_v5).  A scan request that would fall back to the
    k-buffer kernel therefore needs >=128 too (ADVICE r4 high)."""
    if height % 16 or width % 16 or scene.capacity % cull_cluster:
        return False
    if composite_mode in ("scan", "scanq"):
        from ..ops.pallas.render_kernel_v5 import resident_fits_v5
        if resident_fits_v5(scene.capacity, cull_cluster):
            return cull_cluster >= 32
    return cull_cluster >= 128


@partial(
    jax.jit,
    static_argnames=("width", "height", "num_bounces", "max_hits", "jitter",
                     "spp", "exp_power_static", "cull_cluster",
                     "max_clusters", "rays_per_call", "interpret",
                     "max_clusters_secondary", "cull_tile_secondary",
                     "cull_tile_primary", "split_far", "mc_far",
                     "split_radius_scale", "max_hits_far"),
)
def render_accumulated_fused(
    scene: GaussianScene,
    camera: CameraParams,
    settings: RenderSettings,
    key,
    width: int,
    height: int,
    spp: int = 8,
    num_bounces: int = 2,
    max_hits: int = 32,
    jitter: bool = True,
    exp_power_static: float = 3.0,
    cull_cluster: int = 256,
    max_clusters: int = 64,
    rays_per_call: int = 65536,
    interpret: bool = False,
    key_offset=0,
    max_clusters_secondary: int | None = None,
    cull_tile_secondary: int = 256,
    cull_tile_primary: int = 256,
    split_far: bool = False,
    mc_far: int = 32,
    split_radius_scale: float = 1.5,
    max_hits_far: int = 0,
):
    """SPP accumulation over the fused whole-frame path (one HLO instance).

    `key_offset` (traced) shifts the per-sample RNG fold so host-side SPP
    chunking (render_accumulated_chunked) reproduces the exact sample stream
    of a single big dispatch."""
    key_offset = jnp.asarray(key_offset, jnp.int32)

    def one(k):
        return render_frame_fused.__wrapped__(
            scene, camera, settings, k, width, height, num_bounces, max_hits,
            jitter, exp_power_static, cull_cluster, max_clusters,
            rays_per_call, interpret, max_clusters_secondary,
            cull_tile_secondary, cull_tile_primary,
            split_far, mc_far, split_radius_scale, max_hits_far,
        )

    def body(i, acc):
        return jax.tree_util.tree_map(
            lambda a, b: a + b, acc, one(jax.random.fold_in(key, key_offset + i))
        )

    first = one(jax.random.fold_in(key, key_offset))
    if spp > 1:
        steps, final = jax.lax.fori_loop(1, spp, body, first)
    else:
        steps, final = first
    inv = 1.0 / spp
    return jax.tree_util.tree_map(lambda a: a * inv, steps), final * inv


def render_accumulated_chunked(
    scene: GaussianScene,
    camera: CameraParams,
    settings: RenderSettings,
    key,
    width: int,
    height: int,
    spp: int = 128,
    spp_chunk: int = 16,
    *,
    fused: bool = True,
    **kwargs,
):
    """Host-chunked SPP accumulation: <= spp_chunk samples per device
    dispatch, averaged on the host.

    Very long single dispatches (a 128-iteration on-device SPP fori over a
    whole frame) trip the device watchdog (round-2 parity eval crashed after
    2/8 views - RESULTS.md); the reference's accumulator design is also
    one launch per sample (render.py:197-206, framebuffer.h:104-128).  The
    sample stream is IDENTICAL to the single-dispatch path via key_offset,
    so chunked == unchunked up to float re-association (tested in
    tests/test_render_small.py)."""
    def dispatch(m, done):
        if fused:
            return render_accumulated_fused(
                scene, camera, settings, key, width, height, spp=m,
                key_offset=done, **kwargs,
            )
        return render_accumulated(
            scene, camera, settings, jax.random.fold_in(key, done),
            width, height, spp=m, **kwargs,
        )

    acc = None
    done = 0
    pending = None  # (m, device pytree): fetch one chunk BEHIND the
    # dispatches so the device->host transfer overlaps the next chunk's
    # compute (dispatch is async; the f64 host accumulation is unchanged)
    while done < spp:
        m = min(spp_chunk, spp - done)
        cur = (m, dispatch(m, done))
        done += m
        if pending is not None:
            mp, tree = pending
            part = jax.tree_util.tree_map(
                lambda a: np.asarray(a, dtype=np.float64) * (mp / spp), tree)
            acc = part if acc is None else jax.tree_util.tree_map(
                lambda a, b: a + b, acc, part)
        pending = cur
    mp, tree = pending
    part = jax.tree_util.tree_map(
        lambda a: np.asarray(a, dtype=np.float64) * (mp / spp), tree)
    acc = part if acc is None else jax.tree_util.tree_map(
        lambda a, b: a + b, acc, part)
    return jax.tree_util.tree_map(lambda a: a.astype(np.float32), acc)


@partial(
    jax.jit,
    static_argnames=("width", "height", "num_bounces", "max_hits", "chunk",
                     "tile", "jitter", "spp", "use_pallas",
                     "exp_power_static", "use_culling", "cull_tile",
                     "cull_cluster", "max_clusters", "interpret",
                     "max_clusters_secondary", "cull_tile_secondary"),
)
def render_accumulated(
    scene: GaussianScene,
    camera: CameraParams,
    settings: RenderSettings,
    key,
    width: int,
    height: int,
    spp: int = 8,
    num_bounces: int = 2,
    max_hits: int = 32,
    chunk: int = 2048,
    tile: int = 8192,
    jitter: bool = True,
    use_pallas: bool = False,
    exp_power_static: float = 3.0,
    use_culling: bool = False,
    cull_tile: int = 256,
    cull_cluster: int = 256,
    max_clusters: int = 192,
    interpret: bool = False,
    max_clusters_secondary: int | None = None,
    cull_tile_secondary: int = 256,
):
    """SPP accumulation: repeated jittered 1-spp renders averaged on device.

    The TPU equivalent of the reference's in-kernel accumulators
    (framebuffer.h:104-128 + render.py:197-206): a fori_loop keeps ONE render
    instance in the HLO regardless of spp.

    `max_clusters_secondary`/`cull_tile_secondary` are fused-path-only knobs
    accepted here so `default_backend_kwargs(cfg)` splats into either path;
    the non-fused renderer re-culls every bounce with the single
    cull_tile/max_clusters budget, so they are ignored.
    """
    del max_clusters_secondary, cull_tile_secondary
    def body(i, acc):
        steps, final = render_frame.__wrapped__(
            scene, camera, settings, jax.random.fold_in(key, i),
            width, height, num_bounces, max_hits, chunk, tile, jitter,
            use_pallas, exp_power_static, use_culling, cull_tile,
            cull_cluster, max_clusters, interpret,
        )
        return jax.tree_util.tree_map(lambda a, b: a + b, acc, (steps, final))

    steps0, final0 = render_frame.__wrapped__(
        scene, camera, settings, jax.random.fold_in(key, 0),
        width, height, num_bounces, max_hits, chunk, tile, jitter,
        use_pallas, exp_power_static, use_culling, cull_tile,
        cull_cluster, max_clusters, interpret,
    )
    if spp > 1:
        steps, final = jax.lax.fori_loop(1, spp, body, (steps0, final0))
    else:
        steps, final = steps0, final0
    inv = 1.0 / spp
    return (
        jax.tree_util.tree_map(lambda a: a * inv, steps),
        final * inv,
    )
