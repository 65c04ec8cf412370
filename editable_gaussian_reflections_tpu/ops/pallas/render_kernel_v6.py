"""Render kernel v6: DRAIN-FREE streaming scan composite.

Round-4 hardware attribution (tools/bench_kernel_attr.py) split the v4
per-chunk cost ~5.6 us into ~1.65 us pair math + ~3 us top-K drain + ~1 us
staging/machinery: the replace-max drain's serial while-loop (one insert
per iteration, a scalar sync each trip, iterations set by the WORST ray in
the tile) is the dominant cost and is fundamentally anti-SIMD.  v5 then
showed that halving the pair volume (cluster=64) does not move the needle -
the drain and fixed costs own the clock.

v6 removes the drain, the slots, and the staging buffers entirely.  It
composites hits in STREAMING ORDER - candidates arrive depth-sorted by
cluster-near (ops/culling.select_candidates), and hits within a chunk
composite in table order - using an exclusive prefix-PRODUCT of (1-alpha)
over the chunk's sublanes (log2(C) roll/multiply steps, zero scalar syncs;
round 5 moved the scan from log space to product space, deleting the
per-pair log1p and exp transcendentals - the composited transmittance
stays >= thr ~1e-2 until the exit check, so f32 products cannot
underflow where they matter):

    T_before[i] = T_comp * prod_{j<i in chunk} (1 - alpha_j)
    w[i]        = T_before[i] * alpha[i]          (while T_before >= thr)

Per-chunk attribute accumulation is ONE MXU dot (g_attr [C,16] x w [C,R]
-> [16, R]), replacing the per-insertion extraction dots.  There is no
K-hit cap: every valid hit composites until saturation, which is CLOSER to
the reference's forward loop (forward_pass.cu:49-137 composites up to
BUFFER_SIZE*MAX_ITERATIONS hits, truncating only at transmittance 0.01)
than the v3/v4/v5 top-K=16 + tail-redistribution design.

The approximation v6 makes instead: hits composite in (cluster-near,
table-index) order, not exact per-ray t order - the same sorted-order
compositing approximation every 3DGS rasterizer makes globally, here at
cluster granularity.  Misordering error is bounded by the product of the
overlapping alphas and vanishes where neighbors share attributes (surface
patches).  tests/test_render_kernel_v6.py measures it against the exact
kernels; the renderer exposes it as composite_mode="scan" for the
inference paths (measure_fps, render, viewer), keeping the exact k-buffer
for training parity.

Layout is v5's transposed world: tpack [N, 128] f32 (gaussians on
SUBLANES -> 8-gaussian dynamic-slice granularity, so cluster=32/64 fine
culling works), rays on lanes, pair math via _pair_math_t
(shaders.cu:9-75 parity).  Output block [OUT_LANES, R], wrapper returns
canonical [R, OUT_LANES].
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .render_kernel import OUT_LANES, TABLE_A
from .render_kernel_v3 import (
    STRIPE_F0,
    STRIPE_NRM,
    STRIPE_RGB,
    STRIPE_ROUGH,
)
from .render_kernel_v5 import GROW0, LANES, _pair_math_t, pack_frames_lanes

# misc accumulator rows
_M_COMP = 0    # composited transmittance, LINEAR (frozen at saturation)
_M_FULL = 1    # FULL transmittance over all valid hits, LINEAR (tail term)
_M_DEPTH = 2   # sum w * t
_M_NUM = 3     # composited-hit count
_M_TRAV = 4    # traversed (gvalid) count
_M_CHUNK = 5   # chunks computed (not skipped)
_M_ROWS = 8


def _render_kernel_v6(
    cand_ref, scalar_ref, rays_ref, tpack_ref,
    out_ref,
    attr_acc, misc_acc,
    *, cluster: int, exp_power: float, check_every: int,
    window_mode: int = 0, secondary_static: int = -1, stats: bool = True,
):
    ti = pl.program_id(0)
    thr = scalar_ref[6]
    eps_norm = scalar_ref[7]
    R = rays_ref.shape[1]
    CE = check_every
    mc = cand_ref.shape[1]
    n_groups = mc // CE
    C = cluster

    attr_acc[:] = jnp.zeros_like(attr_acc)
    misc_acc[:] = jnp.zeros_like(misc_acc)
    misc_acc[_M_COMP:_M_FULL + 1, :] = jnp.ones((2, R), jnp.float32)

    dead_all = jnp.all(rays_ref[6, :] <= 0.0)
    row = jax.lax.broadcasted_iota(jnp.int32, (C, R), 0)

    def compute_chunk(ci):
        c = cand_ref[ti, ci] & jnp.int32(0xFFFF)
        off = pl.multiple_of(c * C, C)
        g = tpack_ref[pl.ds(off, C), :]
        tt, alpha, valid, gvalid = _pair_math_t(
            scalar_ref, rays_ref, g, exp_power=exp_power,
            window_mode=window_mode, secondary_static=secondary_static)
        oma = jnp.where(valid, 1.0 - alpha, 1.0)

        # exclusive prefix product over sublanes: Hillis-Steele on the
        # shift-by-one sequence (ex[i] = prod_{j<i} oma[j])
        ex = jnp.where(row >= 1, pltpu.roll(oma, shift=1, axis=0), 1.0)
        s = 1
        while s < C:
            ex = ex * jnp.where(row >= s, pltpu.roll(ex, shift=s, axis=0),
                                1.0)
            s *= 2

        tc = misc_acc[_M_COMP:_M_COMP + 1, :]
        t_before = tc * ex
        cmask = valid & (t_before >= thr)
        w = jnp.where(cmask, t_before * alpha, 0.0)

        attr_acc[:] += jax.lax.dot_general(
            g[:, GROW0:GROW0 + TABLE_A], w,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )                                                        # [16, R]
        # t_after = t_before * oma is non-increasing along the chunk, so
        # the composited (thresholded, a PREFIX of the chunk) and full
        # updates are both MIN reductions - no masked products needed
        t_after = t_before * oma
        misc_acc[_M_COMP:_M_COMP + 1, :] = jnp.min(
            jnp.where(cmask, t_after, tc), axis=0, keepdims=True)
        misc_acc[_M_FULL:_M_FULL + 1, :] *= jnp.min(
            ex * oma, axis=0, keepdims=True)
        misc_acc[_M_DEPTH:_M_DEPTH + 1, :] += jnp.sum(
            w * tt, axis=0, keepdims=True)
        if stats:
            misc_acc[_M_NUM:_M_NUM + 1, :] += jnp.sum(
                cmask.astype(jnp.float32), axis=0, keepdims=True)
            misc_acc[_M_TRAV:_M_TRAV + 1, :] += jnp.broadcast_to(
                jnp.sum(gvalid, axis=0, keepdims=True), (1, R))
            misc_acc[_M_CHUNK:_M_CHUNK + 1, :] += jnp.broadcast_to(
                jnp.max(gvalid, axis=0, keepdims=True), (1, R))

    def cond(st):
        g, done = st
        return (g < n_groups) & ~done

    def body(st):
        g, _ = st
        base = g * CE
        saturated = misc_acc[_M_COMP:_M_COMP + 1, :] <= thr
        # no slot-kth "behind" test in scan mode: with no K cap, the only
        # reference-faithful exit is saturation (forward_pass.cu:131-134);
        # the packed cand near bits still give a cheap all-empty check
        empty = (cand_ref[ti, base] & jnp.int32(-65536)) >= 0x7F000000
        done = jnp.all(saturated) | dead_all | empty

        @pl.when(~done)
        def _group():
            for j in range(CE):
                compute_chunk(base + j)

        return (g + 1, done)

    jax.lax.while_loop(cond, body, (jnp.int32(0), dead_all))

    # epilogue: truncated-tail redistribution (forward_pass.cu:142-155)
    t_final = misc_acc[_M_COMP:_M_COMP + 1, :]
    full_t = misc_acc[_M_FULL:_M_FULL + 1, :]
    remaining_t = t_final - full_t
    norm = jnp.maximum(1.0 - t_final, eps_norm)
    factor = 1.0 + remaining_t / norm

    attr_stripes = (
        [STRIPE_RGB + i for i in range(3)]
        + [STRIPE_NRM + i for i in range(3)]
        + [STRIPE_F0 + i for i in range(3)]
        + [STRIPE_ROUGH]
    )
    rows = [attr_acc[a:a + 1, :] * factor for a in attr_stripes]
    rows += [
        misc_acc[_M_DEPTH:_M_DEPTH + 1, :] * factor,
        t_final,
        full_t,
        misc_acc[_M_NUM:_M_NUM + 1, :],
        misc_acc[_M_TRAV:_M_TRAV + 1, :],
        misc_acc[_M_CHUNK:_M_CHUNK + 1, :],
    ]
    out_ref[:] = jnp.concatenate(rows, axis=0)


@partial(
    jax.jit,
    static_argnames=("exp_power", "max_hits", "cluster", "tile", "interpret",
                     "check_every", "window_mode", "secondary_static",
                     "stats"),
)
def pallas_render_culled_v6(
    rays_o, rays_d, gpack, candidates, cand_near, num, near, far,
    exp_power, secondary, backfacing_max_dist,
    backfacing_invalid_normal_threshold,
    transmittance_threshold=0.01, eps_forward_normalization=1e-12,
    max_hits: int = 16, cluster: int = 64, tile: int = 128,
    interpret: bool = False, alive=None, check_every: int = 8,
    t_split=None, window_mode: int = 0, secondary_static: int = -1,
    tpack=None, stats: bool = True,
):
    """Streaming scan-composite trace.  Same contract as
    pallas_render_culled_v4/v5 (max_hits accepted for signature parity but
    unused - there is no K cap) - returns [R, OUT_LANES] f32.

    `tpack` optionally supplies the [N+cluster, 128] transposed pack
    prepared once per frame (prepare_scan_pack) so callers inside
    lax.map/scan don't re-run the O(N) repack per iteration."""
    del max_hits
    R = rays_o.shape[0]
    N = gpack.shape[1]
    assert N % cluster == 0 and R % tile == 0
    n_tiles = R // tile

    if tpack is None:
        tpack = pack_frames_lanes(jnp.pad(gpack, ((0, 0), (0, cluster))))
    assert tpack.shape == (N + cluster, LANES), (tpack.shape, N, cluster)
    assert N // cluster < 0xFFFF, "cluster ids must fit 16 bits for packing"
    dummy = jnp.int32(N // cluster)
    mc0 = candidates.shape[1]
    mc = ((mc0 + check_every - 1) // check_every) * check_every
    if mc != mc0:
        candidates = jnp.pad(candidates, ((0, 0), (0, mc - mc0)),
                             constant_values=-1)
        cand_near = jnp.pad(cand_near, ((0, 0), (0, mc - mc0)),
                            constant_values=3.0e38)
    empty = candidates < 0
    candidates = jnp.where(empty, dummy, candidates)
    near_f = jnp.where(empty, jnp.float32(3.0e38),
                       jnp.maximum(cand_near, 0.0).astype(jnp.float32))
    near_hi = jax.lax.bitcast_convert_type(near_f, jnp.int32) & jnp.int32(
        -65536)
    candidates = near_hi | candidates

    alive_col = (jnp.ones((R, 1), jnp.float32) if alive is None
                 else alive.reshape(R, 1).astype(jnp.float32))
    split_col = (jnp.zeros((R, 1), jnp.float32) if t_split is None
                 else t_split.reshape(R, 1).astype(jnp.float32))
    rays_t = jnp.concatenate(
        [rays_o, rays_d, alive_col, split_col], axis=1
    ).astype(jnp.float32).T                                    # [8, R]
    scalars = jnp.stack([
        jnp.asarray(near, jnp.float32),
        jnp.asarray(far, jnp.float32),
        jnp.zeros((), jnp.float32),
        jnp.asarray(secondary, jnp.float32),
        jnp.asarray(backfacing_max_dist, jnp.float32),
        jnp.asarray(backfacing_invalid_normal_threshold, jnp.float32),
        jnp.asarray(transmittance_threshold, jnp.float32),
        jnp.asarray(eps_forward_normalization, jnp.float32),
        jnp.zeros((), jnp.float32),
        jnp.zeros((), jnp.float32),  # slot 9 (was log_thr; scan is linear)
    ])

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((8, tile), lambda ti, cand: (0, ti),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((N + cluster, LANES),
                         lambda ti, cand: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((OUT_LANES, tile),
                               lambda ti, cand: (0, ti),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((TABLE_A, tile), jnp.float32),
            pltpu.VMEM((_M_ROWS, tile), jnp.float32),
        ],
    )
    out_t = pl.pallas_call(
        partial(_render_kernel_v6, cluster=cluster,
                exp_power=float(exp_power), check_every=check_every,
                window_mode=window_mode,
                secondary_static=secondary_static, stats=stats),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((OUT_LANES, R), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024),
        interpret=interpret,
    )(candidates, scalars, rays_t, tpack)
    return out_t.T
