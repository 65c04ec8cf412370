"""Render kernel v5: TRANSPOSED pair blocks (rays on lanes) + fine clusters.

Round-4 hardware attribution (tools/bench_kernel_attr.py) put the v4 kernel
at ~1.65 us of pair math per [256 x 128] chunk plus ~0.9 us per drain
insertion, with the secondary bounce computing ~160 chunks/tile - and
tools/probe_cand_stats.py showed the candidate-cluster count growing only
~1.2-1.4x when the cluster size halves, i.e. PAIR VOLUME shrinks ~1.5-1.7x
at cluster=64 and ~2-3x at cluster=32.  The v3/v4 layout cannot exploit
that: a gpack block is [32, C] with gaussians on LANES, and Mosaic only
slices the lane dimension at 128-alignment (the measured cluster=64 compile
failure in artifacts/r4_backlog/sweep2_split_c64.log).

v5 transposes the world:

  * `tpack` is [N, 128] f32 - gaussians on SUBLANES (dynamic slicing at
    8-gaussian granularity), attributes on lanes (gpack's 32 rows in cols
    0..31; the 128-lane row is padded anyway, so the layout costs nothing
    extra in VMEM beyond the pad).  The whole table rides VMEM-resident
    exactly like v4 (100k gaussians = 51 MB).
  * a pair block is [C, R]: per-gaussian attrs broadcast as [C, 1] columns,
    per-ray o/d as [1, R] rows from a transposed [8, R] ray block.  The
    intersection algebra is unchanged (shaders.cu:9-75 parity - identical
    to render_kernel._pair_math, transposed).
  * cull granularity decouples from DRAIN granularity: each fine chunk's
    (t, alpha) planes and attr columns are STAGED into [SPAN, R] buffers
    (SPAN = 128 gaussians = span_chunks clusters), and the replace-max
    top-K drain runs once per span - so the while-loop scalar syncs and
    per-insert costs stay at their v4 per-128-gaussian rate while the pair
    math only touches the clusters the finer culling kept.
  * slots live transposed too ([16 stripes * K sublanes, R lanes]); the
    per-hit extraction is one [S, R]x[S, 16] MXU dot and the insert commit
    a single masked write, as in v3/v4.

Output is [OUT_LANES, R] (transposed composite; the wrapper returns the
canonical [R, OUT_LANES] so callers and tests are agnostic).  Equality vs
the v4 kernel is asserted in tests/test_render_kernel_v5.py.

STATUS (round 5): the v5 KERNEL is a measured dead-end kept as a BENCHMARK
FIXTURE only - on hardware the per-span drain still dominated (see
RESULTS.md round 4), and the drain-free v6/v7 scan kernels supersede it.
Production code imports only the layout helpers defined here
(`pack_frames_lanes`, `resident_fits_v5`), which v6/v7 build on; the
kernel itself is reachable solely from tools/bench_v5.py and its tests.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .render_kernel import OUT_LANES, TABLE_A
from .render_kernel_v3 import (
    SB,
    STRIPE_ALPHA,
    STRIPE_F0,
    STRIPE_NRM,
    STRIPE_RGB,
    STRIPE_ROUGH,
    STRIPE_T,
)
from .trace_kernel import (
    INF,
    N_ROWS,
    ROW_INV,
    ROW_MEAN,
    ROW_NLEN,
    ROW_NRM,
    ROW_OPACITY,
    ROW_ROT,
    ROW_SF2,
    ROW_VALID,
)

GROW0 = 16          # first tpack column staged for the drain (attrs live
                    # in cols 16..31, mirroring gpack rows - see trace_kernel)
LANES = 128         # tpack row width (pad target)


def pack_frames_lanes(gpack: jnp.ndarray) -> jnp.ndarray:
    """[N_ROWS, N] gpack -> [N, 128] tpack (attributes on lanes)."""
    return jnp.pad(gpack.T, ((0, 0), (0, LANES - gpack.shape[0])))


def _pair_math_t(scalar_ref, rays_ref, g, *, exp_power: float,
                 window_mode: int = 0, secondary_static: int = -1):
    """Transposed twin of render_kernel._pair_math: returns (t, alpha,
    valid, gvalid) as [C, R] planes.  `g` is a [C, 128] tpack slice;
    `rays_ref` a [8, R] block (rows o3/d3/alive/t_split)."""
    from ..gaussian_kernel import MAX_ALPHA

    near = scalar_ref[0]
    far = scalar_ref[1]
    secondary = scalar_ref[3]
    bf_max_dist = scalar_ref[4]
    bf_thr = scalar_ref[5]

    o = [rays_ref[i, :][None, :] for i in range(3)]
    d = [rays_ref[3 + i, :][None, :] for i in range(3)]
    mean = [g[:, ROW_MEAN + i][:, None] for i in range(3)]
    rot = [g[:, ROW_ROT + i][:, None] for i in range(9)]
    inv = [g[:, ROW_INV + i][:, None] for i in range(3)]
    opacity = g[:, ROW_OPACITY][:, None]
    sf2 = g[:, ROW_SF2][:, None]
    gvalid = g[:, ROW_VALID][:, None]

    rel = [o[j] - mean[j] for j in range(3)]
    lo = [
        inv[i] * (rot[i] * rel[0] + rot[3 + i] * rel[1] + rot[6 + i] * rel[2])
        for i in range(3)
    ]
    ld = [
        inv[i] * (rot[i] * d[0] + rot[3 + i] * d[1] + rot[6 + i] * d[2])
        for i in range(3)
    ]
    dot_ol = lo[0] * ld[0] + lo[1] * ld[1] + lo[2] * ld[2]
    dot_ll = ld[0] * ld[0] + ld[1] * ld[1] + ld[2] * ld[2]
    dot_oo = lo[0] * lo[0] + lo[1] * lo[1] + lo[2] * lo[2]
    inv_ll = 1.0 / jnp.maximum(dot_ll, 1e-30)
    t = -dot_ol * inv_ll
    sq = dot_oo - dot_ol * dot_ol * inv_ll

    valid = (gvalid > 0.0) & (dot_ol <= 0.0) & (sq <= 1.0)
    valid &= (t > near) & (t < far)
    if window_mode == 1:
        valid &= t < rays_ref[7, :][None, :]
    elif window_mode == 2:
        valid &= t > rays_ref[7, :][None, :]
    if secondary_static != 0:
        nrm = [g[:, ROW_NRM + i][:, None] for i in range(3)]
        nlen = g[:, ROW_NLEN][:, None]
        ndotd = nrm[0] * ld[0] + nrm[1] * ld[1] + nrm[2] * ld[2]
        reject = (t < bf_max_dist) & (nlen > bf_thr) & (ndotd > 0.0)
        if secondary_static == 1:
            valid &= ~reject
        else:
            valid &= jnp.logical_or(secondary <= 0.0, ~reject)
    valid &= rays_ref[6, :][None, :] > 0.0

    k2 = 2.0 * exp_power
    sqs = jnp.maximum(sq * sf2, 0.0)
    if float(exp_power).is_integer() and 1 <= exp_power <= 8:
        powered = sqs
        for _ in range(int(exp_power) - 1):
            powered = powered * sqs
    else:
        powered = jnp.power(sqs, exp_power)
    gaussval = jnp.exp(-powered / k2)
    alpha = MAX_ALPHA * gaussval * opacity
    return t, alpha, valid, gvalid


def _spread_matrix_t(K: int) -> jnp.ndarray:
    """[SB*K, TABLE_A]: stripe j's K sublanes <- value column j."""
    row = jax.lax.broadcasted_iota(jnp.int32, (SB * K, TABLE_A), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (SB * K, TABLE_A), 1)
    return (row // K == col).astype(jnp.float32)


def _drain_striped_t(stage_t_ref, stage_a_ref, stage_g_ref, slot_ref, K,
                     spread_const, max_iters: int = 0):
    """Replace-max top-K drain over a staged [S, R] span (transposed twin of
    render_kernel_v3._drain_striped; same insert-one-hit-per-iteration
    semantics with slot state on refs)."""
    S, R = stage_t_ref.shape
    sub_ids = jax.lax.broadcasted_iota(jnp.int32, (S, R), 0).astype(
        jnp.float32)
    slot_sub = jax.lax.broadcasted_iota(jnp.int32, (K, R), 0).astype(
        jnp.float32)
    stripe_sub = (jax.lax.broadcasted_iota(jnp.int32, (SB * K, R), 0) % K
                  ).astype(jnp.float32)
    srow = jax.lax.broadcasted_iota(jnp.int32, (SB * K, R), 0) // K

    t = stage_t_ref[:]
    alpha = stage_a_ref[:]
    kth0 = jnp.max(slot_ref[STRIPE_T * K:(STRIPE_T + 1) * K, :], axis=0,
                   keepdims=True)
    tmask = jnp.where(t < kth0, t, INF)
    tmin0 = jnp.min(tmask, axis=0, keepdims=True)

    def cond(st):
        return jnp.any(st[0] < st[1])

    def body(st):
        tmin, kth, tmask = st
        ins = tmin < kth                                        # [1, R]
        is_min = (tmask <= tmin) & ins                          # [S, R]
        id_sel = jnp.min(jnp.where(is_min, sub_ids, INF), axis=0,
                         keepdims=True)
        sub_oh = is_min & (sub_ids <= id_sel)                   # one sublane
        a_val = jnp.sum(jnp.where(sub_oh, alpha, 0.0), axis=0,
                        keepdims=True)
        v = jax.lax.dot_general(
            sub_oh.astype(jnp.float32), stage_g_ref[:],
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )                                                        # [R, 16]
        spread = jax.lax.dot_general(
            spread_const, v,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )                                                        # [SB*K, R]
        # t/alpha stripes come straight from the per-ray rows (no transpose)
        spread = jnp.where(srow == STRIPE_T, tmin, spread)
        spread = jnp.where(srow == STRIPE_ALPHA, a_val, spread)

        slot_t = slot_ref[STRIPE_T * K:(STRIPE_T + 1) * K, :]
        s_is_max = slot_t >= kth
        s_win = jnp.min(jnp.where(s_is_max, slot_sub, jnp.float32(1e9)),
                        axis=0, keepdims=True)
        commit = (stripe_sub == s_win) & ins                    # [SB*K, R]
        slot_ref[:] = jnp.where(commit, spread, slot_ref[:])

        new_t = slot_ref[STRIPE_T * K:(STRIPE_T + 1) * K, :]
        tmask = jnp.where(sub_oh, INF, tmask)
        tmin = jnp.min(tmask, axis=0, keepdims=True)
        kth = jnp.max(new_t, axis=0, keepdims=True)
        return (tmin, kth, tmask)

    if max_iters:
        st = (tmin0, kth0, tmask)
        for _ in range(max_iters):
            st = body(st)
    else:
        jax.lax.while_loop(cond, body, (tmin0, kth0, tmask))


def _composite_epilogue_t(scalar_ref, slot_ref, acc_ref, out_ref, K):
    """Transposed twin of _composite_epilogue_striped: [K, R] slot stripes,
    [OUT_LANES, R] output block."""
    thr = scalar_ref[6]
    eps_norm = scalar_ref[7]
    slot_t = slot_ref[STRIPE_T * K:(STRIPE_T + 1) * K, :]
    slot_alpha = slot_ref[STRIPE_ALPHA * K:(STRIPE_ALPHA + 1) * K, :]
    R = slot_t.shape[1]
    slot_sub = jax.lax.broadcasted_iota(jnp.int32, (K, R), 0).astype(
        jnp.float32)

    valid = slot_t < INF
    la = jnp.where(valid, jnp.log1p(-slot_alpha), 0.0)

    S = jnp.zeros((K, R), jnp.float32)
    for shift in range(1, K):
        ot = pltpu.roll(slot_t, shift=shift, axis=0)
        oi = pltpu.roll(slot_sub, shift=shift, axis=0)
        ola = pltpu.roll(la, shift=shift, axis=0)
        infront = (ot < slot_t) | ((ot == slot_t) & (oi < slot_sub))
        S = S + jnp.where(infront, ola, 0.0)
    T_before = jnp.exp(S)

    cmask = valid & (T_before >= thr)
    w = jnp.where(cmask, T_before * slot_alpha, 0.0)

    T_final = jnp.exp(jnp.sum(jnp.where(cmask, la, 0.0), axis=0,
                              keepdims=True))
    depth = jnp.sum(w * jnp.where(cmask, slot_t, 0.0), axis=0, keepdims=True)
    num_acc = jnp.sum(cmask.astype(jnp.float32), axis=0, keepdims=True)

    full_T = jnp.exp(acc_ref[0:1, :])
    remaining_T = T_final - full_T
    norm = jnp.maximum(1.0 - T_final, eps_norm)
    factor = 1.0 + remaining_T / norm

    attr_stripes = (
        [STRIPE_RGB + i for i in range(3)]
        + [STRIPE_NRM + i for i in range(3)]
        + [STRIPE_F0 + i for i in range(3)]
        + [STRIPE_ROUGH]
    )
    rows = [
        jnp.sum(w * slot_ref[a * K:(a + 1) * K, :], axis=0, keepdims=True)
        * factor
        for a in attr_stripes
    ]
    rows += [depth * factor, T_final, full_T, num_acc, acc_ref[1:2, :],
             acc_ref[2:3, :]]
    out_ref[:] = jnp.concatenate(rows, axis=0)


def _render_kernel_v5(
    cand_ref, scalar_ref, rays_ref, tpack_ref,
    out_ref,
    stage_t, stage_a, stage_g, slot_ref, acc_ref,
    *, K: int, cluster: int, span: int, exp_power: float,
    check_every: int, debug_mode: int = 0, window_mode: int = 0,
    secondary_static: int = -1,
):
    # cand_ref packs (bf16-truncated near << 16 | cluster id) into one SMEM
    # int32 per candidate: two scalar-prefetched [T, mc] arrays blow the
    # 1 MB SMEM budget at tile=128 (measured 1.6 KB over at 65536 rays x
    # mc 192), and a VMEM-resident cand_near cannot be scalar-indexed
    # dynamically (Mosaic refuses the vector<1x1x1xf32> load on hardware).
    # Truncating toward zero keeps packed_near <= true near for positive
    # floats, so the `behind` early-exit stays conservative; the compare
    # runs in int32 space, which orders positive IEEE floats correctly.
    ti = pl.program_id(0)
    log_thr = scalar_ref[9]
    R = rays_ref.shape[1]
    spread_const = _spread_matrix_t(K)
    DS = span // cluster            # chunks per drain span
    CE = check_every
    mc = cand_ref.shape[1]
    n_groups = mc // CE

    slot_ref[:] = jnp.zeros_like(slot_ref)
    slot_ref[STRIPE_T * K:(STRIPE_T + 1) * K, :] = jnp.full(
        (K, R), INF, jnp.float32)
    acc_ref[:] = jnp.zeros_like(acc_ref)

    dead_all = jnp.all(rays_ref[6, :] <= 0.0)

    def compute_chunk(ci, j):
        c = cand_ref[ti, ci] & jnp.int32(0xFFFF)
        off = pl.multiple_of(c * cluster, cluster)
        g = tpack_ref[pl.ds(off, cluster), :]
        tt, alpha, valid, gvalid = _pair_math_t(
            scalar_ref, rays_ref, g, exp_power=exp_power,
            window_mode=window_mode, secondary_static=secondary_static)
        acc_ref[0:1, :] += jnp.sum(
            jnp.where(valid, jnp.log1p(-alpha), 0.0), axis=0,
            keepdims=True)
        acc_ref[1:2, :] += jnp.broadcast_to(
            jnp.sum(gvalid, axis=0, keepdims=True), (1, R))
        acc_ref[2:3, :] += jnp.broadcast_to(
            jnp.max(gvalid, axis=0, keepdims=True), (1, R))
        if debug_mode != 1:
            stage_t[j * cluster:(j + 1) * cluster, :] = jnp.where(
                valid, tt, INF)
            stage_a[j * cluster:(j + 1) * cluster, :] = alpha
            stage_g[j * cluster:(j + 1) * cluster, :] = g[:, GROW0:GROW0
                                                          + TABLE_A]

    def cond(st):
        g, done = st
        return (g < n_groups) & ~done

    def body(st):
        g, _ = st
        base = g * CE
        saturated = acc_ref[0:1, :] <= log_thr
        kth = jnp.max(slot_ref[STRIPE_T * K:(STRIPE_T + 1) * K, :], axis=0,
                      keepdims=True)
        kth_bits = jax.lax.bitcast_convert_type(kth, jnp.int32)
        near_bits = cand_ref[ti, base] & jnp.int32(-65536)
        behind = kth_bits < near_bits
        done = jnp.all(saturated | behind) | dead_all

        @pl.when(~done)
        def _group():
            for blk in range(CE // DS):
                for j in range(DS):
                    compute_chunk(base + blk * DS + j, j)
                if debug_mode != 1:
                    _drain_striped_t(
                        stage_t, stage_a, stage_g, slot_ref, K,
                        spread_const,
                        max_iters=(1 if debug_mode == 2 else 0))

        return (g + 1, done)

    jax.lax.while_loop(cond, body, (jnp.int32(0), dead_all))

    _composite_epilogue_t(scalar_ref, slot_ref, acc_ref, out_ref, K)


# VMEM budget for the resident tpack: [N, 128] f32 rows
RESIDENT_TPACK_LIMIT = 96 * 1024 * 1024


def resident_fits_v5(n_capacity: int, cluster: int = 64) -> bool:
    return (n_capacity + cluster) * LANES * 4 <= RESIDENT_TPACK_LIMIT


@partial(
    jax.jit,
    static_argnames=("exp_power", "max_hits", "cluster", "tile", "interpret",
                     "check_every", "span", "debug_mode", "window_mode",
                     "secondary_static"),
)
def pallas_render_culled_v5(
    rays_o, rays_d, gpack, candidates, cand_near, num, near, far,
    exp_power, secondary, backfacing_max_dist,
    backfacing_invalid_normal_threshold,
    transmittance_threshold=0.01, eps_forward_normalization=1e-12,
    max_hits: int = 16, cluster: int = 64, tile: int = 128,
    interpret: bool = False, alive=None, check_every: int = 8,
    span: int = 128, debug_mode: int = 0, t_split=None,
    window_mode: int = 0, secondary_static: int = -1,
):
    """Transposed fine-cluster culled trace + composite.  Same contract as
    pallas_render_culled_v4 (gpack is still the [N_ROWS, N] pack from
    pack_frames; candidates/cand_near from select_candidates at `cluster`
    granularity) - returns [R, OUT_LANES] f32."""
    R = rays_o.shape[0]
    N = gpack.shape[1]
    assert N % cluster == 0 and R % tile == 0
    K = max_hits
    n_tiles = R // tile
    span = max(span, cluster)
    assert span % cluster == 0
    DS = span // cluster
    check_every = max(check_every, DS)
    check_every = (check_every // DS) * DS

    tpack = pack_frames_lanes(jnp.pad(gpack, ((0, 0), (0, cluster))))
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
    # pack (bf16-truncated near | cluster id) into one SMEM int32 each:
    # truncation toward zero keeps the stored near <= the true near, so the
    # in-kernel `behind` early-exit (int32 compare of positive floats) is
    # conservative
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
        jnp.log(jnp.asarray(transmittance_threshold, jnp.float32)),
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
            pltpu.VMEM((span, tile), jnp.float32),
            pltpu.VMEM((span, tile), jnp.float32),
            pltpu.VMEM((span, TABLE_A), jnp.float32),
            pltpu.VMEM((SB * K, tile), jnp.float32),
            pltpu.VMEM((8, tile), jnp.float32),
        ],
    )
    out_t = pl.pallas_call(
        partial(_render_kernel_v5, K=K, cluster=cluster, span=span,
                exp_power=float(exp_power), check_every=check_every,
                debug_mode=debug_mode, window_mode=window_mode,
                secondary_static=secondary_static),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((OUT_LANES, R), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024),
        interpret=interpret,
    )(candidates, scalars, rays_t, tpack)
    return out_t.T
