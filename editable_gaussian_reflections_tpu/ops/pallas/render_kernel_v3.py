"""Render kernel v3: in-kernel candidate loop + striped single-write drain.

Round-2 profiling (RESULTS.md) put the fused kernel at ~18% of its own
pair-math roofline: grid-step machinery (~0.75 us per (tile, cluster) step:
predicate scalar sync + BlockSpec DMA bookkeeping) plus a top-K drain that
paid ~13 separate [R, K] read-modify-writes per inserted hit.  v3
restructures both:

  * the grid is 1-D over ray tiles; the candidate-cluster loop moves INSIDE
    the kernel as a `lax.while_loop` over GROUPS of CHECK_EVERY chunks with
    NBUF-deep manually pipelined HBM->VMEM DMAs (pltpu.make_async_copy) for
    the gpack blocks.  The early-exit predicate (tile saturated / all
    candidates behind the K-th hit / dead rays - monotone because candidate
    lists are depth-sorted) is evaluated once per GROUP: the vector->scalar
    sync it needs costs ~1 us, which at one check per chunk was as expensive
    as the chunk's entire pair math (measured in round 3 - the drain itself
    is FREE next to it);
  * slot state lives in ONE striped VMEM buffer [R, 16*K] (stripe j =
    lanes j*K..(j+1)*K).  The 16 stripes mirror gpack rows 16..31 (normal,
    rgb, f0, roughness + spare rows), with t/alpha placed in the spare
    stripes 13/14, so per-hit extraction is one one-hot dot against the
    TRANSPOSED gpack block itself (no separate attr table, no second DMA).
    An insertion builds the [R, 16] value row, spreads it across stripes
    with a second tiny MXU dot, and commits with a SINGLE masked write
    `where(stripe_lane == winning_slot, spread, buf)` - the 13 per-stripe
    RMWs collapse into one full-width VPU op;
  * ray tiles are a static knob (64/128/256): smaller tiles tighten the
    per-tile bounding cones (fewer candidate clusters, especially for the
    incoherent GGX secondary bounces) and cut the cross-ray while-loop
    synchronization of the drain.

Intersection math, validity rules, and composite semantics are bit-identical
to render_kernel.py (shaders.cu:9-75 / forward_pass.cu:49-155 parity paths);
equality is asserted in tests/test_render_kernel.py.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .render_kernel import (
    OUT_LANES,
    TABLE_A,
    _pair_math,
)
from .trace_kernel import (
    INF,
    N_ROWS,
    ROW_F0,
    ROW_NRM,
    ROW_RGB,
    ROW_ROUGH,
)

# striped slot buffer: stripe j mirrors gpack row 16+j of the hit Gaussian
# (17-19 = normal, 22-24 = rgb, 25-27 = f0, 28 = roughness); the spare
# zero rows 29/30 become the per-hit t / alpha stripes
SB = 16
GROW0 = 16                 # first gpack row carried into the stripes
STRIPE_T = 29 - GROW0      # 13
STRIPE_ALPHA = 30 - GROW0  # 14
STRIPE_NRM = ROW_NRM - GROW0      # 1..3
STRIPE_RGB = ROW_RGB - GROW0      # 6..8
STRIPE_F0 = ROW_F0 - GROW0        # 9..11
STRIPE_ROUGH = ROW_ROUGH - GROW0  # 12


def _spread_matrix(K: int) -> jnp.ndarray:
    """[TABLE_A, SB*K]: column j of the value row -> stripe j.  Built from
    iotas (a captured numpy constant is not allowed in a kernel body)."""
    row = jax.lax.broadcasted_iota(jnp.int32, (TABLE_A, SB * K), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (TABLE_A, SB * K), 1)
    return (col // K == row).astype(jnp.float32)


def _drain_striped(valid, t, alpha, gblock_hi, slot_ref, K, spread_const,
                   max_iters: int = 0):
    """Replace-max top-K drain over the striped slot buffer.

    Per while iteration (one inserted hit): select the per-ray nearest
    remaining candidate lane, extract its value row with a one-hot MXU dot
    against the transposed gpack upper half (gblock_hi [16, C]), spread it
    across stripes with a second tiny dot, and commit with ONE masked write
    at the per-ray winning slot.  Loop carry is (tmin, kth, tmask) only -
    slot state rides the ref (carried [R, K] tuples get copied/spilled per
    iteration; measured 91x slowdown in round 2)."""
    R, C = t.shape
    lane_ids = jax.lax.broadcasted_iota(jnp.int32, (R, C), 1).astype(jnp.float32)
    slot_idx = jax.lax.broadcasted_iota(jnp.int32, (R, K), 1).astype(jnp.float32)
    stripe_lane = (
        jax.lax.broadcasted_iota(jnp.int32, (R, SB * K), 1) % K
    ).astype(jnp.float32)
    col16 = jax.lax.broadcasted_iota(jnp.int32, (R, TABLE_A), 1)

    kth0 = jnp.max(slot_ref[:, STRIPE_T * K:(STRIPE_T + 1) * K], axis=1,
                   keepdims=True)
    tmask = jnp.where(valid & (t < kth0), t, INF)
    tmin0 = jnp.min(tmask, axis=1, keepdims=True)

    def cond(st):
        return jnp.any(st[0] < st[1])

    def body(st):
        tmin, kth, tmask = st
        ins = tmin < kth                                        # [R, 1]
        is_min = (tmask <= tmin) & ins                          # [R, C]
        id_sel = jnp.min(jnp.where(is_min, lane_ids, INF), axis=1,
                         keepdims=True)
        lane_oh = is_min & (lane_ids <= id_sel)                 # single lane
        a_val = jnp.sum(jnp.where(lane_oh, alpha, 0.0), axis=1,
                        keepdims=True)
        v = jax.lax.dot_general(
            lane_oh.astype(jnp.float32), gblock_hi,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )                                                        # [R, 16]
        v = jnp.where(col16 == STRIPE_T, tmin, v)
        v = jnp.where(col16 == STRIPE_ALPHA, a_val, v)
        spread = jax.lax.dot_general(
            v, spread_const,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )                                                        # [R, SB*K]

        slot_t = slot_ref[:, STRIPE_T * K:(STRIPE_T + 1) * K]
        s_is_max = slot_t >= kth
        s_win = jnp.min(jnp.where(s_is_max, slot_idx, jnp.float32(1e9)),
                        axis=1, keepdims=True)
        commit = (stripe_lane == s_win) & ins                   # [R, SB*K]
        slot_ref[:] = jnp.where(commit, spread, slot_ref[:])

        new_t = slot_ref[:, STRIPE_T * K:(STRIPE_T + 1) * K]
        tmask = jnp.where(lane_oh, INF, tmask)
        tmin = jnp.min(tmask, axis=1, keepdims=True)
        kth = jnp.max(new_t, axis=1, keepdims=True)
        return (tmin, kth, tmask)

    if max_iters:  # debug: fixed iteration count to measure per-iter cost
        st = (tmin0, kth0, tmask)
        for _ in range(max_iters):
            st = body(st)
    else:
        jax.lax.while_loop(cond, body, (tmin0, kth0, tmask))


def _composite_epilogue_striped(scalar_ref, slot_ref, acc_ref, out_ref, K):
    """Order-free composite over the striped slots + truncated-tail term.

    Identical algebra to render_kernel._composite_epilogue; reads the
    stripes instead of separate refs."""
    thr = scalar_ref[6]
    eps_norm = scalar_ref[7]
    slot_t = slot_ref[:, STRIPE_T * K:(STRIPE_T + 1) * K]
    slot_alpha = slot_ref[:, STRIPE_ALPHA * K:(STRIPE_ALPHA + 1) * K]
    R = slot_t.shape[0]
    slot_idx = jax.lax.broadcasted_iota(jnp.int32, (R, K), 1).astype(jnp.float32)

    valid = slot_t < INF
    la = jnp.where(valid, jnp.log1p(-slot_alpha), 0.0)

    S = jnp.zeros((R, K), jnp.float32)
    for shift in range(1, K):
        ot = pltpu.roll(slot_t, shift=shift, axis=1)
        oi = pltpu.roll(slot_idx, shift=shift, axis=1)
        ola = pltpu.roll(la, shift=shift, axis=1)
        infront = (ot < slot_t) | ((ot == slot_t) & (oi < slot_idx))
        S = S + jnp.where(infront, ola, 0.0)
    T_before = jnp.exp(S)

    cmask = valid & (T_before >= thr)
    w = jnp.where(cmask, T_before * slot_alpha, 0.0)

    T_final = jnp.exp(jnp.sum(jnp.where(cmask, la, 0.0), axis=1,
                              keepdims=True))
    depth = jnp.sum(w * jnp.where(cmask, slot_t, 0.0), axis=1, keepdims=True)
    num_acc = jnp.sum(cmask.astype(jnp.float32), axis=1, keepdims=True)

    full_T = jnp.exp(acc_ref[:, 0:1])
    remaining_T = T_final - full_T
    norm = jnp.maximum(1.0 - T_final, eps_norm)
    factor = 1.0 + remaining_T / norm

    attr_stripes = (
        [STRIPE_RGB + i for i in range(3)]
        + [STRIPE_NRM + i for i in range(3)]
        + [STRIPE_F0 + i for i in range(3)]
        + [STRIPE_ROUGH]
    )
    cols = [
        jnp.sum(w * slot_ref[:, a * K:(a + 1) * K], axis=1, keepdims=True)
        * factor
        for a in attr_stripes
    ]
    cols += [depth * factor, T_final, full_T, num_acc, acc_ref[:, 1:2],
             acc_ref[:, 2:3]]
    out_ref[:] = jnp.concatenate(cols, axis=1)


def _render_kernel_v3(
    cand_ref, cand_near_ref, scalar_ref, rays_ref,
    gpack_hbm,
    out_ref,
    gbuf, slot_ref, acc_ref, gsem,
    *, K: int, cluster: int, exp_power: float, debug_mode: int = 0,
    nbuf: int = 4, check_every: int = 4, window_mode: int = 0,
    secondary_static: int = -1,
):
    ti = pl.program_id(0)
    log_thr = scalar_ref[9]
    R = rays_ref.shape[0]
    spread_const = _spread_matrix(K)
    PF = nbuf - 1          # DMA prefetch depth
    CE = check_every

    slot_ref[:] = jnp.full_like(slot_ref, 0.0)
    slot_ref[:, STRIPE_T * K:(STRIPE_T + 1) * K] = jnp.full(
        (R, K), INF, jnp.float32)
    acc_ref[:] = jnp.zeros_like(acc_ref)

    def get_dma(slot, ci):
        c = cand_ref[ti, ci]
        return pltpu.make_async_copy(
            gpack_hbm.at[:, pl.ds(c * cluster, cluster)],
            gbuf.at[slot], gsem.at[slot],
        )

    # Candidate lists are host-padded to a multiple of CE with a dummy
    # all-invalid cluster (gpack padded by one zero cluster): the group body
    # is STRAIGHT-LINE unconditional vector code.  Per-chunk @pl.when
    # regions measured 3.1 us/chunk of pipeline sync - 70% of the kernel.
    mc = cand_ref.shape[1]
    n_groups = mc // CE
    PF = min(PF, mc)

    if debug_mode != 4:
        for j in range(PF):
            get_dma(j % nbuf, j).start()

    dead_all = jnp.all(rays_ref[:, 6:7] <= 0.0)

    def compute_chunk(ci):
        if debug_mode != 4:  # 4 = no DMA at all (timing diagnosis only)
            get_dma(jax.lax.rem(ci, nbuf), ci).wait()
            # prefetch (index clamped into the padded tail - re-fetching a
            # dummy cluster is harmless and keeps the issue/wait ledger
            # exactly one per chunk, no predicate needed)
            get_dma(jax.lax.rem(ci + PF, nbuf),
                    jnp.minimum(ci + PF, mc - 1)).start()

        if debug_mode == 5:  # 5 = DMA only, no compute
            return
        tt, alpha, valid, gvalid = _pair_math(
            scalar_ref, rays_ref,
            gbuf.at[0 if debug_mode == 4 else jax.lax.rem(ci, nbuf)],
            exp_power=exp_power, window_mode=window_mode,
            secondary_static=secondary_static)
        acc_ref[:, 0:1] += jnp.sum(
            jnp.where(valid, jnp.log1p(-alpha), 0.0), axis=1,
            keepdims=True)
        acc_ref[:, 1:2] += jnp.broadcast_to(
            jnp.sum(gvalid, axis=1, keepdims=True), (R, 1))
        acc_ref[:, 2:3] += jnp.broadcast_to(
            jnp.max(gvalid, axis=1, keepdims=True), (R, 1))
        if debug_mode != 1:  # 1 = pair math only (perf diagnosis)
            _drain_striped(valid, tt, alpha,
                           gbuf[jax.lax.rem(ci, nbuf), GROW0:, :],
                           slot_ref, K, spread_const,
                           max_iters=(1 if debug_mode == 2 else 0))

    def cond(st):
        g, done = st
        return (g < n_groups) & ~done

    def body(st):
        g, _ = st
        base = g * CE
        # ONE scalar sync per group: monotone exit predicate at the group
        # boundary (candidates are depth-sorted; dummy padding has
        # cand_near = +inf, so the first dummy group reads as `behind`)
        saturated = acc_ref[:, 0:1] <= log_thr
        kth = jnp.max(slot_ref[:, STRIPE_T * K:(STRIPE_T + 1) * K], axis=1,
                      keepdims=True)
        behind = kth < cand_near_ref[ti, base]
        done = jnp.all(saturated | behind) | dead_all

        @pl.when(~done)
        def _group():
            for j in range(CE):
                compute_chunk(base + j)

        return (g + 1, done)

    g_end, done_end = jax.lax.while_loop(
        cond, body, (jnp.int32(0), dead_all))

    # drain outstanding prefetches: exactly PF DMAs are in flight after any
    # exit (each processed chunk waits one and issues one)
    processed = jnp.where(done_end, (g_end - 1) * CE, g_end * CE)
    processed = jnp.clip(processed, 0, mc)
    if debug_mode != 4:
        for j in range(PF):
            get_dma(jax.lax.rem(processed + j, nbuf),
                    jnp.minimum(processed + j, mc - 1)).wait()

    _composite_epilogue_striped(scalar_ref, slot_ref, acc_ref, out_ref, K)


@partial(
    jax.jit,
    static_argnames=("exp_power", "max_hits", "cluster", "tile", "interpret",
                     "debug_mode", "nbuf", "check_every", "window_mode",
                     "secondary_static"),
)
def pallas_render_culled_v3(
    rays_o, rays_d, gpack, candidates, cand_near, num, near, far,
    exp_power, secondary, backfacing_max_dist,
    backfacing_invalid_normal_threshold,
    transmittance_threshold=0.01, eps_forward_normalization=1e-12,
    max_hits: int = 16, cluster: int = 128, tile: int = 128,
    interpret: bool = False, alive=None, debug_mode: int = 0,
    nbuf: int = 4, check_every: int = 4,
    t_split=None, window_mode: int = 0, secondary_static: int = -1,
):
    """v3 culled trace + composite.  Returns [R, OUT_LANES] f32.

    `gpack` must come from pack_frames(frames, attrs) (attrs in rows 16..31
    - the kernel extracts them straight from the streamed block, no
    separate attr table).  `num` is select_candidates' per-tile candidate
    count [T] int32 (unused - kept for call-site compatibility).
    SMEM: candidates + cand_near are scalar-prefetched
    (R/tile * (MC+eps) * 8 bytes must stay < ~0.5 MB)."""
    R = rays_o.shape[0]
    N = gpack.shape[1]
    assert N % cluster == 0 and R % tile == 0
    K = max_hits
    n_tiles = R // tile
    # dummy all-invalid cluster at index N//cluster: -1 candidate entries
    # point at it, and lists are padded to a multiple of check_every so the
    # kernel's group loop needs no per-chunk bounds predicates
    gpack = jnp.pad(gpack, ((0, 0), (0, cluster)))
    dummy = jnp.int32(N // cluster)
    mc0 = candidates.shape[1]
    mc = ((mc0 + check_every - 1) // check_every) * check_every
    if mc != mc0:
        candidates = jnp.pad(candidates, ((0, 0), (0, mc - mc0)),
                             constant_values=-1)
        cand_near = jnp.pad(cand_near, ((0, 0), (0, mc - mc0)),
                            constant_values=3.0e38)
    candidates = jnp.where(candidates < 0, dummy, candidates)
    alive_col = (jnp.ones((R, 1), jnp.float32) if alive is None
                 else alive.reshape(R, 1).astype(jnp.float32))
    split_col = (jnp.zeros((R, 1), jnp.float32) if t_split is None
                 else t_split.reshape(R, 1).astype(jnp.float32))
    rays = jnp.concatenate(
        [rays_o, rays_d, alive_col, split_col], axis=1
    ).astype(jnp.float32)
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
        num_scalar_prefetch=2,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((tile, 8), lambda ti, cand, cnear: (ti, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((tile, OUT_LANES),
                               lambda ti, cand, cnear: (ti, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((nbuf, N_ROWS, cluster), jnp.float32),
            pltpu.VMEM((tile, SB * K), jnp.float32),
            pltpu.VMEM((tile, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((nbuf,)),
        ],
    )
    return pl.pallas_call(
        partial(_render_kernel_v3, K=K, cluster=cluster,
                exp_power=float(exp_power), debug_mode=debug_mode,
                nbuf=nbuf, check_every=check_every,
                window_mode=window_mode, secondary_static=secondary_static),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((R, OUT_LANES), jnp.float32),
        interpret=interpret,
    )(candidates, cand_near, scalars, rays, gpack)


# ---------------------------------------------------------------------------
# v4: VMEM-RESIDENT scene.  The whole gpack ([N_ROWS, N] f32) fits on-chip
# for reference-scale scenes (100k Gaussians = 12.8 MB; v5e has 128 MB
# physical VMEM), so the per-chunk HBM fetches - measured at a fixed ~2 us
# apiece regardless of mechanism (BlockSpec pipelining or manual DMA), the
# dominant cost of v2/v3 - disappear: the candidate loop slices the resident
# block at dynamic 128-aligned lane offsets.  Falls back to the v3 streaming
# kernel when the scene exceeds the VMEM budget (renderer picks per call).
# ---------------------------------------------------------------------------


def _render_kernel_v4(
    cand_ref, cand_near_ref, scalar_ref, rays_ref, gpack_ref,
    out_ref,
    slot_ref, acc_ref,
    *, K: int, cluster: int, exp_power: float, check_every: int,
    debug_mode: int = 0, window_mode: int = 0, secondary_static: int = -1,
):
    ti = pl.program_id(0)
    log_thr = scalar_ref[9]
    R = rays_ref.shape[0]
    spread_const = _spread_matrix(K)
    CE = check_every
    mc = cand_ref.shape[1]
    n_groups = mc // CE

    slot_ref[:] = jnp.full_like(slot_ref, 0.0)
    slot_ref[:, STRIPE_T * K:(STRIPE_T + 1) * K] = jnp.full(
        (R, K), INF, jnp.float32)
    acc_ref[:] = jnp.zeros_like(acc_ref)

    dead_all = jnp.all(rays_ref[:, 6:7] <= 0.0)

    def compute_chunk(ci):
        c = cand_ref[ti, ci]
        gblock = gpack_ref.at[:, pl.ds(c * cluster, cluster)]
        tt, alpha, valid, gvalid = _pair_math(
            scalar_ref, rays_ref, gblock, exp_power=exp_power,
            window_mode=window_mode, secondary_static=secondary_static)
        acc_ref[:, 0:1] += jnp.sum(
            jnp.where(valid, jnp.log1p(-alpha), 0.0), axis=1,
            keepdims=True)
        acc_ref[:, 1:2] += jnp.broadcast_to(
            jnp.sum(gvalid, axis=1, keepdims=True), (R, 1))
        acc_ref[:, 2:3] += jnp.broadcast_to(
            jnp.max(gvalid, axis=1, keepdims=True), (R, 1))
        if debug_mode != 1:  # 1 = pair math only (perf attribution)
            _drain_striped(valid, tt, alpha,
                           gpack_ref[GROW0:, pl.ds(c * cluster, cluster)],
                           slot_ref, K, spread_const,
                           max_iters=(1 if debug_mode == 2 else 0))

    def cond(st):
        g, done = st
        return (g < n_groups) & ~done

    def body(st):
        g, _ = st
        base = g * CE
        saturated = acc_ref[:, 0:1] <= log_thr
        kth = jnp.max(slot_ref[:, STRIPE_T * K:(STRIPE_T + 1) * K], axis=1,
                      keepdims=True)
        behind = kth < cand_near_ref[ti, base]
        done = jnp.all(saturated | behind) | dead_all

        @pl.when(~done)
        def _group():
            for j in range(CE):
                compute_chunk(base + j)

        return (g + 1, done)

    jax.lax.while_loop(cond, body, (jnp.int32(0), dead_all))

    _composite_epilogue_striped(scalar_ref, slot_ref, acc_ref, out_ref, K)


# conservative VMEM budget for the resident gpack (bytes); the kernel also
# needs slot/acc scratch and the Mosaic double-buffer of rays/out blocks
RESIDENT_GPACK_LIMIT = 96 * 1024 * 1024


def resident_fits(n_capacity: int) -> bool:
    return (n_capacity + 128) * N_ROWS * 4 <= RESIDENT_GPACK_LIMIT


@partial(
    jax.jit,
    static_argnames=("exp_power", "max_hits", "cluster", "tile", "interpret",
                     "check_every", "debug_mode", "window_mode",
                     "secondary_static"),
)
def pallas_render_culled_v4(
    rays_o, rays_d, gpack, candidates, cand_near, num, near, far,
    exp_power, secondary, backfacing_max_dist,
    backfacing_invalid_normal_threshold,
    transmittance_threshold=0.01, eps_forward_normalization=1e-12,
    max_hits: int = 16, cluster: int = 128, tile: int = 256,
    interpret: bool = False, alive=None, check_every: int = 8,
    debug_mode: int = 0, t_split=None, window_mode: int = 0,
    secondary_static: int = -1,
):
    """VMEM-resident culled trace + composite.  Same contract as v3.

    `t_split` [R] + `window_mode` (static 0/1/2) select the split-far
    two-pass t-window (see _pair_math): mode 1 keeps hits with
    t < t_split, mode 2 keeps t > t_split."""
    R = rays_o.shape[0]
    N = gpack.shape[1]
    assert N % cluster == 0 and R % tile == 0
    K = max_hits
    n_tiles = R // tile
    gpack = jnp.pad(gpack, ((0, 0), (0, cluster)))
    dummy = jnp.int32(N // cluster)
    mc0 = candidates.shape[1]
    mc = ((mc0 + check_every - 1) // check_every) * check_every
    if mc != mc0:
        candidates = jnp.pad(candidates, ((0, 0), (0, mc - mc0)),
                             constant_values=-1)
        cand_near = jnp.pad(cand_near, ((0, 0), (0, mc - mc0)),
                            constant_values=3.0e38)
    candidates = jnp.where(candidates < 0, dummy, candidates)
    alive_col = (jnp.ones((R, 1), jnp.float32) if alive is None
                 else alive.reshape(R, 1).astype(jnp.float32))
    split_col = (jnp.zeros((R, 1), jnp.float32) if t_split is None
                 else t_split.reshape(R, 1).astype(jnp.float32))
    rays = jnp.concatenate(
        [rays_o, rays_d, alive_col, split_col], axis=1
    ).astype(jnp.float32)
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
        num_scalar_prefetch=2,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((tile, 8), lambda ti, cand, cnear: (ti, 0),
                         memory_space=pltpu.VMEM),
            # whole-gpack VMEM block with a constant index map: Mosaic keeps
            # it resident across grid steps (no per-step refetch)
            pl.BlockSpec((N_ROWS, N + cluster),
                         lambda ti, cand, cnear: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile, OUT_LANES),
                               lambda ti, cand, cnear: (ti, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((tile, SB * K), jnp.float32),
            pltpu.VMEM((tile, 128), jnp.float32),
        ],
    )
    return pl.pallas_call(
        partial(_render_kernel_v4, K=K, cluster=cluster,
                exp_power=float(exp_power), check_every=check_every,
                debug_mode=debug_mode, window_mode=window_mode,
                secondary_static=secondary_static),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((R, OUT_LANES), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024),
        interpret=interpret,
    )(candidates, cand_near, scalars, rays, gpack)


# ---------------------------------------------------------------------------
# v4 slots (training) kernel: VMEM-resident gpack + transposed frame table.
# Same full-payload contract as render_kernel.pallas_trace_slots (depth-
# sorted [R, SLOT_BLOCKS*K] slots consumed by unpack_slots) but with ZERO
# per-chunk HBM fetches: gpack ([N_ROWS, N]) and fpack (pack_frame_table
# TRANSPOSED to [FTABLE_A, N]) ride as resident whole-array VMEM blocks.
# Payload state lives in two striped buffers (stripe j = lanes j*K..(j+1)*K):
#   buf1 mirrors gpack rows 16..31  (normal/rgb/f0/rough + t/alpha spares)
#   buf2 mirrors fpack rows 0..23   (mean/rot/inv/sf/opacity/scaling/quat)
#        + the global Gaussian id in stripe 24
# so an insertion is two one-hot MXU dots + two spreads + two masked writes.
# ---------------------------------------------------------------------------

from .render_kernel import (  # noqa: E402
    FTABLE_A,
    NUM_ATTR,
    NUM_FRAME,
    SLOT_BLOCKS,
)

SB2 = 32                   # buf2 stripes (24 frame cols + id + pads)
STRIPE2_ID = 24


def _spread_matrix2(K: int) -> jnp.ndarray:
    row = jax.lax.broadcasted_iota(jnp.int32, (SB2, SB2 * K), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (SB2, SB2 * K), 1)
    return (col // K == row).astype(jnp.float32)


def _drain_striped_slots(valid, t, alpha, base_id, gblock_hi, fblock,
                         slot1_ref, slot2_ref, K, sp1, sp2):
    """Full-payload replace-max drain over the two striped buffers."""
    R, C = t.shape
    lane_ids = jax.lax.broadcasted_iota(jnp.int32, (R, C), 1).astype(jnp.float32)
    slot_idx = jax.lax.broadcasted_iota(jnp.int32, (R, K), 1).astype(jnp.float32)
    stripe1 = (jax.lax.broadcasted_iota(jnp.int32, (R, SB * K), 1) % K
               ).astype(jnp.float32)
    stripe2 = (jax.lax.broadcasted_iota(jnp.int32, (R, SB2 * K), 1) % K
               ).astype(jnp.float32)
    col16 = jax.lax.broadcasted_iota(jnp.int32, (R, TABLE_A), 1)
    col32 = jax.lax.broadcasted_iota(jnp.int32, (R, SB2), 1)
    gid = lane_ids + jax.lax.convert_element_type(base_id, jnp.float32)

    tstripe = lambda: slot1_ref[:, STRIPE_T * K:(STRIPE_T + 1) * K]
    kth0 = jnp.max(tstripe(), axis=1, keepdims=True)
    tmask = jnp.where(valid & (t < kth0), t, INF)
    tmin0 = jnp.min(tmask, axis=1, keepdims=True)

    def cond(st):
        return jnp.any(st[0] < st[1])

    def body(st):
        tmin, kth, tmask = st
        ins = tmin < kth
        is_min = (tmask <= tmin) & ins
        id_sel = jnp.min(jnp.where(is_min, lane_ids, INF), axis=1,
                         keepdims=True)
        lane_oh = is_min & (lane_ids <= id_sel)
        ohf = lane_oh.astype(jnp.float32)
        a_val = jnp.sum(jnp.where(lane_oh, alpha, 0.0), axis=1,
                        keepdims=True)
        g_val = jnp.sum(jnp.where(lane_oh, gid, 0.0), axis=1, keepdims=True)
        dn = (((1,), (1,)), ((), ()))
        v1 = jax.lax.dot_general(ohf, gblock_hi, dn,
                                 preferred_element_type=jnp.float32,
                                 precision=jax.lax.Precision.HIGHEST)
        v1 = jnp.where(col16 == STRIPE_T, tmin, v1)
        v1 = jnp.where(col16 == STRIPE_ALPHA, a_val, v1)
        v2 = jax.lax.dot_general(ohf, fblock, dn,
                                 preferred_element_type=jnp.float32,
                                 precision=jax.lax.Precision.HIGHEST)
        v2 = jnp.pad(v2, ((0, 0), (0, SB2 - FTABLE_A)))
        v2 = jnp.where(col32 == STRIPE2_ID, g_val, v2)
        sprd1 = jax.lax.dot_general(
            v1, sp1, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)
        sprd2 = jax.lax.dot_general(
            v2, sp2, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)

        slot_t = tstripe()
        s_is_max = slot_t >= kth
        s_win = jnp.min(jnp.where(s_is_max, slot_idx, jnp.float32(1e9)),
                        axis=1, keepdims=True)
        slot1_ref[:] = jnp.where((stripe1 == s_win) & ins, sprd1,
                                 slot1_ref[:])
        slot2_ref[:] = jnp.where((stripe2 == s_win) & ins, sprd2,
                                 slot2_ref[:])

        tmask = jnp.where(lane_oh, INF, tmask)
        tmin = jnp.min(tmask, axis=1, keepdims=True)
        kth = jnp.max(tstripe(), axis=1, keepdims=True)
        return (tmin, kth, tmask)

    jax.lax.while_loop(cond, body, (tmin0, kth0, tmask))


def _slots_kernel_v4(
    cand_ref, cand_near_ref, scalar_ref, rays_ref, gpack_ref, fpack_ref,
    slots_out_ref, acc_out_ref,
    slot1_ref, slot2_ref, acc_ref,
    *, K: int, cluster: int, exp_power: float, check_every: int,
    window_mode: int = 0, secondary_static: int = -1,
):
    ti = pl.program_id(0)
    log_thr = scalar_ref[9]
    R = rays_ref.shape[0]
    sp1 = _spread_matrix(K)
    sp2 = _spread_matrix2(K)
    CE = check_every
    mc = cand_ref.shape[1]
    n_groups = mc // CE

    slot1_ref[:] = jnp.zeros_like(slot1_ref)
    slot1_ref[:, STRIPE_T * K:(STRIPE_T + 1) * K] = jnp.full(
        (R, K), INF, jnp.float32)
    slot2_ref[:] = jnp.zeros_like(slot2_ref)
    acc_ref[:] = jnp.zeros_like(acc_ref)

    dead_all = jnp.all(rays_ref[:, 6:7] <= 0.0)

    def compute_chunk(ci):
        c = cand_ref[ti, ci]
        off = pl.ds(c * cluster, cluster)
        tt, alpha, valid, gvalid = _pair_math(
            scalar_ref, rays_ref, gpack_ref.at[:, off],
            exp_power=exp_power, window_mode=window_mode,
            secondary_static=secondary_static)
        acc_ref[:, 0:1] += jnp.sum(
            jnp.where(valid, jnp.log1p(-alpha), 0.0), axis=1,
            keepdims=True)
        acc_ref[:, 1:2] += jnp.broadcast_to(
            jnp.sum(gvalid, axis=1, keepdims=True), (R, 1))
        acc_ref[:, 2:3] += jnp.broadcast_to(
            jnp.max(gvalid, axis=1, keepdims=True), (R, 1))
        _drain_striped_slots(
            valid, tt, alpha, c * cluster,
            gpack_ref[GROW0:, off], fpack_ref[:, off],
            slot1_ref, slot2_ref, K, sp1, sp2)

    def cond(st):
        g, done = st
        return (g < n_groups) & ~done

    def body(st):
        g, _ = st
        base = g * CE
        saturated = acc_ref[:, 0:1] <= log_thr
        kth = jnp.max(slot1_ref[:, STRIPE_T * K:(STRIPE_T + 1) * K], axis=1,
                      keepdims=True)
        behind = kth < cand_near_ref[ti, base]
        done = jnp.all(saturated | behind) | dead_all

        @pl.when(~done)
        def _group():
            for j in range(CE):
                compute_chunk(base + j)

        return (g + 1, done)

    jax.lax.while_loop(cond, body, (jnp.int32(0), dead_all))

    # depth-sort (rank-place, ties by slot index) every payload block into
    # the [R, SLOT_BLOCKS*K] output expected by unpack_slots: out block
    # order = [t, alpha, id, attrs(10), frames(24)].  Reuses the proven
    # render_kernel._rank_sort_to_ref machinery.
    from .render_kernel import _rank_sort_to_ref

    def b1(j):
        return slot1_ref[:, j * K:(j + 1) * K]

    def b2(j):
        return slot2_ref[:, j * K:(j + 1) * K]

    attr_stripes = ([STRIPE_RGB + i for i in range(3)]
                    + [STRIPE_NRM + i for i in range(3)]
                    + [STRIPE_F0 + i for i in range(3)]
                    + [STRIPE_ROUGH])
    blocks = ([b1(STRIPE_T), b1(STRIPE_ALPHA), b2(STRIPE2_ID)]
              + [b1(j) for j in attr_stripes]
              + [b2(j) for j in range(NUM_FRAME)])
    fills = [INF, 0.0, 0.0] + [0.0] * (NUM_ATTR + NUM_FRAME)
    _rank_sort_to_ref(b1(STRIPE_T), blocks, fills, slots_out_ref, K)
    R_ = rays_ref.shape[0]
    z = jnp.zeros((R_, 1), jnp.float32)
    acc_out_ref[:] = jnp.concatenate(
        [acc_ref[:, 0:1], acc_ref[:, 1:2], acc_ref[:, 2:3]] + [z] * 13,
        axis=1)


def slots_resident_fits(n_capacity: int) -> bool:
    """gpack + transposed frame table both resident: 2x the render budget."""
    return (n_capacity + 128) * (N_ROWS + FTABLE_A) * 4 <= RESIDENT_GPACK_LIMIT


@partial(
    jax.jit,
    static_argnames=("exp_power", "max_hits", "cluster", "tile", "interpret",
                     "check_every", "window_mode", "secondary_static"),
)
def pallas_trace_slots_v4(
    rays_o, rays_d, gpack, ftable, candidates, cand_near, near, far,
    exp_power, secondary, backfacing_max_dist,
    backfacing_invalid_normal_threshold, transmittance_threshold=0.01,
    max_hits: int = 32, cluster: int = 128, tile: int = 256,
    interpret: bool = False, alive=None, check_every: int = 8,
    t_split=None, window_mode: int = 0, secondary_static: int = -1,
):
    """VMEM-resident full-payload slots trace.  Same returns as
    render_kernel.pallas_trace_slots: (slots [R, SLOT_BLOCKS*K], acc
    [R, 16]), unpacked by unpack_slots.  `ftable` is pack_frame_table's
    [N, FTABLE_A] output (transposed internally for lane slicing).

    `t_split` [R] + static `window_mode` 0/1/2 select the split-far
    t-window (see _pair_math); because all far hits lie behind all near
    hits, a near-pass and a far-pass slots buffer CONCATENATE into one
    depth-sorted list (merge_slots)."""
    R = rays_o.shape[0]
    N = gpack.shape[1]
    assert N % cluster == 0 and R % tile == 0
    K = max_hits
    n_tiles = R // tile
    gpack = jnp.pad(gpack, ((0, 0), (0, cluster)))
    fpack = jnp.pad(ftable.T, ((0, 0), (0, cluster)))
    dummy = jnp.int32(N // cluster)
    mc0 = candidates.shape[1]
    mc = ((mc0 + check_every - 1) // check_every) * check_every
    if mc != mc0:
        candidates = jnp.pad(candidates, ((0, 0), (0, mc - mc0)),
                             constant_values=-1)
        cand_near = jnp.pad(cand_near, ((0, 0), (0, mc - mc0)),
                            constant_values=3.0e38)
    candidates = jnp.where(candidates < 0, dummy, candidates)
    alive_col = (jnp.ones((R, 1), jnp.float32) if alive is None
                 else alive.reshape(R, 1).astype(jnp.float32))
    split_col = (jnp.zeros((R, 1), jnp.float32) if t_split is None
                 else t_split.reshape(R, 1).astype(jnp.float32))
    rays = jnp.concatenate(
        [rays_o, rays_d, alive_col, split_col], axis=1
    ).astype(jnp.float32)
    scalars = jnp.stack([
        jnp.asarray(near, jnp.float32),
        jnp.asarray(far, jnp.float32),
        jnp.zeros((), jnp.float32),
        jnp.asarray(secondary, jnp.float32),
        jnp.asarray(backfacing_max_dist, jnp.float32),
        jnp.asarray(backfacing_invalid_normal_threshold, jnp.float32),
        jnp.asarray(transmittance_threshold, jnp.float32),
        jnp.zeros((), jnp.float32),
        jnp.zeros((), jnp.float32),
        jnp.log(jnp.asarray(transmittance_threshold, jnp.float32)),
    ])

    NPK = SLOT_BLOCKS * K
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((tile, 8), lambda ti, cand, cnear: (ti, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((N_ROWS, N + cluster),
                         lambda ti, cand, cnear: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((FTABLE_A, N + cluster),
                         lambda ti, cand, cnear: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((tile, NPK), lambda ti, cand, cnear: (ti, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 16), lambda ti, cand, cnear: (ti, 0),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((tile, SB * K), jnp.float32),
            pltpu.VMEM((tile, SB2 * K), jnp.float32),
            pltpu.VMEM((tile, 128), jnp.float32),
        ],
    )
    return pl.pallas_call(
        partial(_slots_kernel_v4, K=K, cluster=cluster,
                exp_power=float(exp_power), check_every=check_every,
                window_mode=window_mode, secondary_static=secondary_static),
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((R, NPK), jnp.float32),
            jax.ShapeDtypeStruct((R, 16), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024),
        interpret=interpret,
    )(candidates, cand_near, scalars, rays, gpack, fpack)
