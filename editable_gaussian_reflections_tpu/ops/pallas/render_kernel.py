"""Fully-fused render kernel: trace + top-K + composite in ONE Pallas call.

This is the round-2 answer to the frame profile: at 65k rays/bounce the
round-1 pipeline spent ~30 ms on pair math (VPU roofline), ~40 ms in the
top-K drain, and ~97 ms in XLA attribute gathers + compositing.  This kernel
removes the XLA stages entirely and restructures the drain:

  * per-hit attributes are extracted with a one-hot x [C, A] attribute-table
    matmul on the MXU (one tiny dot per drain iteration) instead of carrying
    A broadcast [R, C] aux planes through the drain - the per-iteration cost
    no longer scales with the attribute count;
  * compositing no longer needs sorted slots: the per-hit front-transmittance
    T_before_i = exp(sum_{t_j < t_i} log1p(-alpha_j)) is computed with K-1
    rolled pairwise comparisons over the slot axis (ties broken by slot
    index), which reproduces the reference's front-to-back prefix rule
    (forward_pass.cu:49-137) without any argsort;
  * the truncated-tail correction (forward_pass.cu:142-155) runs in-kernel
    from the exact log-transmittance accumulated over ALL hits.

Intersection math and validity rules are identical to trace_kernel.py
(shaders.cu:9-75 semantics; sqrt-free identities).  Output is one [R, 16]
block per ray: rgb, normal, f0, roughness, depth, T_final, full_T, num_acc,
traversed - everything renderer.composite used to produce.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..gaussian_kernel import MAX_ALPHA
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

# attribute-table columns (the [N, TABLE_A] side input; MXU-extracted per hit)
COL_RGB = 0       # 3
COL_NRM = 3       # 3
COL_F0 = 6        # 3
COL_ROUGH = 9
TABLE_A = 16      # padded

# output lanes of the [R, OUT_LANES] composite block
OUT_RGB = 0       # 3
OUT_NRM = 3       # 3
OUT_F0 = 6        # 3
OUT_ROUGH = 9
OUT_DEPTH = 10
OUT_TFINAL = 11
OUT_FULLT = 12    # exact total transmittance over ALL hits
OUT_NUMACC = 13
OUT_TRAV = 14
OUT_CHUNKS = 15   # clusters actually computed (not skipped) for this tile
OUT_LANES = 16

NUM_ATTR = 10     # rgb3 + nrm3 + f03 + rough carried per slot


def pack_attr_table(attrs) -> jnp.ndarray:
    """Activated SceneAttributes -> [N, TABLE_A] f32 table (MXU side input)."""
    n = attrs.rgb.shape[0]
    cols = jnp.zeros((n, TABLE_A), jnp.float32)
    cols = cols.at[:, COL_RGB:COL_RGB + 3].set(attrs.rgb)
    cols = cols.at[:, COL_NRM:COL_NRM + 3].set(attrs.normal)
    cols = cols.at[:, COL_F0:COL_F0 + 3].set(attrs.f0)
    cols = cols.at[:, COL_ROUGH].set(attrs.roughness)
    return cols


def _pair_math(scalar_ref, rays_ref, gpack_ref, *, exp_power: float,
               window_mode: int = 0, secondary_static: int = -1):
    """Closed-form max-response intersection over the [R, C] pair block.

    Returns (t, alpha, valid) - the minimal quantities the composite path
    needs (no gaussval/local_hit; those are backward-only residuals).

    `window_mode` (static) enables the split-far two-pass t-window: rays
    column 7 carries a per-ray split distance t_split, and hits are kept
    only when t < t_split (mode 1, near pass) or t > t_split (mode 2, far
    pass).  Mode 0 compiles the original single-window validity untouched.

    `secondary_static` (static) compiles the backfacing-reject test in or
    out: the bounce index is a Python constant at every call site, so
    primary passes (0) drop the normal-dot/reject ops (~15% of the pair
    math) instead of evaluating them under the traced `secondary` scalar;
    1 applies the reject unconditionally; -1 keeps the dynamic gate
    (identical results in all three modes - shaders.cu:52-57 only runs the
    test for secondary rays).

    Measured dead end (round 3, do not retry): bfloat16 for the transforms /
    dot products (hoping for 2x VPU lane packing).  sq = dot_oo -
    dot_ol^2/dot_ll cancels O(|lo|^2) ~ 1e4 intermediates (camera distance /
    Gaussian scale, squared) down to the O(1) miss distance, so bf16's 2^-8
    input rounding lands as O(10) absolute error on the exponent: 27.7 dB
    vs the f32 render even primary-only.  No reformulation avoids it -
    resolving a small miss distance from far away inherently needs f32."""
    near = scalar_ref[0]
    far = scalar_ref[1]
    secondary = scalar_ref[3]
    bf_max_dist = scalar_ref[4]
    bf_thr = scalar_ref[5]

    o = [rays_ref[:, i:i + 1] for i in range(3)]
    d = [rays_ref[:, 3 + i:4 + i] for i in range(3)]
    g = gpack_ref
    mean = [g[ROW_MEAN + i, :][None, :] for i in range(3)]
    rot = [g[ROW_ROT + i, :][None, :] for i in range(9)]
    inv = [g[ROW_INV + i, :][None, :] for i in range(3)]
    opacity = g[ROW_OPACITY, :][None, :]
    sf2 = g[ROW_SF2, :][None, :]
    gvalid = g[ROW_VALID, :][None, :]

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
        valid &= t < rays_ref[:, 7:8]
    elif window_mode == 2:
        valid &= t > rays_ref[:, 7:8]
    if secondary_static != 0:
        nrm = [g[ROW_NRM + i, :][None, :] for i in range(3)]
        nlen = g[ROW_NLEN, :][None, :]
        ndotd = nrm[0] * ld[0] + nrm[1] * ld[1] + nrm[2] * ld[2]
        reject = (t < bf_max_dist) & (nlen > bf_thr) & (ndotd > 0.0)
        if secondary_static == 1:
            valid &= ~reject
        else:
            valid &= jnp.logical_or(secondary <= 0.0, ~reject)
    # wavefront liveness: dead rays (rays[:, 6] == 0) produce no hits - the
    # in-kernel substitute for renderer._mask_hits
    valid &= rays_ref[:, 6:7] > 0.0

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


def _drain_composite(valid, t, alpha, table, slot_t_ref, slot_alpha_ref,
                     attr_ref, K):
    """Replace-max top-K drain with MXU attribute extraction.

    Per iteration: extract the per-ray nearest remaining hit (one lane
    one-hot), fetch its attribute row as one [R, C] x [C, A] matmul, and
    overwrite the ray's current worst slot.  Pre-gated by the entry kth so
    saturated rays cost nothing; per-ray `ins` keeps gating as kth shrinks.

    Slot state is mutated through REFS; only (tmin, kth, tmask) ride the
    while carry - carried [R, K] block tuples make Mosaic copy/spill them
    every iteration (measured 91x slowdown on the 37-block slots drain).
    (An int32-packed (t, lane) key variant was measured 1.35x SLOWER on
    v5e - integer min/max does not hit the fast VPU path - keys stay
    float.)"""
    R, C = t.shape
    lane_ids = jax.lax.broadcasted_iota(jnp.int32, (R, C), 1).astype(jnp.float32)
    slot_idx = jax.lax.broadcasted_iota(jnp.int32, (R, K), 1).astype(jnp.float32)

    kth0 = jnp.max(slot_t_ref[:], axis=1, keepdims=True)
    tmask = jnp.where(valid & (t < kth0), t, INF)
    tmin0 = jnp.min(tmask, axis=1, keepdims=True)

    def cond(st):
        tmin, kth = st[0], st[1]
        return jnp.any(tmin < kth)

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
            lane_oh.astype(jnp.float32), table,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )                                                        # [R, TABLE_A]

        slot_t = slot_t_ref[:]
        s_is_max = slot_t >= kth
        s_win = jnp.min(jnp.where(s_is_max, slot_idx, jnp.float32(1e9)),
                        axis=1, keepdims=True)
        slot_oh = s_is_max & (slot_idx <= s_win) & ins
        new_t = jnp.where(slot_oh, jnp.broadcast_to(tmin, (R, K)), slot_t)
        slot_t_ref[:] = new_t
        slot_alpha_ref[:] = jnp.where(
            slot_oh, jnp.broadcast_to(a_val, (R, K)), slot_alpha_ref[:])
        for a in range(NUM_ATTR):
            attr_ref[:, a * K:(a + 1) * K] = jnp.where(
                slot_oh, jnp.broadcast_to(v[:, a:a + 1], (R, K)),
                attr_ref[:, a * K:(a + 1) * K])
        tmask = jnp.where(lane_oh, INF, tmask)
        tmin = jnp.min(tmask, axis=1, keepdims=True)
        kth = jnp.max(new_t, axis=1, keepdims=True)
        return (tmin, kth, tmask)

    jax.lax.while_loop(cond, body, (tmin0, kth0, tmask))


def _composite_epilogue(scalar_ref, slot_t, slot_alpha, slot_attr, acc_ref,
                        out_ref):
    """Order-free front-to-back composite over the K slots + tail correction.

    T_before_i is the product of (1 - alpha_j) over slot hits strictly nearer
    than hit i (ties by slot index) - identical to compositing the slots in
    sorted order (ops/composite.py), because the composite mask
    T_before >= threshold is prefix-closed in depth."""
    thr = scalar_ref[6]
    eps_norm = scalar_ref[7]
    R, K = slot_t.shape
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
    w = jnp.where(cmask, T_before * slot_alpha, 0.0)            # [R, K]

    def wsum(vals):
        return jnp.sum(w * vals, axis=1, keepdims=True)         # [R, 1]

    T_final = jnp.exp(jnp.sum(jnp.where(cmask, la, 0.0), axis=1,
                              keepdims=True))
    depth = jnp.sum(w * jnp.where(cmask, slot_t, 0.0), axis=1, keepdims=True)
    num_acc = jnp.sum(cmask.astype(jnp.float32), axis=1, keepdims=True)

    full_T = jnp.exp(acc_ref[:, 0:1])
    remaining_T = T_final - full_T
    norm = jnp.maximum(1.0 - T_final, eps_norm)
    factor = 1.0 + remaining_T / norm

    cols = [wsum(slot_attr[a]) * factor for a in range(NUM_ATTR)]
    cols += [depth * factor, T_final, full_T, num_acc, acc_ref[:, 1:2],
             acc_ref[:, 2:3]]
    out_ref[:] = jnp.concatenate(cols, axis=1)


def _render_kernel(
    cand_ref, cand_near_ref, scalar_ref, rays_ref, gpack0_ref, table0_ref,
    gpack1_ref, table1_ref,
    out_ref,
    slot_t_ref, slot_alpha_ref, attr_ref, acc_ref,
    *, K: int, cluster: int, exp_power: float, secondary_static: int = -1,
):
    """Grid = (ray_tiles, ceil(MC / 2)): each step streams TWO candidate
    clusters (two gpack/table block pairs) - grid-step machinery (~0.75 us:
    predicate scalar sync + DMA bookkeeping) was measured to dominate over
    the actual pair math, so steps are amortized over two chunks."""
    ti = pl.program_id(0)
    ci = pl.program_id(1)
    log_thr = scalar_ref[9]
    R = rays_ref.shape[0]

    @pl.when(ci == 0)
    def _init():
        slot_t_ref[:] = jnp.full((R, K), INF, jnp.float32)
        slot_alpha_ref[:] = jnp.zeros((R, K), jnp.float32)
        attr_ref[:] = jnp.zeros_like(attr_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    saturated = acc_ref[:, 0:1] <= log_thr
    kth = jnp.max(slot_t_ref[:], axis=1, keepdims=True)
    dead = rays_ref[:, 6:7] <= 0.0
    # `behind` uses the FIRST (nearest) of the two clusters - conservative
    cnear0 = cand_near_ref[ti, 2 * ci]
    behind = kth < cnear0
    all_done = jnp.all(saturated | behind | dead)

    def compute(gpack_ref, table_ref):
        t, alpha, valid, gvalid = _pair_math(scalar_ref, rays_ref, gpack_ref,
                                             exp_power=exp_power,
                                             secondary_static=secondary_static)
        acc_ref[:, 0:1] += jnp.sum(
            jnp.where(valid, jnp.log1p(-alpha), 0.0), axis=1, keepdims=True
        )
        # keepdims reduce stays in vector registers; jnp.sum to a 0-d scalar
        # forces a vector->SREG sync per chunk (measured ~us-scale, round 3)
        acc_ref[:, 1:2] += jnp.broadcast_to(
            jnp.sum(gvalid, axis=1, keepdims=True), (R, 1))
        acc_ref[:, 2:3] += 1.0  # computed (non-skipped) chunk counter
        _drain_composite(
            valid, t, alpha, table_ref[:], slot_t_ref, slot_alpha_ref,
            attr_ref, K,
        )

    @pl.when((cand_ref[ti, 2 * ci] >= 0) & ~all_done)
    def _compute0():
        compute(gpack0_ref, table0_ref)

    @pl.when((cand_ref[ti, 2 * ci + 1] >= 0) & ~all_done)
    def _compute1():
        compute(gpack1_ref, table1_ref)

    @pl.when(ci == pl.num_programs(1) - 1)
    def _final():
        slot_attr = tuple(attr_ref[:, a * K:(a + 1) * K]
                          for a in range(NUM_ATTR))
        _composite_epilogue(scalar_ref, slot_t_ref[:], slot_alpha_ref[:],
                            slot_attr, acc_ref, out_ref)


@partial(
    jax.jit,
    static_argnames=("exp_power", "max_hits", "cluster", "tile", "interpret",
                     "secondary_static"),
)
def pallas_render_culled(
    rays_o, rays_d, gpack, table, candidates, cand_near, near, far, exp_power,
    secondary, backfacing_max_dist, backfacing_invalid_normal_threshold,
    transmittance_threshold=0.01, eps_forward_normalization=1e-12,
    max_hits: int = 32, cluster: int = 256, tile: int = 256,
    interpret: bool = False, alive=None, secondary_static: int = -1,
):
    """Culled trace + composite in one kernel.  Returns [R, OUT_LANES] f32.

    SMEM budget: candidates + cand_near are scalar-prefetched, so
    R/tile * MC * 8 bytes must stay < ~0.5 MB - callers chunk the frame
    (see renderer.raytracer.render_frame_fused)."""
    R = rays_o.shape[0]
    N = gpack.shape[1]
    assert N % cluster == 0 and R % tile == 0
    K = max_hits
    n_tiles = R // tile
    if candidates.shape[1] % 2:
        candidates = jnp.pad(candidates, ((0, 0), (0, 1)),
                             constant_values=-1)
        cand_near = jnp.pad(cand_near, ((0, 0), (0, 1)),
                            constant_values=3e38)
    mc = candidates.shape[1]
    alive_col = (jnp.ones((R, 1), jnp.float32) if alive is None
                 else alive.reshape(R, 1).astype(jnp.float32))
    rays = jnp.concatenate(
        [rays_o, rays_d, alive_col, jnp.zeros((R, 1), jnp.float32)], axis=1
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
    def gspec(slot):
        return pl.BlockSpec(
            (N_ROWS, cluster),
            lambda ti, ci, cand, cnear, s=slot: (
                0, jnp.maximum(cand[ti, 2 * ci + s], 0)),
            memory_space=pltpu.VMEM,
        )

    def tspec(slot):
        return pl.BlockSpec(
            (cluster, TABLE_A),
            lambda ti, ci, cand, cnear, s=slot: (
                jnp.maximum(cand[ti, 2 * ci + s], 0), 0),
            memory_space=pltpu.VMEM,
        )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_tiles, mc // 2),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((tile, 8), lambda ti, ci, cand, cnear: (ti, 0),
                         memory_space=pltpu.VMEM),
            gspec(0), tspec(0), gspec(1), tspec(1),
        ],
        out_specs=pl.BlockSpec((tile, OUT_LANES),
                               lambda ti, ci, cand, cnear: (ti, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((tile, K), jnp.float32),
            pltpu.VMEM((tile, K), jnp.float32),
            pltpu.VMEM((tile, NUM_ATTR * K), jnp.float32),
            pltpu.VMEM((tile, 128), jnp.float32),
        ],
    )
    return pl.pallas_call(
        partial(_render_kernel, K=K, cluster=cluster,
                exp_power=float(exp_power),
                secondary_static=secondary_static),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((R, OUT_LANES), jnp.float32),
        interpret=interpret,
    )(candidates, cand_near, scalars, rays, gpack, table, gpack, table)


def unpack_composite(out):
    """[R, OUT_LANES] -> dict matching ops.composite.CompositeOut fields."""
    return dict(
        rgb=out[:, OUT_RGB:OUT_RGB + 3],
        normal=out[:, OUT_NRM:OUT_NRM + 3],
        f0=out[:, OUT_F0:OUT_F0 + 3],
        roughness=out[:, OUT_ROUGH],
        depth=out[:, OUT_DEPTH],
        T_final=out[:, OUT_TFINAL],
        full_T=out[:, OUT_FULLT],
        num_accumulated=out[:, OUT_NUMACC].astype(jnp.int32),
        num_traversed=out[:, OUT_TRAV].astype(jnp.int32),
    )


# ---------------------------------------------------------------------------
# Training variant: same culled drain, but every slot carries the FULL
# per-hit payload (shading attrs + frame fields + global id), extracted with
# two one-hot MXU dots per insertion, and the K slots are depth-sorted
# in-kernel (rank-place) before being written out.  The training step then
# composites / runs the loss-fused backward on [R, K] slot data with ZERO
# XLA gathers - the stages that made train_step 15 s/iter at 768px.
# ---------------------------------------------------------------------------

# frame-table columns (second MXU side table, [N, FTABLE_A])
FCOL_MEAN = 0      # 3
FCOL_ROT = 3       # 9 (row-major)
FCOL_INV = 12      # 3
FCOL_SF = 15
FCOL_OPACITY = 16
FCOL_SCALING = 17  # 3 (activated exp(scale))
FCOL_QUAT = 20     # 4 (raw quaternion)
FTABLE_A = 32      # padded
NUM_FRAME = 24     # used frame columns carried per slot

SLOT_BLOCKS = 3 + NUM_ATTR + NUM_FRAME  # t, alpha, id, attrs, frames
PAY_STRIDE = 128  # aligned lane stripe per payload block in scratch


def pack_frame_table(frames, scene) -> jnp.ndarray:
    """GaussianFrames + raw scene -> [N, FTABLE_A] f32 (backward inputs)."""
    n = frames.mean.shape[0]
    cols = jnp.zeros((n, FTABLE_A), jnp.float32)
    cols = cols.at[:, FCOL_MEAN:FCOL_MEAN + 3].set(frames.mean)
    cols = cols.at[:, FCOL_ROT:FCOL_ROT + 9].set(frames.rot.reshape(n, 9))
    cols = cols.at[:, FCOL_INV:FCOL_INV + 3].set(frames.inv_sizes)
    cols = cols.at[:, FCOL_SF].set(frames.sf)
    cols = cols.at[:, FCOL_OPACITY].set(frames.opacity)
    cols = cols.at[:, FCOL_SCALING:FCOL_SCALING + 3].set(
        jnp.exp(scene.scaling))
    cols = cols.at[:, FCOL_QUAT:FCOL_QUAT + 4].set(scene.rotation)
    return cols


def _drain_slots(valid, t, alpha, base_id, table, ftable,
                 slot_t_ref, slot_alpha_ref, slot_id_ref, pay_ref, K):
    """Replace-max drain extracting (id, attrs, frame fields) per hit.

    Slot state lives in REFS and is mutated inside the while body - carrying
    the ~37 [R, K] payload blocks as loop state made Mosaic copy/spill
    ~1.2 MB per iteration (measured 91x slower than the render kernel's
    drain).  The loop carry is just (tmin, kth, tmask)."""
    R, C = t.shape
    NP = NUM_ATTR + NUM_FRAME
    lane_ids = jax.lax.broadcasted_iota(jnp.int32, (R, C), 1).astype(jnp.float32)
    slot_idx = jax.lax.broadcasted_iota(jnp.int32, (R, K), 1).astype(jnp.float32)
    gid = lane_ids + jax.lax.convert_element_type(base_id, jnp.float32)

    kth0 = jnp.max(slot_t_ref[:], axis=1, keepdims=True)
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
        dn = (((1,), (0,)), ((), ()))
        v1 = jax.lax.dot_general(ohf, table, dn,
                                 preferred_element_type=jnp.float32,
                                 precision=jax.lax.Precision.HIGHEST)
        v2 = jax.lax.dot_general(ohf, ftable, dn,
                                 preferred_element_type=jnp.float32,
                                 precision=jax.lax.Precision.HIGHEST)

        slot_t = slot_t_ref[:]
        s_is_max = slot_t >= kth
        s_win = jnp.min(jnp.where(s_is_max, slot_idx, jnp.float32(1e9)),
                        axis=1, keepdims=True)
        slot_oh = s_is_max & (slot_idx <= s_win) & ins
        bc = lambda v: jnp.broadcast_to(v, (R, K))
        new_t = jnp.where(slot_oh, bc(tmin), slot_t)
        slot_t_ref[:] = new_t
        slot_alpha_ref[:] = jnp.where(slot_oh, bc(a_val), slot_alpha_ref[:])
        slot_id_ref[:] = jnp.where(slot_oh, bc(g_val), slot_id_ref[:])
        # payload stripes are 128-lane aligned (PAY_STRIDE): 32-lane-offset
        # slices of a wide ref were measured ~3.6x slower to RMW
        for a in range(NP):
            col = (v1[:, a:a + 1] if a < NUM_ATTR
                   else v2[:, a - NUM_ATTR:a - NUM_ATTR + 1])
            pay_ref[:, a * PAY_STRIDE:a * PAY_STRIDE + K] = jnp.where(
                slot_oh, bc(col),
                pay_ref[:, a * PAY_STRIDE:a * PAY_STRIDE + K])
        tmask = jnp.where(lane_oh, INF, tmask)
        tmin = jnp.min(tmask, axis=1, keepdims=True)
        kth = jnp.max(new_t, axis=1, keepdims=True)
        return (tmin, kth, tmask)

    jax.lax.while_loop(cond, body, (tmin0, kth0, tmask))


def _rank_sort_to_ref(slot_t, blocks, fills, out_ref, K):
    """Depth-sort (ties by slot index) applied to every block via rank-place
    (the trace_kernel._sort_slots algorithm, generalized), writing sorted
    column k of every block straight into out_ref at fori step k.

    blocks are closed over as loop INVARIANTS (no carried state - carried
    block tuples made Mosaic copy/spill them every iteration)."""
    R = slot_t.shape[0]
    slot_idx = jax.lax.broadcasted_iota(jnp.int32, (R, K), 1).astype(jnp.float32)
    rank = jnp.zeros((R, K), jnp.float32)
    for shift in range(1, K):
        ot = pltpu.roll(slot_t, shift=shift, axis=1)
        oi = pltpu.roll(slot_idx, shift=shift, axis=1)
        before = (ot < slot_t) | ((ot == slot_t) & (oi < slot_idx))
        rank = rank + before.astype(jnp.float32)

    def body(k, _):
        kf = jax.lax.convert_element_type(k, jnp.float32)
        sel = rank == kf
        got = jnp.any(sel, axis=1, keepdims=True)
        # single-lane dynamic stores are not lowerable (lane index must be
        # 128-aligned) - masked full-block read-modify-writes instead
        dst = (slot_idx == kf) & got
        for a, (b, fill) in enumerate(zip(blocks, fills)):
            v = jnp.sum(jnp.where(sel, b, 0.0), axis=1, keepdims=True)
            cur = out_ref[:, a * K:(a + 1) * K]
            out_ref[:, a * K:(a + 1) * K] = jnp.where(
                dst, jnp.broadcast_to(jnp.where(got, v, fill), cur.shape),
                cur)
        return 0

    out_ref[:] = jnp.zeros_like(out_ref)
    jax.lax.fori_loop(0, K, body, 0)


def _slots_kernel(
    cand_ref, cand_near_ref, scalar_ref, rays_ref, gpack0_ref, table0_ref,
    ftable0_ref, gpack1_ref, table1_ref, ftable1_ref,
    slots_out_ref, acc_out_ref,
    slot_t_ref, slot_alpha_ref, slot_id_ref, pay_ref, acc_ref,
    *, K: int, cluster: int, exp_power: float, secondary_static: int = -1,
):
    ti = pl.program_id(0)
    ci = pl.program_id(1)
    log_thr = scalar_ref[9]
    R = rays_ref.shape[0]
    NP = NUM_ATTR + NUM_FRAME

    @pl.when(ci == 0)
    def _init():
        slot_t_ref[:] = jnp.full((R, K), INF, jnp.float32)
        slot_alpha_ref[:] = jnp.zeros((R, K), jnp.float32)
        slot_id_ref[:] = jnp.zeros((R, K), jnp.float32)
        pay_ref[:] = jnp.zeros_like(pay_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    saturated = acc_ref[:, 0:1] <= log_thr
    kth = jnp.max(slot_t_ref[:], axis=1, keepdims=True)
    dead = rays_ref[:, 6:7] <= 0.0
    behind = kth < cand_near_ref[ti, 2 * ci]
    all_done = jnp.all(saturated | behind | dead)

    def compute(gpack_ref, table_ref, ftable_ref, cand):
        t, alpha, valid, gvalid = _pair_math(scalar_ref, rays_ref, gpack_ref,
                                             exp_power=exp_power,
                                             secondary_static=secondary_static)
        acc_ref[:, 0:1] += jnp.sum(
            jnp.where(valid, jnp.log1p(-alpha), 0.0), axis=1, keepdims=True
        )
        # keepdims reduce stays in vector registers; jnp.sum to a 0-d scalar
        # forces a vector->SREG sync per chunk (measured ~us-scale, round 3)
        acc_ref[:, 1:2] += jnp.broadcast_to(
            jnp.sum(gvalid, axis=1, keepdims=True), (R, 1))
        acc_ref[:, 2:3] += 1.0
        _drain_slots(
            valid, t, alpha, cand * cluster, table_ref[:], ftable_ref[:],
            slot_t_ref, slot_alpha_ref, slot_id_ref, pay_ref, K,
        )

    @pl.when((cand_ref[ti, 2 * ci] >= 0) & ~all_done)
    def _compute0():
        compute(gpack0_ref, table0_ref, ftable0_ref, cand_ref[ti, 2 * ci])

    @pl.when((cand_ref[ti, 2 * ci + 1] >= 0) & ~all_done)
    def _compute1():
        compute(gpack1_ref, table1_ref, ftable1_ref,
                cand_ref[ti, 2 * ci + 1])

    @pl.when(ci == pl.num_programs(1) - 1)
    def _final():
        blocks = [slot_t_ref[:], slot_alpha_ref[:], slot_id_ref[:]] + [
            pay_ref[:, a * PAY_STRIDE:a * PAY_STRIDE + K]
            for a in range(NP)]
        fills = [INF, 0.0, 0.0] + [0.0] * NP
        _rank_sort_to_ref(slot_t_ref[:], blocks, fills, slots_out_ref, K)
        z = jnp.zeros((R, 1), jnp.float32)
        acc_out_ref[:] = jnp.concatenate(
            [acc_ref[:, 0:1], acc_ref[:, 1:2], acc_ref[:, 2:3]]
            + [z] * 13, axis=1)


@partial(
    jax.jit,
    static_argnames=("exp_power", "max_hits", "cluster", "tile", "interpret",
                     "secondary_static"),
)
def pallas_trace_slots(
    rays_o, rays_d, gpack, table, ftable, candidates, cand_near, near, far,
    exp_power, secondary, backfacing_max_dist,
    backfacing_invalid_normal_threshold, transmittance_threshold=0.01,
    max_hits: int = 32, cluster: int = 256, tile: int = 256,
    interpret: bool = False, alive=None, secondary_static: int = -1,
):
    """Culled trace returning depth-sorted full-payload slots.

    Returns (slots [R, SLOT_BLOCKS*K], acc [R, 16]) - unpack with
    unpack_slots."""
    R = rays_o.shape[0]
    N = gpack.shape[1]
    assert N % cluster == 0 and R % tile == 0
    K = max_hits
    n_tiles = R // tile
    if candidates.shape[1] % 2:
        candidates = jnp.pad(candidates, ((0, 0), (0, 1)),
                             constant_values=-1)
        cand_near = jnp.pad(cand_near, ((0, 0), (0, 1)),
                            constant_values=3e38)
    mc = candidates.shape[1]
    alive_col = (jnp.ones((R, 1), jnp.float32) if alive is None
                 else alive.reshape(R, 1).astype(jnp.float32))
    rays = jnp.concatenate(
        [rays_o, rays_d, alive_col, jnp.zeros((R, 1), jnp.float32)], axis=1
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

    def gspec(slot):
        return pl.BlockSpec(
            (N_ROWS, cluster),
            lambda ti, ci, cand, cnear, s=slot: (
                0, jnp.maximum(cand[ti, 2 * ci + s], 0)),
            memory_space=pltpu.VMEM,
        )

    def tspec(slot, width):
        return pl.BlockSpec(
            (cluster, width),
            lambda ti, ci, cand, cnear, s=slot: (
                jnp.maximum(cand[ti, 2 * ci + s], 0), 0),
            memory_space=pltpu.VMEM,
        )

    NPK = SLOT_BLOCKS * K
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_tiles, mc // 2),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((tile, 8), lambda ti, ci, cand, cnear: (ti, 0),
                         memory_space=pltpu.VMEM),
            gspec(0), tspec(0, TABLE_A), tspec(0, FTABLE_A),
            gspec(1), tspec(1, TABLE_A), tspec(1, FTABLE_A),
        ],
        out_specs=(
            pl.BlockSpec((tile, NPK), lambda ti, ci, cand, cnear: (ti, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 16), lambda ti, ci, cand, cnear: (ti, 0),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((tile, K), jnp.float32),
            pltpu.VMEM((tile, K), jnp.float32),
            pltpu.VMEM((tile, K), jnp.float32),
            pltpu.VMEM((tile, (NUM_ATTR + NUM_FRAME) * PAY_STRIDE),
                       jnp.float32),
            pltpu.VMEM((tile, 128), jnp.float32),
        ],
    )
    return pl.pallas_call(
        partial(_slots_kernel, K=K, cluster=cluster,
                exp_power=float(exp_power),
                secondary_static=secondary_static),
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((R, NPK), jnp.float32),
            jax.ShapeDtypeStruct((R, 16), jnp.float32),
        ),
        # the 37 slot blocks + [tile, NPK] output block overflow the 16 MB
        # default scoped-vmem budget by ~1%; v5e has 128 MB physical VMEM
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=32 * 1024 * 1024),
        interpret=interpret,
    )(candidates, cand_near, scalars, rays, gpack, table, ftable,
      gpack, table, ftable)


def merge_slots(slots_n, acc_n, slots_f, acc_f, K_n: int, K_f: int):
    """Concatenate near-pass and far-pass slots buffers into one depth-
    consistent [R, SLOT_BLOCKS*(K_n+K_f)] list + combined acc.

    Valid because the split-far t-window guarantees every far hit is
    farther than every near hit, and ops.composite's cumprod ignores the
    interleaved invalid pads (alpha 0, valid False) - so concatenation IS
    the sorted merge.  acc: log-transmittance and the counters add."""
    R = slots_n.shape[0]
    sn = slots_n.reshape(R, SLOT_BLOCKS, K_n)
    sf = slots_f.reshape(R, SLOT_BLOCKS, K_f)
    slots = jnp.concatenate([sn, sf], axis=-1).reshape(
        R, SLOT_BLOCKS * (K_n + K_f))
    acc = jnp.concatenate([acc_n[:, :3] + acc_f[:, :3], acc_n[:, 3:]],
                          axis=1)
    return slots, acc


def unpack_slots(slots, acc, K, rays_o, rays_d):
    """Slots -> (RayHits-fields dict, attrs dict, frames dict).

    gaussval and local_hit are RECOMPUTED from the slot frame fields
    ([R, K] math, no gathers): gaussval = alpha / (MAX_ALPHA * opacity),
    local_hit = sf * (lo + t * ld) with lo/ld from the stored frame."""
    def blk(i):
        return slots[:, i * K:(i + 1) * K]

    def vec(i, n):
        return jnp.stack([blk(i + j) for j in range(n)], axis=-1)

    t = blk(0)
    alpha = blk(1)
    ids = blk(2)
    a0 = 3
    attrs = dict(rgb=vec(a0, 3), normal=vec(a0 + 3, 3), f0=vec(a0 + 6, 3),
                 roughness=blk(a0 + 9))
    f0_ = a0 + NUM_ATTR
    valid = t < 1e37
    v1 = valid[..., None]

    def safe(x, default):
        return jnp.where(v1 if x.ndim == 3 else valid, x, default)

    # invalid slots carry zeros; substitute degenerate-safe frame values so
    # backward's quaternion normalize / divisions never see 0/0 (their
    # gradients are killed by weight = 0 regardless, matching the gathered
    # path where empty slots alias Gaussian 0's real data)
    quat = vec(f0_ + FCOL_QUAT, 4)
    quat = jnp.where(v1, quat, jnp.array([1.0, 0, 0, 0], jnp.float32))
    rot9 = vec(f0_ + FCOL_ROT, 9)
    rot9 = jnp.where(v1, rot9,
                     jnp.array([1, 0, 0, 0, 1, 0, 0, 0, 1], jnp.float32))
    frames = dict(
        mean=safe(vec(f0_ + FCOL_MEAN, 3), 0.0),
        rot=rot9,
        inv_sizes=safe(vec(f0_ + FCOL_INV, 3), 1.0),
        sf=safe(blk(f0_ + FCOL_SF), 1.0),
        opacity=safe(blk(f0_ + FCOL_OPACITY), 1.0),
        scaling_act=safe(vec(f0_ + FCOL_SCALING, 3), 1.0),
        rotation_raw=quat,
    )
    ts = jnp.where(valid, t, 0.0)
    from ..gaussian_kernel import MAX_ALPHA as MA
    gaussval = jnp.where(
        valid, alpha / jnp.maximum(MA * frames["opacity"], 1e-30), 0.0)
    rot = frames["rot"].reshape(frames["rot"].shape[:2] + (3, 3))
    rel = rays_o[:, None, :] - frames["mean"]
    lo = jnp.sum(rot * rel[..., :, None], axis=-2) * frames["inv_sizes"]
    ld = jnp.sum(rot * rays_d[:, None, :, None], axis=-2) * frames["inv_sizes"]
    local_hit = frames["sf"][..., None] * (lo + ts[..., None] * ld)
    hits = dict(
        ids=jnp.where(valid, ids, 0.0).astype(jnp.int32),
        t=ts,
        alpha=jnp.where(valid, alpha, 0.0),
        gaussval=gaussval,
        local_hit=jnp.where(valid[..., None], local_hit, 0.0),
        valid=valid,
        full_T=jnp.exp(acc[:, 0]),
        num_traversed=acc[:, 1].astype(jnp.int32),
    )
    frames["rot_mat"] = rot
    return hits, attrs, frames
