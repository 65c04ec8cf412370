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
DRAIN_UNROLL = 4  # hit extractions per while_loop iteration


def pack_attr_table(attrs) -> jnp.ndarray:
    """Activated SceneAttributes -> [N, TABLE_A] f32 table (MXU side input)."""
    n = attrs.rgb.shape[0]
    cols = jnp.zeros((n, TABLE_A), jnp.float32)
    cols = cols.at[:, COL_RGB:COL_RGB + 3].set(attrs.rgb)
    cols = cols.at[:, COL_NRM:COL_NRM + 3].set(attrs.normal)
    cols = cols.at[:, COL_F0:COL_F0 + 3].set(attrs.f0)
    cols = cols.at[:, COL_ROUGH].set(attrs.roughness)
    return cols


def _pair_math(scalar_ref, rays_ref, gpack_ref, *, exp_power: float):
    """Closed-form max-response intersection over the [R, C] pair block.

    Returns (t, alpha, valid) - the minimal quantities the composite path
    needs (no gaussval/local_hit; those are backward-only residuals)."""
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
    nrm = [g[ROW_NRM + i, :][None, :] for i in range(3)]
    nlen = g[ROW_NLEN, :][None, :]
    ndotd = nrm[0] * ld[0] + nrm[1] * ld[1] + nrm[2] * ld[2]
    reject = (t < bf_max_dist) & (nlen > bf_thr) & (ndotd > 0.0)
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


def _drain_composite(valid, t, alpha, table, slot_t, slot_alpha, slot_attr):
    """Replace-max top-K drain with MXU attribute extraction.

    slot_attr is a tuple of NUM_ATTR [R, K] blocks.  Per iteration: extract
    the per-ray nearest remaining hit (one lane one-hot), fetch its
    attribute row as one [R, C] x [C, A] matmul, and overwrite the ray's
    current worst slot.  Pre-gated by the entry kth so saturated rays cost
    nothing; per-ray `ins` keeps gating as kth shrinks.  (An int32-packed
    (t, lane) key variant was measured 1.35x SLOWER on v5e - integer
    min/max does not hit the fast VPU path - so keys stay float.)"""
    R, C = t.shape
    K = slot_t.shape[1]
    lane_ids = jax.lax.broadcasted_iota(jnp.int32, (R, C), 1).astype(jnp.float32)
    slot_idx = jax.lax.broadcasted_iota(jnp.int32, (R, K), 1).astype(jnp.float32)

    kth0 = jnp.max(slot_t, axis=1, keepdims=True)
    tmask = jnp.where(valid & (t < kth0), t, INF)
    tmin0 = jnp.min(tmask, axis=1, keepdims=True)

    def cond(st):
        tmin, kth = st[0], st[1]
        return jnp.any(tmin < kth)

    def extract_one(st):
        tmin, kth, tmask, slot_t, slot_alpha = st[:5]
        slot_attr = st[5:]
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
        )                                                        # [R, TABLE_A]

        s_is_max = slot_t >= kth
        s_win = jnp.min(jnp.where(s_is_max, slot_idx, jnp.float32(1e9)),
                        axis=1, keepdims=True)
        slot_oh = s_is_max & (slot_idx <= s_win) & ins
        slot_t = jnp.where(slot_oh, jnp.broadcast_to(tmin, slot_t.shape),
                           slot_t)
        slot_alpha = jnp.where(slot_oh, jnp.broadcast_to(a_val, (R, K)),
                               slot_alpha)
        new_attr = tuple(
            jnp.where(slot_oh, jnp.broadcast_to(v[:, a:a + 1], (R, K)),
                      slot_attr[a])
            for a in range(NUM_ATTR)
        )
        tmask = jnp.where(lane_oh, INF, tmask)
        tmin = jnp.min(tmask, axis=1, keepdims=True)
        kth = jnp.max(slot_t, axis=1, keepdims=True)
        return (tmin, kth, tmask, slot_t, slot_alpha, *new_attr)

    def body(st):
        # The while_loop has ~1 us fixed overhead per iteration on v5e -
        # 5-6x the actual body compute - so each iteration extracts
        # DRAIN_UNROLL hits (extra extractions no-op via the `ins` mask)
        for _ in range(DRAIN_UNROLL):
            st = extract_one(st)
        return st

    out = jax.lax.while_loop(
        cond, body, (tmin0, kth0, tmask, slot_t, slot_alpha, *slot_attr)
    )
    return out[3], out[4], out[5:]


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
    *, K: int, cluster: int, exp_power: float,
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
                                             exp_power=exp_power)
        acc_ref[:, 0:1] += jnp.sum(
            jnp.where(valid, jnp.log1p(-alpha), 0.0), axis=1, keepdims=True
        )
        acc_ref[:, 1:2] += jnp.broadcast_to(jnp.sum(gvalid), (R, 1))
        acc_ref[:, 2:3] += 1.0  # computed (non-skipped) chunk counter
        slot_attr = tuple(attr_ref[:, a * K:(a + 1) * K]
                          for a in range(NUM_ATTR))
        slot_t, slot_alpha, slot_attr = _drain_composite(
            valid, t, alpha, table_ref[:], slot_t_ref[:], slot_alpha_ref[:],
            slot_attr,
        )
        slot_t_ref[:] = slot_t
        slot_alpha_ref[:] = slot_alpha
        for a in range(NUM_ATTR):
            attr_ref[:, a * K:(a + 1) * K] = slot_attr[a]

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
    static_argnames=("exp_power", "max_hits", "cluster", "tile", "interpret"),
)
def pallas_render_culled(
    rays_o, rays_d, gpack, table, candidates, cand_near, near, far, exp_power,
    secondary, backfacing_max_dist, backfacing_invalid_normal_threshold,
    transmittance_threshold=0.01, eps_forward_normalization=1e-12,
    max_hits: int = 32, cluster: int = 256, tile: int = 256,
    interpret: bool = False, alive=None,
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
                exp_power=float(exp_power)),
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
