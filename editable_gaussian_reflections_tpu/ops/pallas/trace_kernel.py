"""Fused Pallas trace kernel: ray x Gaussian intersection + streaming top-K.

This is the TPU replacement for the hot path of the reference's OptiX
traversal + per-pixel linked list + k-buffer rescans
(shaders.cu:9-75, forward_pass.cu:49-137).  Grid = (ray_tiles, chunks); for
each ray tile the kernel:

  * streams Gaussian chunks HBM->VMEM (Pallas grid pipelining),
  * evaluates the closed-form max-response intersection entirely in VMEM
    (no [R, N] intermediates ever touch HBM - the XLA lowering of the same
    math is HBM-bound and far off VPU peak),
  * maintains the K nearest hits per ray in VMEM slot buffers via a
    replace-max drain loop (TPUs have no per-lane scatter; the drain
    extracts per-ray minima with masked reductions and writes slots through
    K-wide one-hots - each chunk only drains hits closer than the current
    per-ray K-th distance, so saturated rays skip chunks almost entirely,
    the same self-culling the reference gets from its transmittance
    early-out),
  * accumulates the exact total transmittance sum(log1p(-alpha)) over ALL
    hits (payload-1 equivalent, shaders.cu:68-71) and traversal stats.

Intersection identities (avoid sqrt/normalize of the OptiX formulation):
with lo = Dinv R^T (o - mu), ld = Dinv R^T d:
  t_world = -<lo,ld>/<ld,ld>,   |u|^2 = <lo,lo> - <lo,ld>^2/<ld,ld>.

A final in-kernel selection sort orders the K slots by depth, and the drain
extracts per-hit payloads (alpha/gaussval/local_hit, optionally shading
attributes) into slot aux buffers, so no XLA argsort/gather stages remain.

Two dead ends were measured in round 1 and deliberately removed (RESULTS.md):
an MXU-featurized variant (precision-matrix quadratic forms as [R,32]x[32,C]
matmuls, 0.87x - the rank-32 contraction starves the MXU while the epilogue
stays VPU-bound) and the pre-fusion kernels that returned unsorted slots for
XLA post-processing.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..gaussian_kernel import MAX_ALPHA
from ..intersect import GaussianFrames

# gpack row layout (transposed SoA: [N_ROWS, N]; a chunk block is [N_ROWS, C])
ROW_MEAN = 0        # 3 rows
ROW_ROT = 3         # 9 rows, row-major r00..r22
ROW_INV = 12        # 3 rows
ROW_OPACITY = 15
ROW_SF2 = 16        # scaling_factor^2
ROW_NRM = 17        # 3 rows (raw normal, for the secondary backfacing test)
ROW_NLEN = 20
ROW_VALID = 21
ROW_RGB = 22        # 3 rows (relu-activated diffuse)
ROW_F0 = 25         # 3 rows
ROW_ROUGH = 28
N_ROWS = 32         # padded

INF = 3.0e38  # plain float: jnp constants would be captured as kernel consts


def pack_frames(frames: GaussianFrames, attrs=None) -> jnp.ndarray:
    """GaussianFrames (+ activated SceneAttributes) -> [N_ROWS, N] f32.

    Shading attributes ride along so the fused kernel can extract them per
    hit (zeros when attrs is None - geometry-only uses)."""
    n = frames.mean.shape[0]
    rot_rows = frames.rot.reshape(n, 9)
    z = jnp.zeros((n,), jnp.float32)
    if attrs is None:
        rgb = f0 = (z, z, z)
        rough = z
    else:
        rgb = (attrs.rgb[:, 0], attrs.rgb[:, 1], attrs.rgb[:, 2])
        f0 = (attrs.f0[:, 0], attrs.f0[:, 1], attrs.f0[:, 2])
        rough = attrs.roughness
    rows = [
        frames.mean[:, 0], frames.mean[:, 1], frames.mean[:, 2],
        *[rot_rows[:, i] for i in range(9)],
        frames.inv_sizes[:, 0], frames.inv_sizes[:, 1], frames.inv_sizes[:, 2],
        frames.opacity,
        frames.sf * frames.sf,
        frames.normal[:, 0], frames.normal[:, 1], frames.normal[:, 2],
        jnp.linalg.norm(frames.normal, axis=-1),
        frames.valid.astype(jnp.float32),
        *rgb,
        *f0,
        rough,
        z, z, z,
    ]
    return jnp.stack(rows, axis=0)



# ---------------------------------------------------------------------------
# Fused variant: the drain additionally extracts per-hit alpha / gaussval /
# local_hit into slot buffers, and the final grid step selection-sorts the
# K slots by depth in-kernel.  This removes the XLA post-stages that dominate
# the frame outside the kernel (argsort ~128ms, frame gathers + intersection
# recompute ~278ms at 65k rays x K=32 - TPU gathers and sorts are slow).
# Aux layout: [R, AUX_N*K], blocks = alpha, gaussval, lh_x, lh_y, lh_z.
# ---------------------------------------------------------------------------

# aux blocks: alpha, gaussval, lh_x/y/z (+ rgb3, nrm3, f03, roughness when
# extract_attrs - measured slower than the XLA gather on dense scenes, so it
# is off by default; the payload extraction runs inside the drain loop)
AUX_GEO = 5
AUX_ALL = 15


def _aux_counts(extract_attrs: bool):
    n = AUX_ALL if extract_attrs else AUX_GEO
    pad = 16 if extract_attrs else 8
    return n, pad


def _drain_topk_aux(valid, t, aux, slot_t_ref, slot_id_ref, slot_aux_ref,
                    base_gaussian, K):
    """Replace-max drain that also moves aux payloads into slots.

    Aux slot blocks are carried as separate [R, K] arrays (concatenating
    wide [R, A*K] masks per iteration made Mosaic keep huge live ranges)."""
    R, C = t.shape
    base_id = jax.lax.convert_element_type(base_gaussian, jnp.float32)
    lane_ids = (
        jax.lax.broadcasted_iota(jnp.int32, (R, C), 1).astype(jnp.float32)
        + base_id
    )
    slot_idx = jax.lax.broadcasted_iota(jnp.int32, (R, K), 1).astype(jnp.float32)
    A = len(aux)

    def cond(state):
        remaining, slot_t = state[0], state[1]
        curmax = jnp.max(slot_t, axis=1, keepdims=True)
        return jnp.any((remaining > 0.0) & (t < curmax))

    def body(state):
        remaining, slot_t, slot_id = state[0], state[1], state[2]
        slot_aux = state[3:]
        curmax = jnp.max(slot_t, axis=1, keepdims=True)
        insertable = (remaining > 0.0) & (t < curmax)
        tm = jnp.where(insertable, t, INF)
        tmin = jnp.min(tm, axis=1, keepdims=True)
        has = tmin < INF
        is_min = insertable & (tm <= tmin)
        id_sel = jnp.min(
            jnp.where(is_min, lane_ids, INF), axis=1, keepdims=True
        )
        lane_oh = is_min & (lane_ids <= id_sel)
        remaining = jnp.where(lane_oh, 0.0, remaining)

        smax = jnp.max(slot_t, axis=1, keepdims=True)
        s_is_max = slot_t >= smax
        s_win = jnp.min(
            jnp.where(s_is_max, slot_idx, jnp.float32(1e9)), axis=1,
            keepdims=True,
        )
        slot_oh = s_is_max & (slot_idx <= s_win) & has
        slot_t = jnp.where(slot_oh, jnp.broadcast_to(tmin, slot_t.shape),
                           slot_t)
        slot_id = jnp.where(slot_oh, jnp.broadcast_to(id_sel, slot_id.shape),
                            slot_id)

        new_aux = []
        for a in range(A):
            v = jnp.sum(jnp.where(lane_oh, aux[a], 0.0), axis=1, keepdims=True)
            new_aux.append(
                jnp.where(slot_oh, jnp.broadcast_to(v, (R, K)), slot_aux[a])
            )
        return (remaining, slot_t, slot_id, *new_aux)

    init_aux = tuple(slot_aux_ref[:, a * K:(a + 1) * K] for a in range(A))
    out = jax.lax.while_loop(
        cond, body,
        (valid.astype(jnp.float32), slot_t_ref[:], slot_id_ref[:], *init_aux),
    )
    slot_t_ref[:] = out[1]
    slot_id_ref[:] = out[2]
    for a in range(A):
        slot_aux_ref[:, a * K:(a + 1) * K] = out[3 + a]


def _sort_slots(slot_t_ref, slot_id_ref, slot_aux_ref, K, A=AUX_GEO):
    """In-kernel selection sort of the K slots by depth (runs once, at the
    final grid step - replaces the XLA argsort + take_along_axis stage).

    Implemented as a rank computation: each slot's destination index is the
    number of slots strictly nearer (ties broken by slot index), and the
    sorted output at column k is extracted with a rank==k one-hot reduction.
    O(K) full-width ops total, no per-iteration state."""
    st = slot_t_ref[:]
    si = slot_id_ref[:]
    R = st.shape[0]
    slot_idx = jax.lax.broadcasted_iota(jnp.int32, (R, K), 1).astype(jnp.float32)

    # rank[r, j] = #{i : (t_i, idx_i) < (t_j, idx_j)}
    rank = jnp.zeros((R, K), jnp.float32)
    for shift in range(1, K):
        ot = pltpu.roll(st, shift=shift, axis=1)
        oi = pltpu.roll(slot_idx, shift=shift, axis=1)
        before = (ot < st) | ((ot == st) & (oi < slot_idx))
        rank = rank + before.astype(jnp.float32)

    def place(vals, fill):
        out = jnp.full((R, K), fill, jnp.float32)
        for k in range(K):
            sel = rank == float(k)
            v = jnp.sum(jnp.where(sel, vals, 0.0), axis=1, keepdims=True)
            got = jnp.any(sel, axis=1)[:, None]
            dst = slot_idx == float(k)
            out = jnp.where(dst & got, jnp.broadcast_to(v, (R, K)), out)
        return out

    slot_t_ref[:] = place(st, INF)
    slot_id_ref[:] = place(si, 0.0)
    for a in range(A):
        blk = slot_aux_ref[:, a * K:(a + 1) * K]
        slot_aux_ref[:, a * K:(a + 1) * K] = place(blk, 0.0)


def _trace_chunk_body_fused(
    scalar_ref, rays_ref, gpack_ref,
    slot_t_ref, slot_id_ref, slot_aux_ref, logt_ref, trav_ref,
    *, base_gaussian, K: int, exp_power: float, extract_attrs: bool = False,
):
    """Per-chunk intersect + aux-extracting drain (fused variant)."""
    C = gpack_ref.shape[1]
    R = rays_ref.shape[0]
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
    logt_ref[:, 0:1] += jnp.sum(
        jnp.where(valid, jnp.log1p(-alpha), 0.0), axis=1, keepdims=True
    )
    trav_ref[:, 0:1] += jnp.broadcast_to(jnp.sum(gvalid), (R, 1))

    # local hit (sf-scaled): lh = sf * (lo + t * ld)
    sf = jnp.sqrt(jnp.maximum(sf2, 0.0))
    lh = [sf * (lo[i] + t * ld[i]) for i in range(3)]

    aux = [alpha, gaussval, lh[0], lh[1], lh[2]]
    if extract_attrs:
        rgb = [jnp.broadcast_to(g[ROW_RGB + i, :][None, :], t.shape)
               for i in range(3)]
        f0 = [jnp.broadcast_to(g[ROW_F0 + i, :][None, :], t.shape)
              for i in range(3)]
        rough = jnp.broadcast_to(g[ROW_ROUGH, :][None, :], t.shape)
        nrm_b = [jnp.broadcast_to(nrm[i], t.shape) for i in range(3)]
        aux += [rgb[0], rgb[1], rgb[2], nrm_b[0], nrm_b[1], nrm_b[2],
                f0[0], f0[1], f0[2], rough]

    _drain_topk_aux(
        valid, t, aux,
        slot_t_ref, slot_id_ref, slot_aux_ref, base_gaussian, K,
    )


def _trace_kernel_fused(
    scalar_ref, rays_ref, gpack_ref,
    slot_t_ref, slot_id_ref, slot_aux_ref, logt_ref, trav_ref,
    *, K: int, exp_power: float, extract_attrs: bool = False,
):
    c = pl.program_id(1)
    R = rays_ref.shape[0]
    C = gpack_ref.shape[1]

    @pl.when(c == 0)
    def _init():
        slot_t_ref[:] = jnp.full((R, K), INF, jnp.float32)
        slot_id_ref[:] = jnp.zeros((R, K), jnp.float32)
        slot_aux_ref[:] = jnp.zeros_like(slot_aux_ref)
        logt_ref[:] = jnp.zeros_like(logt_ref)
        trav_ref[:] = jnp.zeros_like(trav_ref)

    _trace_chunk_body_fused(
        scalar_ref, rays_ref, gpack_ref,
        slot_t_ref, slot_id_ref, slot_aux_ref, logt_ref, trav_ref,
        base_gaussian=c * C, K=K, exp_power=exp_power,
        extract_attrs=extract_attrs,
    )

    @pl.when(c == pl.num_programs(1) - 1)
    def _final_sort():
        _sort_slots(slot_t_ref, slot_id_ref, slot_aux_ref, K,
                    A=_aux_counts(extract_attrs)[0])


def _trace_kernel_culled_fused(
    cand_ref, cand_near_ref, scalar_ref, rays_ref, gpack_ref,
    slot_t_ref, slot_id_ref, slot_aux_ref, logt_ref, trav_ref,
    *, K: int, exp_power: float, cluster: int, extract_attrs: bool = False,
):
    ti = pl.program_id(0)
    ci = pl.program_id(1)
    cand = cand_ref[ti, ci]
    cnear = cand_near_ref[ti, ci]
    log_thr = scalar_ref[6]
    R = rays_ref.shape[0]

    @pl.when(ci == 0)
    def _init():
        slot_t_ref[:] = jnp.full((R, K), INF, jnp.float32)
        slot_id_ref[:] = jnp.zeros((R, K), jnp.float32)
        slot_aux_ref[:] = jnp.zeros_like(slot_aux_ref)
        logt_ref[:] = jnp.zeros_like(logt_ref)
        trav_ref[:] = jnp.zeros_like(trav_ref)

    saturated = logt_ref[:, 0:1] <= log_thr
    kth = jnp.max(slot_t_ref[:], axis=1, keepdims=True)
    behind = kth < cnear
    all_done = jnp.all(saturated | behind)

    @pl.when((cand >= 0) & ~all_done)
    def _compute():
        _trace_chunk_body_fused(
            scalar_ref, rays_ref, gpack_ref,
            slot_t_ref, slot_id_ref, slot_aux_ref, logt_ref, trav_ref,
            base_gaussian=cand * cluster, K=K, exp_power=exp_power,
            extract_attrs=extract_attrs,
        )

    @pl.when(ci == pl.num_programs(1) - 1)
    def _final_sort():
        _sort_slots(slot_t_ref, slot_id_ref, slot_aux_ref, K,
                    A=_aux_counts(extract_attrs)[0])


def _fused_out(R, K, tile, prefetch: bool, extract_attrs: bool = False):
    aux_pad = _aux_counts(extract_attrs)[1]
    if prefetch:
        def idx(ti, ci, cand, cnear):
            return (ti, 0)
    else:
        def idx(ti, c):
            return (ti, 0)
    specs = (
        pl.BlockSpec((tile, K), idx, memory_space=pltpu.VMEM),
        pl.BlockSpec((tile, K), idx, memory_space=pltpu.VMEM),
        pl.BlockSpec((tile, aux_pad * K), idx, memory_space=pltpu.VMEM),
        pl.BlockSpec((tile, 128), idx, memory_space=pltpu.VMEM),
        pl.BlockSpec((tile, 128), idx, memory_space=pltpu.VMEM),
    )
    shapes = (
        jax.ShapeDtypeStruct((R, K), jnp.float32),
        jax.ShapeDtypeStruct((R, K), jnp.float32),
        jax.ShapeDtypeStruct((R, aux_pad * K), jnp.float32),
        jax.ShapeDtypeStruct((R, 128), jnp.float32),
        jax.ShapeDtypeStruct((R, 128), jnp.float32),
    )
    return specs, shapes


def _unpack_fused(slot_t, slot_id, slot_aux, logt, trav, K,
                  extract_attrs: bool = False):
    def vec3(b):
        return jnp.stack(
            [slot_aux[:, (b + i) * K:(b + 1 + i) * K] for i in range(3)],
            axis=-1,
        )

    attrs = None
    if extract_attrs:
        attrs = dict(rgb=vec3(5), normal=vec3(8), f0=vec3(11),
                     roughness=slot_aux[:, 14 * K:15 * K])
    return (
        slot_t,
        slot_id.astype(jnp.int32),
        slot_aux[:, 0:K],                      # alpha
        slot_aux[:, K:2 * K],                  # gaussval
        vec3(2),                               # local_hit [R, K, 3]
        attrs,
        logt[:, 0],
        trav[:, 0].astype(jnp.int32),
    )


@partial(
    jax.jit,
    static_argnames=("exp_power", "max_hits", "chunk", "tile", "interpret",
                     "extract_attrs"),
)
def pallas_trace_fused(
    rays_o, rays_d, gpack, near, far, exp_power, secondary,
    backfacing_max_dist, backfacing_invalid_normal_threshold,
    max_hits: int = 32, chunk: int = 512, tile: int = 256,
    interpret: bool = False, extract_attrs: bool = False,
):
    """Brute fused trace: returns (t_sorted, ids, alpha, gaussval,
    local_hit, log_full_T, traversed) - slots pre-sorted by depth."""
    R = rays_o.shape[0]
    N = gpack.shape[1]
    assert N % chunk == 0 and R % tile == 0
    K = max_hits
    rays = jnp.concatenate(
        [rays_o, rays_d, jnp.zeros((R, 2), jnp.float32)], axis=1
    ).astype(jnp.float32)
    scalars = jnp.stack([
        jnp.asarray(near, jnp.float32),
        jnp.asarray(far, jnp.float32),
        jnp.zeros((), jnp.float32),
        jnp.asarray(secondary, jnp.float32),
        jnp.asarray(backfacing_max_dist, jnp.float32),
        jnp.asarray(backfacing_invalid_normal_threshold, jnp.float32),
        jnp.zeros((), jnp.float32),
        jnp.zeros((), jnp.float32),
    ])
    out_specs, out_shape = _fused_out(R, K, tile, prefetch=False,
                                      extract_attrs=extract_attrs)
    outs = pl.pallas_call(
        partial(_trace_kernel_fused, K=K, exp_power=float(exp_power),
                extract_attrs=extract_attrs),
        grid=(R // tile, N // chunk),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((tile, 8), lambda ti, c: (ti, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((N_ROWS, chunk), lambda ti, c: (0, c),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(scalars, rays, gpack)
    return _unpack_fused(*outs, K, extract_attrs=extract_attrs)


@partial(
    jax.jit,
    static_argnames=("exp_power", "max_hits", "cluster", "tile", "interpret",
                     "extract_attrs"),
)
def pallas_trace_culled_fused(
    rays_o, rays_d, gpack, candidates, cand_near, near, far, exp_power,
    secondary, backfacing_max_dist, backfacing_invalid_normal_threshold,
    transmittance_threshold=0.01,
    max_hits: int = 32, cluster: int = 256, tile: int = 256,
    interpret: bool = False, extract_attrs: bool = False,
):
    """Culled fused trace; same returns as pallas_trace_fused."""
    R = rays_o.shape[0]
    N = gpack.shape[1]
    assert N % cluster == 0 and R % tile == 0
    K = max_hits
    n_tiles = R // tile
    mc = candidates.shape[1]
    rays = jnp.concatenate(
        [rays_o, rays_d, jnp.zeros((R, 2), jnp.float32)], axis=1
    ).astype(jnp.float32)
    scalars = jnp.stack([
        jnp.asarray(near, jnp.float32),
        jnp.asarray(far, jnp.float32),
        jnp.zeros((), jnp.float32),
        jnp.asarray(secondary, jnp.float32),
        jnp.asarray(backfacing_max_dist, jnp.float32),
        jnp.asarray(backfacing_invalid_normal_threshold, jnp.float32),
        jnp.log(jnp.asarray(transmittance_threshold, jnp.float32)),
        jnp.zeros((), jnp.float32),
    ])
    out_specs, out_shape = _fused_out(R, K, tile, prefetch=True,
                                      extract_attrs=extract_attrs)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_tiles, mc),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((tile, 8), lambda ti, ci, cand, cnear: (ti, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (N_ROWS, cluster),
                lambda ti, ci, cand, cnear: (0, jnp.maximum(cand[ti, ci], 0)),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=out_specs,
    )
    outs = pl.pallas_call(
        partial(_trace_kernel_culled_fused, K=K, exp_power=float(exp_power),
                cluster=cluster, extract_attrs=extract_attrs),
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
    )(candidates, cand_near, scalars, rays, gpack)
    return _unpack_fused(*outs, K, extract_attrs=extract_attrs)
