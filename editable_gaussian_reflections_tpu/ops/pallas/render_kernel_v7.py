"""Render kernel v7: QUADRIC pair math on the MXU (scan composite).

v6 made the composite drain-free; hardware attribution then left the
per-pair VPU algebra (~120 f32 ops: two 3x3 local-frame transforms, three
dots, validity, exp) as the dominant remaining cost.  v7 removes most of
it by rewriting the intersection algebra as QUADRATIC FORMS in the ray:

With M the gaussian's world->unit-sphere matrix (lo = M(o-mu), ld = M d,
exactly _pair_math_t's frame, shaders.cu:40-55 parity) and S = M^T M:

    dot_ll = d^T S d
    dot_ol = (o-mu)^T S d   = o'^T S d  - (S mu')  . d
    dot_oo = (o-mu)^T S (o-mu)
           = o'^T S o' - 2 (S mu') . o' + mu'^T S mu'
    ndotd  = nrm^T M d      = (M^T nrm) . d

(o' = o - center, mu' = mu - center; a shared scene center keeps the
expanded-form cancellation error ~eps * (dist/scale)^2 in unit-sphere
units - pinned by tests against the direct v6 algebra.)

Every right-hand side is a per-gaussian WEIGHT ROW dotted with a per-RAY
FEATURE (monomials of o', d).  The features are computed ONCE per ray
tile; per chunk the three dots + backfacing dot become four tiny MXU
matmuls ([C,6..10] x [K,R]), and the VPU keeps only ~45 ops/pair
(reciprocal, t, sq, validity, generalized-gaussian alpha, the prefix
scan).  The MXU - idle in v6 outside the attribute dot - absorbs the
pair algebra at 6-pass f32-exact precision.

Composite semantics are identical to v6 (streaming scan order, no K cap,
truncated-tail correction - forward_pass.cu:49-155 parity); only the
pair math generator changed.  tests/test_render_kernel_v7.py pins
equality against v6 including a far-offset small-scale precision case.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..gaussian_kernel import MAX_ALPHA
from .render_kernel import OUT_LANES, TABLE_A
from .render_kernel_v3 import (
    STRIPE_F0,
    STRIPE_NRM,
    STRIPE_RGB,
    STRIPE_ROUGH,
)
from .render_kernel_v5 import GROW0, _pair_math_t  # noqa: F401 (tests)
from .render_kernel_v6 import (
    _M_CHUNK,
    _M_COMP,
    _M_DEPTH,
    _M_FULL,
    _M_NUM,
    _M_ROWS,
    _M_TRAV,
)
from .trace_kernel import (
    ROW_INV,
    ROW_MEAN,
    ROW_NLEN,
    ROW_NRM,
    ROW_OPACITY,
    ROW_ROT,
    ROW_SF2,
    ROW_VALID,
)

QLANES = 128      # tq row width
# quadric weight columns (after the 32 gpack attribute columns)
QCOL_DD = 32      # 6: [S00,S11,S22,2S01,2S02,2S12]      vs dd6
QCOL_OD = 38      # 6: [S00,S11,S22,S01,S02,S12]         vs od6
QCOL_OLD = 44     # 3: -(S mu')                          vs d
QCOL_OO = 47      # 6: = QCOL_DD weights                 vs oo6
QCOL_OOO = 53     # 3: -2 (S mu')                        vs o'
QCOL_C = 56       # 1: mu'^T S mu'                       vs 1
QCOL_ND = 57      # 3: M^T nrm                           vs d
QCOLS_END = 60

# per-tile ray-feature rows (VMEM scratch [32, R])
_F_DD = 0         # 6: dx2,dy2,dz2,dxdy,dxdz,dydz
_F_OD = 6         # 6: oxdx,oydy,ozdz, oxdy+oydx, oxdz+ozdx, oydz+ozdy
_F_D = 12         # 3
_F_OO = 15        # 6: ox2,oy2,oz2,oxoy,oxoz,oyoz
_F_O = 21         # 3
_F_ONE = 24       # 1
_F_ROWS = 32


def pack_quadric_lanes(gpack: jnp.ndarray, center=None):
    """[N_ROWS, N] gpack -> ([N, 128] tq with quadric weight columns,
    center [3]).

    tq columns 0..31 mirror the gpack rows (so the attribute-extraction
    dot and broadcast columns are untouched); 32..59 carry the quadric
    weights above.  `center` defaults to the valid-mass mean of means."""
    mean = gpack[ROW_MEAN:ROW_MEAN + 3].T                     # [N, 3]
    rot = gpack[ROW_ROT:ROW_ROT + 9].T                        # [N, 9]
    inv = gpack[ROW_INV:ROW_INV + 3].T                        # [N, 3]
    nrm = gpack[ROW_NRM:ROW_NRM + 3].T                        # [N, 3]
    valid = gpack[ROW_VALID]                                  # [N]

    if center is None:
        w = valid.astype(jnp.float32)
        center = (jnp.sum(mean * w[:, None], axis=0)
                  / jnp.maximum(jnp.sum(w), 1.0))
    center = jnp.asarray(center, jnp.float32)

    # M[i, j] = inv_i * rot[3j + i]  (matches _pair_math_t's
    # lo_i = inv_i * (rot[i] rel0 + rot[3+i] rel1 + rot[6+i] rel2))
    # HIGHEST precision: the default TPU matmul precision (bf16 passes)
    # destroys the expanded-form cancellation budget in these weights
    # (measured: 7/8 equality tests fail on hardware at default precision)
    hp = jax.lax.Precision.HIGHEST
    M = inv[:, :, None] * rot.reshape(-1, 3, 3).transpose(0, 2, 1)
    S = jnp.einsum("nki,nkj->nij", M, M, precision=hp)        # [N, 3, 3]
    mu = mean - center[None]
    q = jnp.einsum("nij,nj->ni", S, mu, precision=hp)         # S mu'
    c = jnp.sum(mu * q, axis=-1, keepdims=True)               # mu'^T S mu'

    sdiag = jnp.stack([S[:, 0, 0], S[:, 1, 1], S[:, 2, 2]], axis=1)
    soff = jnp.stack([S[:, 0, 1], S[:, 0, 2], S[:, 1, 2]], axis=1)
    w_dd = jnp.concatenate([sdiag, 2.0 * soff], axis=1)       # 6
    w_od = jnp.concatenate([sdiag, soff], axis=1)             # 6
    m_nd = jnp.einsum("nki,nk->ni", M, nrm, precision=hp)     # M^T nrm

    quad = jnp.concatenate(
        [w_dd, w_od, -q, w_dd, -2.0 * q, c, m_nd], axis=1)    # [N, 28]
    tq = jnp.concatenate(
        [gpack.T, quad,
         jnp.zeros((gpack.shape[1], QLANES - 32 - quad.shape[1]),
                   gpack.dtype)], axis=1)
    return tq, center


def _ray_features(rays_ref, scalar_ref):
    """[8, R] ray block -> [_F_ROWS, R] quadric feature rows (o' centered
    on scalar_ref[10:13])."""
    R = rays_ref.shape[1]
    o = [rays_ref[i, :][None, :] - scalar_ref[10 + i] for i in range(3)]
    d = [rays_ref[3 + i, :][None, :] for i in range(3)]
    rows = [
        d[0] * d[0], d[1] * d[1], d[2] * d[2],
        d[0] * d[1], d[0] * d[2], d[1] * d[2],
        o[0] * d[0], o[1] * d[1], o[2] * d[2],
        o[0] * d[1] + o[1] * d[0],
        o[0] * d[2] + o[2] * d[0],
        o[1] * d[2] + o[2] * d[1],
        d[0], d[1], d[2],
        o[0] * o[0], o[1] * o[1], o[2] * o[2],
        o[0] * o[1], o[0] * o[2], o[1] * o[2],
        o[0], o[1], o[2],
        jnp.ones((1, R), jnp.float32),
    ]
    rows.append(jnp.zeros((_F_ROWS - len(rows), R), jnp.float32))
    return jnp.concatenate(rows, axis=0)


def _qdot(g, a, b, feat):
    """[C, b-a] weight slice x [b-a, R] feature slice -> [C, R], f32-exact."""
    return jax.lax.dot_general(
        g[:, a:b], feat,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )


def _pair_math_q(scalar_ref, rays_ref, feat, g, *, exp_power: float,
                 window_mode: int = 0, secondary_static: int = -1):
    """Quadric twin of _pair_math_t: (t, alpha, valid, gvalid) [C, R]
    planes from four MXU dots + ~45 VPU ops/pair."""
    near = scalar_ref[0]
    far = scalar_ref[1]
    secondary = scalar_ref[3]
    bf_max_dist = scalar_ref[4]
    bf_thr = scalar_ref[5]

    dot_ll = _qdot(g, QCOL_DD, QCOL_DD + 6, feat[_F_DD:_F_DD + 6])
    dot_ol = _qdot(g, QCOL_OD, QCOL_OD + 9, feat[_F_OD:_F_OD + 9])
    dot_oo = _qdot(g, QCOL_OO, QCOL_OO + 10, feat[_F_OO:_F_OO + 10])

    opacity = g[:, ROW_OPACITY][:, None]
    sf2 = g[:, ROW_SF2][:, None]
    gvalid = g[:, ROW_VALID][:, None]

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
        ndotd = _qdot(g, QCOL_ND, QCOL_ND + 3, feat[_F_D:_F_D + 3])
        nlen = g[:, ROW_NLEN][:, None]
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


def _render_kernel_v7(
    cand_ref, scalar_ref, rays_ref, tq_ref,
    out_ref,
    attr_acc, misc_acc, feat_ref,
    *, cluster: int, exp_power: float, check_every: int,
    window_mode: int = 0, secondary_static: int = -1, stats: bool = True,
    attr_precision=jax.lax.Precision.HIGHEST, debug_mode: int = 0,
):
    """v6's drain-free streaming scan composite (product space, round 5)
    with quadric pair math.

    `debug_mode` (benchmark-only, tools/bench_v7_attr.py - the v4
    attribution precedent): 1 = pair math only (scan/attr-dot compiled
    out, alpha folded into the depth row so nothing is DCE'd), 2 = pair
    math + prefix scan (attr dot compiled out).  Run with a tiny
    transmittance threshold so every mode traverses every chunk."""
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
    feat_ref[:] = _ray_features(rays_ref, scalar_ref)

    dead_all = jnp.all(rays_ref[6, :] <= 0.0)
    row = jax.lax.broadcasted_iota(jnp.int32, (C, R), 0)

    def compute_chunk(ci):
        c = cand_ref[ti, ci] & jnp.int32(0xFFFF)
        off = pl.multiple_of(c * C, C)
        g = tq_ref[pl.ds(off, C), :]
        tt, alpha, valid, gvalid = _pair_math_q(
            scalar_ref, rays_ref, feat_ref[:], g, exp_power=exp_power,
            window_mode=window_mode, secondary_static=secondary_static)
        oma = jnp.where(valid, 1.0 - alpha, 1.0)

        if debug_mode == 1:  # pair math only
            misc_acc[_M_DEPTH:_M_DEPTH + 1, :] += jnp.sum(
                oma * tt, axis=0, keepdims=True)
            return

        # exclusive prefix product over sublanes (see render_kernel_v6)
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

        if debug_mode == 2:  # pair math + scan, no attr dot / bookkeeping
            misc_acc[_M_DEPTH:_M_DEPTH + 1, :] += jnp.sum(
                w * tt, axis=0, keepdims=True)
            misc_acc[_M_COMP:_M_COMP + 1, :] = jnp.min(
                jnp.where(cmask, t_before * oma, tc), axis=0, keepdims=True)
            return

        attr_acc[:] += jax.lax.dot_general(
            g[:, GROW0:GROW0 + TABLE_A], w,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=attr_precision,
        )                                                        # [16, R]
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
        empty = (cand_ref[ti, base] & jnp.int32(-65536)) >= 0x7F000000
        done = jnp.all(saturated) | dead_all | empty

        @pl.when(~done)
        def _group():
            for j in range(CE):
                compute_chunk(base + j)

        return (g + 1, done)

    jax.lax.while_loop(cond, body, (jnp.int32(0), dead_all))

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
                     "stats", "attr_precision", "debug_mode"),
)
def pallas_render_culled_v7(
    rays_o, rays_d, gpack, candidates, cand_near, num, near, far,
    exp_power, secondary, backfacing_max_dist,
    backfacing_invalid_normal_threshold,
    transmittance_threshold=0.01, eps_forward_normalization=1e-12,
    max_hits: int = 16, cluster: int = 64, tile: int = 128,
    interpret: bool = False, alive=None, check_every: int = 8,
    t_split=None, window_mode: int = 0, secondary_static: int = -1,
    tpack=None, stats: bool = True, attr_precision: str = "highest",
    debug_mode: int = 0,
):
    """Quadric-MXU streaming scan trace.  Same contract as
    pallas_render_culled_v6 - returns [R, OUT_LANES] f32.

    `tpack` optionally supplies the (tq [N+cluster, 128], center [3]) pair
    prepared once per frame (prepare_scan_pack) so callers inside
    lax.map/scan don't re-run the O(N) HIGHEST-precision quadric repack
    per iteration."""
    del max_hits
    R = rays_o.shape[0]
    N = gpack.shape[1]
    assert N % cluster == 0 and R % tile == 0
    n_tiles = R // tile

    if tpack is None:
        tq, center = pack_quadric_lanes(
            jnp.pad(gpack, ((0, 0), (0, cluster))))
    else:
        tq, center = tpack
    assert tq.shape == (N + cluster, QLANES), (tq.shape, N, cluster)
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
    scalars = jnp.concatenate([jnp.stack([
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
    ]), center.astype(jnp.float32)])

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((8, tile), lambda ti, cand: (0, ti),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((N + cluster, QLANES),
                         lambda ti, cand: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((OUT_LANES, tile),
                               lambda ti, cand: (0, ti),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((TABLE_A, tile), jnp.float32),
            pltpu.VMEM((_M_ROWS, tile), jnp.float32),
            pltpu.VMEM((_F_ROWS, tile), jnp.float32),
        ],
    )
    out_t = pl.pallas_call(
        partial(_render_kernel_v7, cluster=cluster,
                exp_power=float(exp_power), check_every=check_every,
                window_mode=window_mode,
                secondary_static=secondary_static, stats=stats,
                debug_mode=debug_mode,
                # Mosaic's dot lowering supports DEFAULT and HIGHEST only
                # (Precision.HIGH raises NotImplementedError, measured r5)
                attr_precision=(jax.lax.Precision.DEFAULT
                                if attr_precision == "bf16"
                                else jax.lax.Precision.HIGHEST)),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((OUT_LANES, R), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024),
        interpret=interpret,
    )(candidates, scalars, rays_t, tq)
    return out_t.T
