"""Pallas gradient-scatter kernel: the TPU answer to atomicAdd.

The reference flushes per-hit gradients into per-Gaussian buffers with
`atomicAddX` (backward_pass.cu:209-220).  Round 1/2 replaced that with an
XLA scatter-add (`render_grads.scatter_grads`), which costs 90-120 ms per
65k-ray tile per bounce on v5e.  This kernel restates the scatter as MXU
matmuls against one-hot matrices, with the whole [32, N] gradient
accumulator VMEM-RESIDENT across grid steps (the same constant-index-map
residency trick as the v4 render kernels, applied to an *output*).

MEASURED OUTCOME (round 3, v5e): at training scale (768px / 175k Gaussians
/ max_clusters=192 / K=32) the full train step runs 12.0 s/iter through
this kernel vs 7.35 s/iter through the XLA scatter-add, because the one-hot
dot's FLOPs scale with the TARGET LANE WIDTH (max_clusters x cluster per
tile) regardless of how few hits land there - ~48x redundancy over the
useful work at that config.  The train path therefore keeps the XLA
scatter by default (raytracer.render_tile_with_grads_fused
use_mxu_scatter=False); the kernel remains correct (exactness tests below)
and is the right shape only when max_clusters is small.

Kernel structure:

  * grid is 1-D over 256-ray tiles; each tile's hits come only from its
    <=MC candidate clusters (the same `select_candidates` lists the slots
    kernel consumed), so the scatter targets are cluster-structured;
  * the payload rides TRANSPOSED as [32, R*K]: 22 gradient columns
    (mean/scale/rotation/opacity/rgb/normal/f0/roughness/total_weight) plus
    the global Gaussian id as row 22, zero-padded to 32 sublanes;
  * per group of 4 candidate clusters, 4 cluster-masked copies of the
    payload block are stacked along sublanes into [128, HT] scratch, and a
    single lane-contracting dot against the (per-tile, built once) id%128
    one-hot [128, HT] produces a [128, 128] result whose 32-row bands are
    the 4 clusters' gradient blocks - full MXU sublane utilization (a
    per-cluster [32, HT] dot would run the MXU at 25%);
  * each band accumulates into the resident [32, N] buffer at the
    cluster's 128-aligned lane offset.

Determinism: grid steps execute sequentially on a TPU core, so read-modify-
writes of the resident accumulator never race (the reference's float-atomic
ordering nondeterminism does not exist here).

Empty slots carry id 0 with an all-zero payload column (backward_step masks
them), so they contribute exact zeros to Gaussian 0; dummy candidate
clusters (id N/cluster) mask to all-zero payloads and write zeros into the
[N, N+cluster) padding lanes, which the caller slices off.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# payload rows: the 22 scatter columns of render_grads._SCATTER_FIELDS in
# order, then the global id row, then zero padding to a full 32-sublane tile
A_COLS = 22
ROW_ID = 22
A_PAD = 32
STACK = 4                    # clusters scattered per MXU dot


def _scatter_kernel(cand_ref, payload_ref, grads_ref, stack_ref,
                    *, cluster: int, mc: int):
    ti = pl.program_id(0)

    @pl.when(ti == 0)
    def _init():
        grads_ref[:] = jnp.zeros_like(grads_ref)

    ht = payload_ref.shape[1]
    ids = payload_ref[ROW_ID:ROW_ID + 1, :]              # [1, HT] f32
    idd = jnp.floor(ids * (1.0 / cluster))               # cluster of each hit
    idm = ids - idd * cluster                            # lane within cluster
    sub = jax.lax.broadcasted_iota(jnp.int32, (cluster, ht), 0)
    mod_oh = (jnp.broadcast_to(idm, (cluster, ht))
              == sub.astype(jnp.float32)).astype(jnp.float32)
    payload = payload_ref[:]                             # [A_PAD, HT]

    for base in range(0, mc, STACK):
        for q in range(STACK):
            c = cand_ref[ti, base + q]
            maskq = (idd == jax.lax.convert_element_type(c, jnp.float32))
            stack_ref[q * A_PAD:(q + 1) * A_PAD, :] = (
                payload * jnp.broadcast_to(maskq, (A_PAD, ht)))
        # HIGHEST: default MXU passes bf16-round the payload operand; these
        # are gradients, which must match the XLA scatter-add to f32 ulps
        out = jax.lax.dot_general(
            stack_ref[:], mod_oh, (((1,), (1,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32)          # [STACK*A_PAD, 128]
        for q in range(STACK):
            c = cand_ref[ti, base + q]
            off = pl.ds(c * cluster, cluster)
            grads_ref[:, off] += out[q * A_PAD:(q + 1) * A_PAD, :]


@partial(jax.jit, static_argnames=("n_capacity", "cluster", "tile",
                                   "interpret"))
def pallas_scatter_grads_t(payload_t, candidates, n_capacity: int,
                           cluster: int = 128, tile: int = 256,
                           interpret: bool = False):
    """Cluster-structured scatter-add of per-hit gradients.

    payload_t: [A_PAD, R*K] f32 - rows 0..21 gradient columns, row 22 the
        global Gaussian id of each hit (0 with zero payload for empty
        slots), rows 23..31 zero.
    candidates: [T, MC] int32 - per-ray-tile candidate cluster lists as fed
        to the trace kernel (dummy = n_capacity//cluster), T = R//tile.
    Returns [A_PAD, n_capacity] f32 partial gradient buffers (the caller
    transposes rows back into ParamGrads fields).
    """
    n_tiles = candidates.shape[0]
    rk = payload_t.shape[1]
    assert payload_t.shape[0] == A_PAD
    assert rk % n_tiles == 0
    ht = rk // n_tiles
    dummy = jnp.int32(n_capacity // cluster)
    mc0 = candidates.shape[1]
    mc = ((mc0 + STACK - 1) // STACK) * STACK
    if mc != mc0:
        candidates = jnp.pad(candidates, ((0, 0), (0, mc - mc0)),
                             constant_values=-1)
    candidates = jnp.where(candidates < 0, dummy, candidates)
    n_pad = n_capacity + cluster                         # dummy-cluster lanes

    out = pl.pallas_call(
        partial(_scatter_kernel, cluster=cluster, mc=mc),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n_tiles,),
            in_specs=[
                pl.BlockSpec((A_PAD, ht), lambda ti, cand: (0, ti),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((A_PAD, n_pad), lambda ti, cand: (0, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((STACK * A_PAD, ht), jnp.float32),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((A_PAD, n_pad), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024),
        interpret=interpret,
    )(candidates, payload_t)
    return out[:, :n_capacity]


def scatter_fits(n_capacity: int, cluster: int = 128) -> bool:
    """Resident [A_PAD, N] accumulator + stacked scratch must fit VMEM."""
    return (n_capacity + cluster) * A_PAD * 4 <= 64 * 1024 * 1024


def pack_scatter_payload(per_hit: dict, ids) -> jnp.ndarray:
    """[R, K] per-hit grad dict -> [A_PAD, R*K] transposed payload."""
    from ..render_grads import _SCATTER_FIELDS

    cols = []
    for name, n in _SCATTER_FIELDS:
        v = per_hit[name]
        cols.append(v.reshape(-1, n) if v.ndim == 3 else v.reshape(-1, 1))
    cols.append(ids.reshape(-1, 1).astype(jnp.float32))
    payload = jnp.concatenate(cols, axis=1)              # [R*K, 23]
    payload = jnp.pad(payload, ((0, 0), (0, A_PAD - payload.shape[1])))
    return payload.T


def scatter_grads_pallas_multi(per_hit_list, ids_list, cands_list,
                               n_capacity: int, cluster: int = 128,
                               tile: int = 256, interpret: bool = False):
    """Scatter SEVERAL bounces' per-hit grads in ONE kernel launch.

    Payload columns concatenate along the hit axis and candidate lists along
    the tile axis, so the grid is (num_steps * T,) and the resident [32, N]
    accumulator is initialised/flushed once per train step instead of once
    per bounce.  Exactly sums the per-step `scatter_grads` results."""
    from ..render_grads import _SCATTER_FIELDS, ParamGrads

    payload_t = jnp.concatenate(
        [pack_scatter_payload(ph, ids)
         for ph, ids in zip(per_hit_list, ids_list)], axis=1)
    candidates = jnp.concatenate(list(cands_list), axis=0)
    out = pallas_scatter_grads_t(payload_t, candidates, n_capacity,
                                 cluster=cluster, tile=tile,
                                 interpret=interpret)
    pieces = {}
    off = 0
    for name, n in _SCATTER_FIELDS:
        pieces[name] = out[off:off + n].T if n > 1 else out[off]
        off += n
    return ParamGrads(**pieces)


def scatter_grads_pallas(per_hit: dict, ids, candidates, n_capacity: int,
                         cluster: int = 128, tile: int = 256,
                         interpret: bool = False):
    """Drop-in twin of render_grads.scatter_grads for the culled fused path
    (same ParamGrads result, MXU scatter instead of XLA scatter-add)."""
    from ..render_grads import _SCATTER_FIELDS, ParamGrads

    payload_t = pack_scatter_payload(per_hit, ids)
    out = pallas_scatter_grads_t(payload_t, candidates, n_capacity,
                                 cluster=cluster, tile=tile,
                                 interpret=interpret)
    pieces = {}
    off = 0
    for name, n in _SCATTER_FIELDS:
        pieces[name] = out[off:off + n].T if n > 1 else out[off]
        off += n
    return ParamGrads(**pieces)
