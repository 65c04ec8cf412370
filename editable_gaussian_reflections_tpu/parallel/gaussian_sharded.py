"""Gaussian-axis sharding: render scenes too large to replicate.

For multi-million-Gaussian scenes (the BASELINE.json 5M stretch config) the
parameter pytree is sharded along N across the mesh axis "gauss".  Every
device traces ALL of its rays against ITS Gaussian shard only, producing a
per-shard K-nearest hit list and a per-shard partial log-transmittance; the
cross-shard merge is then exact:

  * top-K merge: the global K nearest hits are contained in the union of the
    per-shard K nearest, so an all_gather of the [R, K] slot lists followed
    by a K-selection over [R, S*K] reproduces the single-device result bit
    for bit;
  * total transmittance: log full_T is a psum over shards (the product of
    per-shard transmittances - the associative structure noted in
    SURVEY.md section 5.7: (c1,T1) + (c2,T2) = (c1 + T1 c2, T1 T2)).

This composes with ray sharding as a 2D mesh (rays x gauss): rays shard along
one axis, the hit-list all_gather rides the other.  Compositing and shading
then run on the merged per-ray lists exactly as in the replicated path.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..ops.trace import RayHits, gather_frames, intersect_gathered, trace_rays
from ..scene.gaussian_scene import GaussianScene, build_frames


def shard_scene(scene: GaussianScene, n_shards: int) -> GaussianScene:
    """Pad capacity to a multiple of n_shards (shards stay chunk-aligned)."""
    from ..scene.gaussian_scene import pad_to, round_up
    cap = round_up(scene.capacity, n_shards * 2048)
    return pad_to(scene, cap)


def gaussian_sharded_trace(
    mesh: Mesh,
    scene: GaussianScene,
    rays_o,                 # [R, 3] replicated
    rays_d,                 # [R, 3] replicated
    exp_power,
    near, far,
    alpha_threshold=0.005,
    max_hits: int = 32,
    chunk: int = 2048,
    axis: str = "gauss",
) -> RayHits:
    """Trace with Gaussians sharded over `axis`; returns replicated RayHits
    identical to the single-device trace."""
    n_shards = mesh.shape[axis]
    n = scene.capacity
    assert n % (n_shards * chunk) == 0, (n, n_shards, chunk)

    scene_specs = GaussianScene(
        xyz=P(axis), scaling=P(axis), rotation=P(axis), opacity=P(axis),
        diffuse=P(axis), normal=P(axis), f0=P(axis), roughness=P(axis),
        live_mask=P(axis),
    )

    @partial(
        jax.shard_map, mesh=mesh,
        in_specs=(scene_specs, P(), P()),
        out_specs=(P(None, axis), P(None, axis), P(axis)),
        check_vma=False,
    )
    def shard_trace(scene_s, o, d):
        frames, _ = build_frames(scene_s, alpha_threshold, exp_power)
        shard = jax.lax.axis_index(axis)
        hits = trace_rays(o, d, frames, exp_power, near, far,
                          max_hits=max_hits, chunk=chunk)
        offset = shard * (n // n_shards)
        ids = jnp.where(hits.valid, hits.ids + offset, -1)
        t = jnp.where(hits.valid, hits.t, jnp.inf)
        logT = jnp.log(jnp.maximum(hits.full_T, 1e-37))
        # out axis concatenation along a new shard dim handled by out_specs
        return t, ids.astype(jnp.int32), logT[None]

    t_all, id_all, logT_sh = shard_trace(scene, rays_o, rays_d)
    # t_all/id_all: [R, S*K] (K slots per shard concatenated along axis)
    log_full_T = jnp.sum(logT_sh, axis=0)

    order = jnp.argsort(t_all, axis=-1)[:, :max_hits]
    t_sorted = jnp.take_along_axis(t_all, order, axis=-1)
    ids = jnp.take_along_axis(id_all, order, axis=-1)
    valid = jnp.isfinite(t_sorted)
    ids = jnp.where(valid, ids, 0)

    frames_full, _ = build_frames(scene, alpha_threshold, exp_power)
    frames_g = gather_frames(frames_full, ids)
    alpha, gaussval, local_hit, _ = intersect_gathered(
        rays_o, rays_d, frames_g, exp_power
    )
    alpha = jnp.where(valid, alpha, 0.0)
    return RayHits(
        ids=ids,
        t=jnp.where(valid, t_sorted, 0.0),
        alpha=alpha,
        gaussval=gaussval,
        local_hit=local_hit,
        valid=valid,
        full_T=jnp.exp(log_full_T),
        num_traversed=jnp.zeros(rays_o.shape[0], jnp.int32),
    )
