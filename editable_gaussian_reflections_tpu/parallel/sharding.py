"""Multi-chip sharding: ray-parallel rendering/training over a device mesh.

The reference is single-GPU/single-process (SURVEY.md section 2.8); here scaling is
TPU-native from the start:

  * rays (pixels) shard across the mesh axis "rays" - embarrassingly parallel
    tracing/compositing, the analog of the reference's one-thread-per-pixel
    intra-kernel parallelism, lifted to whole chips;
  * Gaussian parameters are replicated (a few-hundred-k x ~30 floats fits in
    HBM everywhere), so the ONLY collective is the gradient psum over ICI -
    identical in shape to the parameter pytree, exactly the DP recipe from
    the scaling playbook;
  * the Adam update then runs replicated on every device (no broadcast
    needed).

`sharded_train_step` is numerically equivalent to `training.train_step` (same
jitter keys, same per-tile RNG stream, same Adam algebra via the shared
`apply_updates`) up to the float summation order of the gradient psum; the
equivalence is asserted by tests/test_sharding.py and by
__graft_entry__.dryrun_multichip.  The fast path (Pallas culled tracer) is
plumbed through the same `use_pallas`/`use_culling` knobs as train_step.

Gaussian-axis sharding for multi-million-Gaussian scenes composes on top via
the associative over-merge (c1,T1)+(c2,T2) = (c1+T1*c2, T1*T2) - see
parallel/gaussian_sharded.py.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..renderer.raytracer import (
    CameraParams,
    RayTargets,
    RenderSettings,
    render_tile,
)
from ..training import (
    TrainState,
    apply_updates,
    grads_over_tiles,
    prepare_render_inputs,
    prepare_rays,
)


def make_mesh(n_devices: int | None = None, axis: str = "rays") -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(np.array(devs[:n]), (axis,))


@partial(
    jax.jit,
    static_argnames=("mesh", "width", "height", "num_bounces", "max_hits",
                     "chunk", "tile", "jitter", "use_pallas",
                     "exp_power_static", "use_culling", "cull_tile",
                     "cull_cluster", "max_clusters", "interpret",
                     "split_far", "mc_far", "max_hits_far",
                     "split_radius_scale"),
)
def sharded_train_step(
    mesh: Mesh,
    state: TrainState,
    camera: CameraParams,
    targets: RayTargets,
    settings: RenderSettings,
    lrs: dict,
    hyper: dict,
    key,
    width: int,
    height: int,
    num_bounces: int = 2,
    max_hits: int = 32,
    chunk: int = 2048,
    tile: int | None = None,
    jitter: bool = True,
    use_pallas: bool = False,
    exp_power_static: float = 3.0,
    use_culling: bool = False,
    cull_tile: int = 256,
    cull_cluster: int = 256,
    max_clusters: int = 192,
    interpret: bool = False,
    split_far: bool = False,
    mc_far: int = 32,
    max_hits_far: int = 0,
    split_radius_scale: float = 1.5,
):
    """One DP training step over the mesh. Rays sharded, params replicated,
    grads psum'd; returns (new TrainState, metrics) replicated.

    With `tile` equal to train_step's tile (default: one tile per shard) the
    result matches train_step to within psum summation order."""
    n_shards = mesh.devices.size
    scene = state.scene
    R = width * height
    assert R % n_shards == 0, (
        f"H*W={R} must divide by mesh size {n_shards}"
    )
    shard_R = R // n_shards
    tile_sz = min(tile or shard_R, shard_R)
    assert shard_R % tile_sz == 0, (shard_R, tile_sz)
    tiles_per_shard = shard_R // tile_sz

    cull_tile = min(cull_tile, 256)
    frames, attrs, gpack, culling, scene_for_bwd, gauss_perm = (
        prepare_render_inputs(
            scene, settings, use_pallas, use_culling and use_pallas,
            cull_tile, cull_cluster, max_clusters,
            split_far=split_far, mc_far=mc_far, max_hits_far=max_hits_far,
            split_radius_scale=split_radius_scale,
        )
    )
    key_jit, key_b = jax.random.split(key)
    dirs, ray_perm, _ray_inv = prepare_rays(
        width, height, camera, key_jit, jitter, cull_tile,
        culling is not None,
    )
    if ray_perm is not None:
        targets = jax.tree_util.tree_map(lambda a: a[ray_perm], targets)

    if culling is not None:
        cull_rep = (culling["bounds"], culling["table"], culling["ftable"])
    else:
        cull_rep = None
    replicated = (frames, attrs, gpack, cull_rep, scene_for_bwd)

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(), P("rays"), P("rays"), P()),
        out_specs=(P(), P()),
        check_vma=False,  # scan carries inside trace_rays are unvarying inits
    )
    def grads_shard(rep, dirs_s, targets_s, key_b):
        frames, attrs, gpack, cull_rep, scene_for_bwd = rep
        # rebuild with the STATIC ints (shard_map args turn ints into tracers)
        culling = None if cull_rep is None else dict(
            bounds=cull_rep[0], cull_tile=cull_tile, cluster=cull_cluster,
            mc=max_clusters, table=cull_rep[1], ftable=cull_rep[2],
            split_far=split_far, mc_far=mc_far, max_hits_far=max_hits_far,
            split_radius_scale=split_radius_scale,
        )
        idx = jax.lax.axis_index("rays")
        dirs_t = dirs_s.reshape(tiles_per_shard, tile_sz, 3)
        targets_t = jax.tree_util.tree_map(
            lambda a: a.reshape((tiles_per_shard, tile_sz) + a.shape[1:]),
            targets_s,
        )
        origins = jnp.broadcast_to(camera.origin, (tile_sz, 3))
        grads, l1 = grads_over_tiles(
            origins, dirs_t, targets_t, frames, attrs, scene_for_bwd,
            settings, camera, key_b, idx * tiles_per_shard,
            num_bounces, max_hits, chunk,
            use_pallas, exp_power_static, gpack, culling, interpret,
        )
        grads = jax.tree_util.tree_map(
            lambda g: jax.lax.psum(g, "rays"), grads
        )
        l1 = jax.lax.psum(l1, "rays")
        return grads, l1

    grads, l1 = grads_shard(replicated, dirs, targets, key_b)
    if gauss_perm is not None:
        inv = jnp.argsort(gauss_perm)
        grads = jax.tree_util.tree_map(lambda g: g[inv], grads)

    new_state = apply_updates(state, grads, lrs, hyper)
    return new_state, dict(l1_diffuse=l1 / R)


@partial(
    jax.jit,
    static_argnames=("mesh", "width", "height", "num_bounces", "max_hits",
                     "chunk", "jitter", "use_pallas", "exp_power_static",
                     "use_culling", "cull_tile", "cull_cluster",
                     "max_clusters", "interpret"),
)
def sharded_render(
    mesh: Mesh,
    scene,
    camera: CameraParams,
    settings: RenderSettings,
    key,
    width: int,
    height: int,
    num_bounces: int = 2,
    max_hits: int = 32,
    chunk: int = 2048,
    jitter: bool = False,
    use_pallas: bool = False,
    exp_power_static: float = 3.0,
    use_culling: bool = False,
    cull_tile: int = 256,
    cull_cluster: int = 256,
    max_clusters: int = 192,
    interpret: bool = False,
):
    """Forward render with rays sharded over the mesh; returns final [R,3].

    Runs the SAME fast path as render_frame (Pallas culled tracer) on each
    shard - the multi-chip rendering mode for the v5p-8 throughput target."""
    n_shards = mesh.devices.size
    R = width * height
    assert R % n_shards == 0

    cull_tile = min(cull_tile, 256)
    frames, attrs, gpack, culling, _scene_bwd, _perm = prepare_render_inputs(
        scene, settings, use_pallas, use_culling and use_pallas,
        cull_tile, cull_cluster, max_clusters,
    )
    key_jit, key_b = jax.random.split(key)
    dirs, _ray_perm, ray_inv = prepare_rays(
        width, height, camera, key_jit, jitter, cull_tile,
        culling is not None,
    )
    bounds = culling["bounds"] if culling is not None else None
    replicated = (frames, attrs, gpack, bounds)

    @partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P(), P("rays"), P()),
        out_specs=P("rays"),
        check_vma=False,
    )
    def fwd(rep, dirs_s, key_b):
        frames, attrs, gpack, bounds = rep
        culling = None if bounds is None else dict(
            bounds=bounds, cull_tile=cull_tile, cluster=cull_cluster,
            mc=max_clusters,
        )
        idx = jax.lax.axis_index("rays")
        k = jax.random.fold_in(key_b, idx)
        origins = jnp.broadcast_to(camera.origin, (dirs_s.shape[0], 3))
        _, final, _ = render_tile(
            origins, dirs_s, frames, attrs, settings,
            camera.znear, camera.zfar, k, num_bounces, max_hits, chunk,
            use_pallas=use_pallas, exp_power_static=exp_power_static,
            gpack=gpack, culling=culling, interpret=interpret,
        )
        return final

    final = fwd(replicated, dirs, key_b)
    if ray_inv is not None:
        final = final[ray_inv]
    return final


@partial(
    jax.jit,
    static_argnames=("mesh", "width", "height", "num_bounces", "max_hits",
                     "jitter", "exp_power_static", "cull_cluster",
                     "max_clusters", "rays_per_call", "interpret",
                     "max_clusters_secondary", "cull_tile_secondary",
                     "cull_tile_primary", "split_far", "mc_far",
                     "split_radius_scale", "max_hits_far", "composite_mode"),
)
def sharded_render_fused(
    mesh: Mesh,
    scene,
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
):
    """render_frame_fused's per-bounce fused-kernel path with rays sharded
    over the mesh - the multi-chip rendering mode behind the v5p-8
    throughput target (BASELINE.json), including the split-far two-pass.

    Scene prep (Morton sort, cluster bounds, gpack, split sphere) and the
    per-step GGX uniforms are computed replicated, exactly as in
    render_frame_fused; rays + uniforms then shard over "rays" and each
    device runs the SAME bounce core shard-locally.  Re-sorts/culling
    become shard-local, which only changes which tile a ray shares its
    candidate list with (conservative per ray) - with honest budgets the
    output is identical to single-device (tests/test_sharding_fused.py).

    Returns (StepOutputs [S, R, ...], final [R, 3]) in linear pixel order."""
    from ..renderer.raytracer import (
        _fused_bounce_core,
        _prepare_fused_frame,
    )

    n_shards = mesh.devices.size
    num_steps = num_bounces + 1
    prep = _prepare_fused_frame(
        scene, camera, settings, key, width, height, jitter=jitter,
        cull_cluster=cull_cluster, cull_tile_primary=cull_tile_primary,
        num_steps=num_steps, split_far=split_far,
        split_radius_scale=split_radius_scale,
        composite_mode=composite_mode,
    )
    R, ray_inv = prep["R"], prep["ray_inv"]
    tile_max = max(cull_tile_primary, cull_tile_secondary)
    R_s = R // n_shards
    assert R % n_shards == 0 and R_s % tile_max == 0, (
        f"H*W={R} must split into {n_shards} shards of whole "
        f"{tile_max}-ray culling tiles")
    rays_per_call = min(rays_per_call, R_s)
    assert R_s % rays_per_call == 0, (R_s, rays_per_call)

    rep = (prep["gpack"], prep["bounds"], prep["scene_lo"],
           prep["scene_hi"], prep["split_c"], prep["r_split"],
           prep["scan_pack"])

    @partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P(), P("rays"), P("rays"), P(None, "rays")),
        out_specs=(P(None, "rays"), P("rays")),
        check_vma=False,
    )
    def fwd(rep, ro_s, rd_s, us_s):
        (gpack, bounds, scene_lo, scene_hi, split_c, r_split,
         scan_pack) = rep
        return _fused_bounce_core(
            ro_s, rd_s, us_s, gpack, bounds, scene_lo, scene_hi,
            split_c, r_split, settings, camera.znear, camera.zfar,
            capacity=scene.capacity, num_bounces=num_bounces,
            max_hits=max_hits, exp_power_static=exp_power_static,
            cull_cluster=cull_cluster, max_clusters=max_clusters,
            rays_per_call=rays_per_call, interpret=interpret,
            max_clusters_secondary=max_clusters_secondary,
            cull_tile_secondary=cull_tile_secondary,
            cull_tile_primary=cull_tile_primary, split_far=split_far,
            mc_far=mc_far, max_hits_far=max_hits_far,
            composite_mode=composite_mode, scan_pack=scan_pack,
        )

    stacked, final = fwd(rep, prep["rays_o"], prep["dirs"], prep["us"])
    stacked = jax.tree_util.tree_map(lambda a: a[:, ray_inv], stacked)
    return stacked, final[ray_inv]
