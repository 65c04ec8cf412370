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

from ..ops.render_grads import zero_grads
from ..renderer.raytracer import (
    CameraParams,
    RayTargets,
    RenderSettings,
    render_tile,
    render_tile_with_grads,
)
from ..ops.camera_rays import primary_ray_directions
from ..scene.gaussian_scene import build_frames
from ..training import PARAM_FIELDS, TrainState, grads_to_param_tree


def make_mesh(n_devices: int | None = None, axis: str = "rays") -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(np.array(devs[:n]), (axis,))


def _pad_rays(R: int, n_shards: int) -> int:
    return ((R + n_shards - 1) // n_shards) * n_shards


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
):
    """One DP training step over the mesh. Rays sharded, params replicated,
    grads psum'd; returns (new TrainState, metrics) replicated."""
    n_shards = mesh.devices.size
    scene = state.scene
    R = width * height
    Rp = _pad_rays(R, n_shards)

    dirs = np.asarray(
        primary_ray_directions(width, height, camera.fov_y, camera.c2w)
    ).reshape(-1, 3)
    ray_live = np.zeros(Rp, np.float32)
    ray_live[:R] = 1.0
    if Rp > R:
        dirs = np.concatenate([dirs, np.zeros((Rp - R, 3), np.float32)])
        dirs[R:, 2] = 1.0  # degenerate but well-formed rays
        targets = jax.tree_util.tree_map(
            lambda a: jnp.concatenate(
                [a, jnp.zeros((Rp - R,) + a.shape[1:], a.dtype)]
            ),
            targets,
        )
    dirs = jnp.asarray(dirs)
    ray_live = jnp.asarray(ray_live)

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(), P("rays"), P("rays"), P("rays"), P()),
        out_specs=(P(), P()),
        check_vma=False,  # scan carries inside trace_rays are unvarying inits
    )
    def grads_shard(scene_rep, dirs_s, targets_s, live_s, key_rep):
        frames, attrs = build_frames(
            scene_rep, settings.alpha_threshold, settings.exp_power,
            settings.global_scale_factor,
        )
        idx = jax.lax.axis_index("rays")
        k = jax.random.fold_in(key_rep, idx)
        origins = jnp.broadcast_to(camera.origin, (dirs_s.shape[0], 3))
        steps, final, grads = render_tile_with_grads(
            origins, dirs_s, frames, attrs, scene_rep, targets_s,
            settings, camera.znear, camera.zfar, k,
            num_bounces, max_hits, chunk,
        )
        # dead pad rays: hit nothing is not guaranteed, so mask via live_s
        l1 = jnp.sum(
            jnp.abs(steps.rgb[0] - targets_s.diffuse).mean(-1) * live_s
        )
        # mask pad-ray gradients: weight=0 because targets are 0? No - mask
        # explicitly through the upstream dL in future; pad rays are so few
        # (< n_shards) that we instead zero their contribution by replaying
        # with live mask applied to grads is complex - assert divisibility.
        grads = jax.tree_util.tree_map(
            lambda g: jax.lax.psum(g, "rays"), grads
        )
        l1 = jax.lax.psum(l1, "rays")
        return grads, l1

    assert R % n_shards == 0, (
        f"H*W={R} must divide by mesh size {n_shards} (pad rays upstream)"
    )

    grads, l1 = grads_shard(scene, dirs, targets, ray_live, key)

    # * replicated scale decay + Adam + clamps (same algebra as train_step)
    live = scene.live_mask
    scene = scene._replace(
        scaling=jnp.where(
            live[:, None], scene.scaling + jnp.log(hyper["scale_decay"]),
            scene.scaling,
        )
    )
    g_tree = grads_to_param_tree(grads, scene)
    b1, b2 = hyper["beta_1"], hyper["beta_2"]
    eps = 1e-15
    count = state.count + 1
    c1 = 1.0 - b1 ** count.astype(jnp.float32)
    c2 = 1.0 - b2 ** count.astype(jnp.float32)
    new_params, new_mu, new_nu = {}, {}, {}
    for f in PARAM_FIELDS:
        p = getattr(scene, f)
        g = g_tree[f].reshape(p.shape) * hyper["apply_grads"]
        m = b1 * getattr(state.mu, f) + (1.0 - b1) * g
        v = b2 * getattr(state.nu, f) + (1.0 - b2) * g * g
        update = (m / c1) / (jnp.sqrt(v / c2) + eps)
        mask = live.reshape((-1,) + (1,) * (p.ndim - 1)).astype(p.dtype)
        new_params[f] = p - lrs[f] * update * mask
        new_mu[f], new_nu[f] = m, v
    new_params["diffuse"] = jnp.maximum(new_params["diffuse"], 0.0)
    new_params["roughness"] = jnp.clip(new_params["roughness"], 0.0, 1.0)
    new_params["f0"] = jnp.clip(new_params["f0"], 0.0, 1.0)
    scene = scene._replace(**new_params)

    new_state = TrainState(
        scene=scene,
        mu=state.mu._replace(**new_mu),
        nu=state.nu._replace(**new_nu),
        count=count,
        total_weight=state.total_weight + grads.total_weight,
    )
    return new_state, dict(l1_diffuse=l1 / R)


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
):
    """Forward render with rays sharded over the mesh; returns final [R,3]."""
    n_shards = mesh.devices.size
    R = width * height
    assert R % n_shards == 0
    dirs = primary_ray_directions(
        width, height, camera.fov_y, camera.c2w
    ).reshape(-1, 3)

    @partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P(), P("rays"), P()),
        out_specs=P("rays"),
        check_vma=False,
    )
    def fwd(scene_rep, dirs_s, key_rep):
        frames, attrs = build_frames(
            scene_rep, settings.alpha_threshold, settings.exp_power,
            settings.global_scale_factor,
        )
        idx = jax.lax.axis_index("rays")
        k = jax.random.fold_in(key_rep, idx)
        origins = jnp.broadcast_to(camera.origin, (dirs_s.shape[0], 3))
        _, final, _ = render_tile(
            origins, dirs_s, frames, attrs, settings,
            camera.znear, camera.zfar, k, num_bounces, max_hits, chunk,
        )
        return final

    return fwd(scene, dirs, key)
