"""Training engine: jitted train step + dynamic-count host operations.

TPU-native twin of the reference training loop (train.py:172-274) and the
optimizer plumbing in scene/gaussian_model.py:286-344:

  * per-param-group Adam (eps 1e-15, eps outside the sqrt like torch) with the
    Plenoxels log-lerp xyz LR schedule x spatial_lr_scale - implemented as
    scale_by_adam + a per-leaf LR pytree passed in each step (no recompiles);
  * the whole iteration (trace + composite + loss-fused backward + scatter +
    scale decay + Adam + clamps) is ONE jitted function over ray tiles;
  * pruning by accumulated total_weight (train.py:238-245) clears live_mask
    and zeroes the pruned slots' Adam moments (the reference's
    optimizer-state surgery, gaussian_model.py:479-532);
  * on prune iterations the reference zeroes all gradients before the Adam
    step (prune_points sets .grad = zeros) - replicated via apply_grads=0.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from .config import Config
from .ops.render_grads import ParamGrads
from .renderer.raytracer import (
    CameraParams,
    RayTargets,
    RenderSettings,
    render_tile_with_grads,
)
from .ops.camera_rays import primary_ray_directions
from .scene.gaussian_scene import GaussianScene, build_frames
from .utils.general import get_expon_lr_func


class TrainState(NamedTuple):
    scene: GaussianScene
    mu: GaussianScene          # Adam first moments (same tree shape as params)
    nu: GaussianScene          # Adam second moments
    count: jnp.ndarray         # Adam step count (scalar int32)
    total_weight: jnp.ndarray  # [N] accumulated per-Gaussian composite weight


PARAM_FIELDS = ("xyz", "scaling", "rotation", "opacity", "diffuse", "normal",
                "f0", "roughness")
_GRAD_TO_PARAM = dict(mean="xyz", scale="scaling", rotation="rotation",
                      opacity="opacity", rgb="diffuse", normal="normal",
                      f0="f0", roughness="roughness")


def init_train_state(scene: GaussianScene) -> TrainState:
    zeros = scene._replace(
        **{f: jnp.zeros_like(getattr(scene, f)) for f in PARAM_FIELDS}
    )
    return TrainState(
        scene=scene, mu=zeros, nu=zeros,
        count=jnp.zeros((), jnp.int32),
        total_weight=jnp.zeros(scene.capacity, jnp.float32),
    )


def settings_from_config(cfg: Config) -> RenderSettings:
    """GaussianRaytracer.__init__ pushes cfg loss weights/thresholds into the
    device config (gaussian_raytracer.py:16-25)."""
    return RenderSettings(
        exp_power=float(cfg.exp_power),
        alpha_threshold=cfg.alpha_threshold,
        transmittance_threshold=cfg.transmittance_threshold,
        loss_weight_diffuse=cfg.loss_weight_diffuse,
        loss_weight_specular=cfg.loss_weight_specular,
        loss_weight_depth=cfg.loss_weight_depth,
        loss_weight_normal=cfg.loss_weight_normal,
        loss_weight_f0=cfg.loss_weight_f0,
        loss_weight_roughness=cfg.loss_weight_roughness,
    )


def lr_tree(cfg: Config, iteration: int, spatial_lr_scale: float):
    """Per-field LRs incl. the xyz schedule (gaussian_model.py:286-351)."""
    sched = get_expon_lr_func(
        lr_init=cfg.xyz_lr_init * spatial_lr_scale,
        lr_final=cfg.xyz_lr_final * spatial_lr_scale,
        lr_delay_mult=cfg.xyz_lr_delay_mult,
        max_steps=cfg.xyz_lr_max_steps,
    )
    return dict(
        xyz=float(sched(iteration)),
        scaling=cfg.scaling_lr,
        rotation=cfg.rotation_lr,
        opacity=cfg.opacity_lr,
        diffuse=cfg.diffuse_lr,
        normal=cfg.normal_lr,
        f0=cfg.f0_lr,
        roughness=cfg.roughness_lr,
    )


def grads_to_param_tree(grads: ParamGrads, scene: GaussianScene) -> dict:
    return {
        _GRAD_TO_PARAM[k]: getattr(grads, k)
        for k in _GRAD_TO_PARAM
    }


def prepare_render_inputs(
    scene: GaussianScene,
    settings: RenderSettings,
    use_pallas: bool,
    use_culling: bool,
    cull_tile: int,
    cull_cluster: int,
    max_clusters: int,
    split_far: bool = False,
    mc_far: int = 32,
    max_hits_far: int = 0,
    split_radius_scale: float = 1.5,
):
    """Per-step scene preprocessing shared by the single-device and sharded
    train steps: activation frames, optional Morton sort (the BVH-refit
    analog) + cluster bounds for culling, and the packed Pallas layout.

    Returns (frames, attrs, gpack, culling, scene_for_bwd, gauss_perm)."""
    frames, attrs = build_frames(
        scene, settings.alpha_threshold, settings.exp_power,
        settings.global_scale_factor,
    )
    gpack = None
    culling = None
    gauss_perm = None
    scene_for_bwd = scene
    if use_pallas and use_culling:
        # Morton-sort the scene for tight clusters; gradients are unsorted
        # back at the end (hit ids refer to the sorted layout).
        from .ops.culling import cluster_bounds, morton_order
        from .ops.pallas.render_kernel import (
            pack_attr_table,
            pack_frame_table,
        )
        gauss_perm = morton_order(frames)
        frames = jax.tree_util.tree_map(lambda a: a[gauss_perm], frames)
        attrs = jax.tree_util.tree_map(lambda a: a[gauss_perm], attrs)
        scene_for_bwd = jax.tree_util.tree_map(lambda a: a[gauss_perm], scene)
        bounds = cluster_bounds(frames, cull_cluster)
        culling = dict(bounds=bounds, cull_tile=cull_tile,
                       cluster=cull_cluster, mc=max_clusters,
                       table=pack_attr_table(attrs),
                       ftable=pack_frame_table(frames, scene_for_bwd),
                       split_far=split_far, mc_far=mc_far,
                       max_hits_far=max_hits_far,
                       split_radius_scale=split_radius_scale)
    if use_pallas:
        from .ops.pallas.trace_kernel import pack_frames
        gpack = pack_frames(frames, attrs)
    return frames, attrs, gpack, culling, scene_for_bwd, gauss_perm


def prepare_rays(width, height, camera, key_jit, jitter, cull_tile,
                 use_culling):
    """Primary ray dirs (+ optional jitter) and the square-pixel-tile
    permutation used when culling. Returns (dirs [R,3], ray_perm|None,
    ray_inv|None)."""
    dirs = primary_ray_directions(
        width, height, camera.fov_y, camera.c2w,
        jitter_key=key_jit if jitter else None,
    ).reshape(-1, 3)
    ray_perm = ray_inv = None
    if use_culling:
        from .ops.culling import tile_pixel_order
        th = tw = int(cull_tile ** 0.5)
        if height % th or width % tw or th * tw != cull_tile:
            th, tw = 16, cull_tile // 16
        if height % th == 0 and width % tw == 0:
            ray_perm_np, ray_inv_np = tile_pixel_order(height, width, th, tw)
            ray_perm = jnp.asarray(ray_perm_np)
            ray_inv = jnp.asarray(ray_inv_np)
            dirs = dirs[ray_perm]
    return dirs, ray_perm, ray_inv


def grads_over_tiles(
    origins, dirs_t, targets_t, frames, attrs, scene_for_bwd,
    settings, camera, key_b, tile_offset,
    num_bounces, max_hits, chunk,
    use_pallas, exp_power_static, gpack, culling, interpret=False,
):
    """lax.scan of render_tile_with_grads over [T, tile, ...] ray tiles.

    tile_offset shifts the per-tile RNG stream so a sharded caller (tiles
    split across devices) reproduces the exact single-device key sequence.
    Returns (ParamGrads summed over tiles, summed l1_diffuse)."""
    num_tiles = dirs_t.shape[0]
    n = scene_for_bwd.capacity

    fused = (use_pallas and culling is not None and "table" in culling)

    def body(carry, inp):
        grads_acc, loss_acc = carry
        i, dirs_i, tgt_i = inp
        key_i = jax.random.fold_in(key_b, tile_offset + i)
        if fused:
            from .renderer.raytracer import render_tile_with_grads_fused
            steps, final, grads = render_tile_with_grads_fused(
                origins, dirs_i, tgt_i, settings, camera.znear, camera.zfar,
                key_i, num_bounces, max_hits,
                gpack=gpack, table=culling["table"],
                ftable=culling["ftable"], bounds=culling["bounds"],
                cull_tile=culling["cull_tile"],
                cull_cluster=culling["cluster"],
                max_clusters=culling["mc"], n_capacity=n,
                exp_power_static=exp_power_static, interpret=interpret,
                split_far=culling.get("split_far", False),
                mc_far=culling.get("mc_far", 32),
                max_hits_far=culling.get("max_hits_far", 0),
                split_radius_scale=culling.get("split_radius_scale", 1.5),
            )
        else:
            steps, final, grads = render_tile_with_grads(
                origins, dirs_i, frames,
                attrs, scene_for_bwd, tgt_i, settings, camera.znear,
                camera.zfar, key_i,
                num_bounces, max_hits, chunk,
                use_pallas=use_pallas, exp_power_static=exp_power_static,
                gpack=gpack, culling=culling, interpret=interpret,
            )
        l1 = jnp.sum(jnp.abs(steps.rgb[0] - tgt_i.diffuse).mean(-1))
        grads_acc = grads_acc + grads
        return (grads_acc, loss_acc + l1), None

    from .ops.render_grads import zero_grads
    init = (zero_grads(n), jnp.zeros((), jnp.float32))
    (grads, l1), _ = jax.lax.scan(
        body, init, (jnp.arange(num_tiles), dirs_t, targets_t),
    )
    return grads, l1


def apply_updates(state: TrainState, grads: ParamGrads, lrs: dict,
                  hyper: dict) -> TrainState:
    """Scale decay + per-group Adam + clamps (train.py:224-254 semantics),
    shared verbatim by train_step and sharded_train_step."""
    scene = state.scene
    # * scale decay right after render (train.py:224-226)
    live = scene.live_mask
    decayed_scaling = jnp.where(
        live[:, None], scene.scaling + jnp.log(hyper["scale_decay"]),
        scene.scaling,
    )
    scene = scene._replace(scaling=decayed_scaling)

    # * Adam step (torch semantics: m/(sqrt(v)+eps), bias-corrected)
    g_tree = grads_to_param_tree(grads, scene)
    apply = hyper["apply_grads"]
    b1, b2 = hyper["beta_1"], hyper["beta_2"]
    eps = 1e-15
    count = state.count + 1
    c1 = 1.0 - b1 ** count.astype(jnp.float32)
    c2 = 1.0 - b2 ** count.astype(jnp.float32)

    new_params = {}
    new_mu = {}
    new_nu = {}
    for f in PARAM_FIELDS:
        p = getattr(scene, f)
        g = g_tree[f].reshape(p.shape) * apply
        m = b1 * getattr(state.mu, f) + (1.0 - b1) * g
        v = b2 * getattr(state.nu, f) + (1.0 - b2) * g * g
        update = (m / c1) / (jnp.sqrt(v / c2) + eps)
        mask = live.reshape((-1,) + (1,) * (p.ndim - 1)).astype(p.dtype)
        new_params[f] = p - lrs[f] * update * mask
        new_mu[f] = m
        new_nu[f] = v

    # * clamps (train.py:251-254)
    new_params["diffuse"] = jnp.maximum(new_params["diffuse"], 0.0)
    new_params["roughness"] = jnp.clip(new_params["roughness"], 0.0, 1.0)
    new_params["f0"] = jnp.clip(new_params["f0"], 0.0, 1.0)

    scene = scene._replace(**new_params)
    return TrainState(
        scene=scene,
        mu=state.mu._replace(**new_mu),
        nu=state.nu._replace(**new_nu),
        count=count,
        total_weight=state.total_weight + grads.total_weight,
    )


@partial(
    jax.jit,
    static_argnames=("width", "height", "num_bounces", "max_hits", "chunk",
                     "tile", "jitter", "use_pallas", "exp_power_static",
                     "use_culling", "cull_tile", "cull_cluster",
                     "max_clusters", "interpret", "split_far", "mc_far",
                     "max_hits_far", "split_radius_scale"),
)
def train_step(
    state: TrainState,
    camera: CameraParams,
    targets: RayTargets,          # flattened [H*W, ...]
    settings: RenderSettings,
    lrs: dict,                    # per-field scalar LRs
    hyper: dict,                  # beta_1, beta_2, scale_decay, apply_grads
    key,
    width: int,
    height: int,
    num_bounces: int,
    max_hits: int,
    chunk: int,
    tile: int,
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
    max_hits_far: int = 0,   # 0 = max(8, max_hits // 2)
    split_radius_scale: float = 1.5,
):
    scene = state.scene
    cull_tile = min(cull_tile, 256)  # fused-kernel VMEM budget
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
    R = dirs.shape[0]
    tile_sz = min(tile, R)
    # padding would duplicate rays and double-count their gradients; the host
    # picks a tile size dividing H*W (pick_tile_size below)
    assert R % tile_sz == 0, f"H*W={R} must be divisible by tile={tile_sz}"
    num_tiles = R // tile_sz
    dirs_t = dirs.reshape(num_tiles, tile_sz, 3)
    targets_t = jax.tree_util.tree_map(
        lambda a: a.reshape((num_tiles, tile_sz) + a.shape[1:]), targets
    )
    origins = jnp.broadcast_to(camera.origin, (tile_sz, 3))

    grads, l1_diffuse = grads_over_tiles(
        origins, dirs_t, targets_t, frames, attrs, scene_for_bwd,
        settings, camera, key_b, 0, num_bounces, max_hits, chunk,
        use_pallas, exp_power_static, gpack, culling, interpret,
    )
    if gauss_perm is not None:
        # grads are in Morton-sorted space; scatter back to original slots
        inv = jnp.argsort(gauss_perm)
        grads = jax.tree_util.tree_map(lambda g: g[inv], grads)

    new_state = apply_updates(state, grads, lrs, hyper)
    metrics = dict(l1_diffuse=l1_diffuse / R)
    return new_state, metrics


@jax.jit
def prune_step(state: TrainState, kill: jnp.ndarray) -> TrainState:
    """prune_points + optimizer-state surgery + total_weight reset
    (train.py:238-245, gaussian_model.py:479-532)."""
    keep = ~kill
    scene = state.scene._replace(live_mask=state.scene.live_mask & keep)

    def mask_tree(tree):
        return tree._replace(**{
            f: getattr(tree, f)
            * keep.reshape((-1,) + (1,) * (getattr(tree, f).ndim - 1))
            for f in PARAM_FIELDS
        })

    return TrainState(
        scene=scene,
        mu=mask_tree(state.mu),
        nu=mask_tree(state.nu),
        count=state.count,
        total_weight=jnp.zeros_like(state.total_weight),
    )


def use_pallas_backend(cfg: Config) -> bool:
    """auto -> pallas on TPU, xla elsewhere (interpret-mode pallas on CPU is
    too slow for real work; tests exercise it explicitly)."""
    if cfg.backend == "pallas":
        return True
    if cfg.backend == "xla":
        return False
    import jax
    return jax.default_backend() not in ("cpu",)


def pick_tile_size(num_rays: int, preferred: int) -> int:
    """Largest divisor of num_rays that is <= preferred."""
    t = min(preferred, num_rays)
    while num_rays % t != 0:
        t -= 1
    return t


def targets_from_camera(camera) -> RayTargets:
    """Flatten a Camera's G-buffers into per-ray targets
    (framebuffer fetch_targets equivalent). Missing buffers become zeros
    (gaussian_raytracer.py:109-137 zero-fill)."""
    h, w = camera.image_height, camera.image_width
    z3 = np.zeros((h * w, 3), np.float32)
    z1 = np.zeros((h * w,), np.float32)

    def flat3(img):
        return z3 if img is None else np.asarray(img, np.float32).reshape(h * w, -1)[:, :3]

    def flat1(img):
        return z1 if img is None else np.asarray(img, np.float32).reshape(h * w, -1)[:, 0]

    return RayTargets(
        diffuse=flat3(camera.diffuse_image),
        specular=flat3(camera.specular_image),
        depth=flat1(camera.depth_image),
        normal=flat3(camera.normal_image),
        roughness=flat1(camera.roughness_image),
        f0=flat3(camera.f0_image),
    )


def append_with_opt_state(state: TrainState, new: dict,
                          pad_multiple: int = 2048) -> TrainState:
    """Far-field injection preserving survivors' Adam moments
    (densification_postfix + cat_tensors_to_optimizer semantics)."""
    from .scene.gaussian_scene import pad_to, round_up
    scene = state.scene
    live = np.asarray(scene.live_mask)
    idx = np.nonzero(live)[0]
    n_live = idx.size
    n_new = new["xyz"].shape[0]
    cap = round_up(n_live + n_new, pad_multiple)

    def rebuild(tree: GaussianScene, take_new) -> GaussianScene:
        fields = {}
        for f in PARAM_FIELDS:
            old = np.asarray(getattr(tree, f))[idx]
            if take_new:
                add = np.asarray(new[f]).reshape((n_new,) + old.shape[1:])
            else:
                add = np.zeros((n_new,) + old.shape[1:], old.dtype)
            fields[f] = jnp.asarray(np.concatenate([old, add]))
        lm = jnp.asarray(
            np.concatenate([np.ones(n_live + n_new, bool)])
        )
        out = GaussianScene(live_mask=lm, **fields)
        return pad_to(out, cap)

    new_scene = rebuild(scene, take_new=True)
    new_mu = rebuild(state.mu, take_new=False)._replace(live_mask=new_scene.live_mask)
    new_nu = rebuild(state.nu, take_new=False)._replace(live_mask=new_scene.live_mask)
    return TrainState(
        scene=new_scene, mu=new_mu, nu=new_nu, count=state.count,
        total_weight=jnp.zeros(new_scene.capacity, jnp.float32),
    )
