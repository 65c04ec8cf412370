"""Scene initialization and dynamic-count operations.

TPU-native twin of reference scene/gaussian_model.py:
  * create_from_pcd (:182-230) - init from a point cloud with knn-sized scales
  * add_farfield_points (:232-284) - random environment shell after warmup
  * prune machinery (:479-532) - here a live-mask update + optimizer-state
    masking instead of optimizer-state surgery (pytree ops on padded arrays)

Dynamic N under jit is handled with padded capacity + live_mask; pruned slots
keep static shapes (no recompiles), dead slots are masked everywhere.
"""

from __future__ import annotations

import os

import jax.numpy as jnp
import numpy as np

from ..config import Config
from ..utils.general import inverse_sigmoid, mean_dist2_knn3
from ..utils.graphics import BasicPointCloud
from .gaussian_scene import GaussianScene, from_arrays, num_live, pad_to, round_up


def create_from_pcd(pcd: BasicPointCloud, cfg: Config,
                    pad_multiple: int = 2048) -> GaussianScene:
    """gaussian_model.py:182-230."""
    n = pcd.points.shape[0]
    dist2 = np.maximum(mean_dist2_knn3(pcd.points), 1e-7)
    scales = np.log(np.sqrt(dist2) * cfg.init_scale)[:, None].repeat(3, axis=1)
    rots = np.zeros((n, 4), np.float32)
    rots[:, 0] = 1.0
    opacity = np.full(n, inverse_sigmoid(cfg.init_opa), np.float32)
    diffuse = np.asarray(pcd.colors, np.float32)
    if cfg.clamp_max is not None:
        diffuse = np.clip(diffuse, 0.0, cfg.clamp_max)
    return from_arrays(
        xyz=np.asarray(pcd.points, np.float32),
        scaling=scales.astype(np.float32),
        rotation=rots,
        opacity=opacity,
        diffuse=diffuse,
        normal=np.asarray(pcd.normals, np.float32),
        f0=np.full((n, 3), cfg.init_f0, np.float32),
        roughness=np.full(n, cfg.init_roughness, np.float32),
        pad_multiple=pad_multiple,
    )


def farfield_arrays(cfg: Config, cameras_extent: float, camera_centers,
                    camera_znears, rng: np.random.Generator):
    """gaussian_model.py:232-284 (incl. the book-demo env-var extras)."""
    new_xyz = (
        np.clip(rng.standard_normal((cfg.init_num_pts_farfield, 3)), -3, 3)
        * cameras_extent * cfg.scene_extent_init_radius
    ).astype(np.float32)

    # prune points inside any camera's znear sphere (scene.py:88-105)
    keep = np.ones(new_xyz.shape[0], bool)
    for c, zn in zip(camera_centers, camera_znears):
        keep &= np.linalg.norm(new_xyz - np.asarray(c)[None], axis=1) >= zn
    new_xyz = new_xyz[keep]

    add_book_points = "ADD_BOOK_INIT_PTS" in os.environ
    num_book = 0
    if add_book_points:
        num_book = int(os.getenv("NUM_BOOK_PTS", 50000))
        extra = rng.random((num_book, 3)).astype(np.float32) * 0.3 + np.array(
            [-0.15, -0.10, -0.15], np.float32
        )
        new_xyz = np.concatenate([new_xyz, extra])

    n = new_xyz.shape[0]
    dist2 = np.maximum(mean_dist2_knn3(new_xyz), 1e-7)
    scaling = np.log(np.sqrt(dist2) * cfg.init_scale_farfield)[:, None].repeat(3, 1)
    if add_book_points and num_book > 0:
        scaling[-num_book:] = np.log(float(os.getenv("BOOK_PTS_SCALE", 0.001)))
    rotation = np.zeros((n, 4), np.float32)
    rotation[:, 0] = 1.0
    opacity = np.full(n, inverse_sigmoid(cfg.init_opa_farfield), np.float32)
    diffuse = np.full((n, 3), cfg.init_diffuse_farfield, np.float32)
    if add_book_points and num_book > 0:
        diffuse[-num_book:] = rng.random((num_book, 3)).astype(np.float32)
    return dict(
        xyz=new_xyz.astype(np.float32),
        scaling=scaling.astype(np.float32),
        rotation=rotation,
        opacity=opacity,
        diffuse=diffuse,
        normal=np.zeros((n, 3), np.float32),
        f0=np.full((n, 3), 0.04, np.float32),
        roughness=np.zeros(n, np.float32),
    )


def append_points(scene: GaussianScene, new: dict,
                  pad_multiple: int = 2048) -> GaussianScene:
    """densification_postfix equivalent: append into padded slots, growing
    capacity if needed (host-side; may trigger one recompile)."""
    n_new = new["xyz"].shape[0]
    live = np.asarray(scene.live_mask)
    # compact live gaussians first so free slots are contiguous at the end
    idx = np.nonzero(live)[0]
    n_live = idx.size
    needed = round_up(n_live + n_new, pad_multiple)

    def compacted(a):
        return np.asarray(a)[idx]

    arrs = dict(
        xyz=compacted(scene.xyz), scaling=compacted(scene.scaling),
        rotation=compacted(scene.rotation), opacity=compacted(scene.opacity),
        diffuse=compacted(scene.diffuse), normal=compacted(scene.normal),
        f0=compacted(scene.f0), roughness=compacted(scene.roughness),
    )
    merged = {
        k: np.concatenate([arrs[k], np.asarray(new[k]).reshape((n_new,) + arrs[k].shape[1:])])
        for k in arrs
    }
    out = from_arrays(**merged, pad_multiple=pad_multiple)
    return pad_to(out, needed)


def prune_mask(scene: GaussianScene, kill: jnp.ndarray) -> GaussianScene:
    """prune_points equivalent: clear live_mask where kill (jit-safe)."""
    return scene._replace(live_mask=scene.live_mask & ~kill)


def znear_prune_mask(scene: GaussianScene, camera_centers, camera_znears):
    """prune_znear_only: kill gaussians inside any camera znear sphere."""
    kill = jnp.zeros(scene.capacity, bool)
    xyz = scene.xyz
    for c, zn in zip(camera_centers, camera_znears):
        d = jnp.linalg.norm(xyz - jnp.asarray(c)[None], axis=1)
        kill = kill | (d < zn)
    return kill


__all__ = [
    "create_from_pcd", "farfield_arrays", "append_points", "prune_mask",
    "znear_prune_mask", "num_live",
]
