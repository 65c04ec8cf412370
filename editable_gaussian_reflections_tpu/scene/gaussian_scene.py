"""GaussianScene - the functional parameter store.

TPU-native merge of the reference's GaussianModel (scene/gaussian_model.py:31)
and the device-side Gaussians SoA (cuda/csrc/core/gaussians.h): a single
pytree of raw (pre-activation) parameter arrays.  There are no duplicate
CPU/GPU copies and no `_export_param_values` tax - the pytree is passed
straight into the jitted render/train step.

Activations (gaussian_model.py:136-180 and cuda helpers.cu:10-33):
  scaling: exp, opacity: sigmoid, rotation: normalize, diffuse(rgb): relu (in
  the kernel), normal: identity, f0/roughness: clipped relu.

Dynamic Gaussian counts (pruning / far-field injection / editing duplicates)
are handled with padded capacity + a live mask, so jitted code sees static
shapes; compaction happens at save/rebuild points on the host.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from ..ops.activations import clipped_relu_act, relu_act, sigmoid_act
from ..ops.gaussian_kernel import compute_scaling_factor
from ..ops.intersect import GaussianFrames
from ..ops.quaternion import quat_to_rotmat


class GaussianScene(NamedTuple):
    """Raw parameters; leading dim N (possibly padded - see live_mask)."""

    xyz: jnp.ndarray        # [N, 3]
    scaling: jnp.ndarray    # [N, 3] log-scale
    rotation: jnp.ndarray   # [N, 4] unnormalized quaternion (r, x, y, z)
    opacity: jnp.ndarray    # [N] logit
    diffuse: jnp.ndarray    # [N, 3] raw rgb (relu-activated in the kernel)
    normal: jnp.ndarray     # [N, 3] world-space (identity activation)
    f0: jnp.ndarray         # [N, 3] raw (clipped-relu)
    roughness: jnp.ndarray  # [N] raw (clipped-relu)
    live_mask: jnp.ndarray  # [N] bool - False for padded/pruned slots

    @property
    def capacity(self) -> int:
        return self.xyz.shape[0]


class SceneAttributes(NamedTuple):
    """Activated per-Gaussian shading attributes."""

    rgb: jnp.ndarray        # [N, 3]
    normal: jnp.ndarray     # [N, 3]
    f0: jnp.ndarray         # [N, 3]
    roughness: jnp.ndarray  # [N]


def build_frames(
    scene: GaussianScene,
    alpha_threshold: float,
    exp_power: float,
    global_scale_factor: float = 1.0,
):
    """Precompute activated geometry for tracing.

    Functional equivalent of `update_bvh()` + `_populateBVH`
    (bvh_wrapper.cu:33-66): one cheap fused elementwise pass instead of a BVH
    transform refit.  Degenerate Gaussians (sf == 0 or zero sizes) get
    valid=False, mirroring visibilityMask=0 (bvh_wrapper.cu:55-58).
    """
    opacity = sigmoid_act(scene.opacity)
    sf = compute_scaling_factor(opacity, alpha_threshold, exp_power)
    s = jnp.exp(scene.scaling)
    sizes = s * (sf * global_scale_factor)[:, None]
    degenerate = (sf <= 0.0) | jnp.all(sizes <= 0.0, axis=-1)
    valid = scene.live_mask & ~degenerate
    inv_sizes = jnp.where(sizes > 0.0, 1.0 / jnp.maximum(sizes, 1e-30), 0.0)
    rot = quat_to_rotmat(
        scene.rotation / jnp.linalg.norm(scene.rotation, axis=-1, keepdims=True)
    )
    frames = GaussianFrames(
        mean=scene.xyz,
        rot=rot,
        inv_sizes=inv_sizes,
        sf=sf,
        opacity=opacity,
        normal=scene.normal,
        valid=valid,
    )
    attrs = SceneAttributes(
        rgb=relu_act(scene.diffuse),
        normal=scene.normal,
        f0=clipped_relu_act(scene.f0),
        roughness=clipped_relu_act(scene.roughness),
    )
    return frames, attrs


def pad_to(scene: GaussianScene, capacity: int) -> GaussianScene:
    """Grow the padded capacity (host-side; triggers recompile when changed)."""
    n = scene.capacity
    if capacity < n:
        raise ValueError(f"capacity {capacity} < current {n}")
    if capacity == n:
        return scene
    extra = capacity - n

    def pad(a, fill=0.0):
        pad_width = [(0, extra)] + [(0, 0)] * (a.ndim - 1)
        return jnp.pad(a, pad_width, constant_values=fill)

    return GaussianScene(
        xyz=pad(scene.xyz),
        scaling=pad(scene.scaling, fill=-10.0),
        rotation=pad(scene.rotation).at[n:, 0].set(1.0),
        opacity=pad(scene.opacity, fill=-10.0),
        diffuse=pad(scene.diffuse),
        normal=pad(scene.normal),
        f0=pad(scene.f0),
        roughness=pad(scene.roughness),
        live_mask=pad(scene.live_mask, fill=False),
    )


def round_up(n: int, multiple: int) -> int:
    return ((n + multiple - 1) // multiple) * multiple


def from_arrays(xyz, scaling, rotation, opacity, diffuse, normal, f0,
                roughness, pad_multiple: int = 2048) -> GaussianScene:
    """Build a scene from numpy/jnp arrays, padding N to a chunk multiple."""
    n = xyz.shape[0]
    scene = GaussianScene(
        xyz=jnp.asarray(xyz, jnp.float32),
        scaling=jnp.asarray(scaling, jnp.float32),
        rotation=jnp.asarray(rotation, jnp.float32),
        opacity=jnp.asarray(opacity, jnp.float32).reshape(n),
        diffuse=jnp.asarray(diffuse, jnp.float32),
        normal=jnp.asarray(normal, jnp.float32),
        f0=jnp.asarray(f0, jnp.float32),
        roughness=jnp.asarray(roughness, jnp.float32).reshape(n),
        live_mask=jnp.ones((n,), bool),
    )
    return pad_to(scene, round_up(n, pad_multiple))


def num_live(scene: GaussianScene) -> int:
    return int(np.asarray(jnp.sum(scene.live_mask)))
