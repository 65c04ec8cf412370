"""EditableGaussianScene - post-training scene editing.

TPU-native twin of reference scene/editable_gaussian_model.py:11-328 and the
Edit dataclass from gaussian_viewer.py:38-68: boolean selections built from
bounding_boxes.json (axis-aligned boxes, elliptic cylinders via "cyl",
per-property value filters with optional zrange conditionals, "exclude"
composition), plus dirty-tracked per-object material and geometry edits.

Functional design: edits are pure numpy transforms applied to a base
GaussianScene, producing an edited scene pytree the renderer consumes - the
equivalent of the reference's overridden getters feeding
_export_param_values.  Dirty tracking caches the edited scene until edits or
the scaling modifier change.
"""

from __future__ import annotations

import copy
import json
import math
import os
from dataclasses import dataclass, field
from typing import Dict, Optional

import numpy as np

from ..utils.color import (
    axis_angle_to_rotation_matrix,
    hsv_to_rgb,
    rgb_to_hsv,
)
from ..ops.quaternion import quat_to_rotmat as _quat_to_rotmat_jnp
from .gaussian_scene import GaussianScene

DUPLICATION_OFFSET = 0.08


@dataclass(eq=True)
class Edit:
    """gaussian_viewer.py:38-68 (17 editable fields)."""

    roughness_shift: float = 0.0
    roughness_mult: float = 1.0

    diffuse_override: tuple = (0.5, 0.5, 0.5, 0.0)
    diffuse_hue_shift: float = 0.0
    diffuse_saturation_shift: float = 0.0
    diffuse_saturation_mult: float = 1.0
    diffuse_value_shift: float = 0.0
    diffuse_value_mult: float = 1.0

    use_roughness_override: bool = False
    roughness_override: float = 0.0

    specular_override: tuple = (0.5, 0.5, 0.5, 0.0)
    specular_hue_shift: float = 0.0
    specular_saturation_shift: float = 0.0
    specular_saturation_mult: float = 1.0
    specular_value_shift: float = 0.0
    specular_value_mult: float = 1.0

    translate_x: float = 0.0
    translate_y: float = 0.0
    translate_z: float = 0.0

    scale: float = 1.0

    rotate_x: float = 0.0
    rotate_y: float = 0.0
    rotate_z: float = 0.0


def _np_quat_to_rotmat(q):
    import jax.numpy as jnp
    return np.asarray(_quat_to_rotmat_jnp(jnp.asarray(q)))


def _np_rotmat_to_quat(R):
    import jax.numpy as jnp
    from ..ops.quaternion import rotmat_to_quat
    return np.asarray(rotmat_to_quat(jnp.asarray(R)))


def compute_bbox_mask(xyz: np.ndarray, bounding_box: dict) -> np.ndarray:
    """editable_gaussian_model.py:30-52."""
    if "cyl" in bounding_box:
        min_b = np.asarray(bounding_box["min"], np.float32)
        max_b = np.asarray(bounding_box["max"], np.float32)
        center_xy = 0.5 * (min_b[:2] + max_b[:2])
        half_xy = 0.5 * (max_b[:2] - min_b[:2])
        normalized = (xyz[:, :2] - center_xy) / half_xy
        inside_ellipse = (normalized**2).sum(-1) <= 1.0
        inside_z = (xyz[:, 2] >= min_b[2]) & (xyz[:, 2] <= max_b[2])
        return inside_ellipse & inside_z
    min_b = np.asarray(bounding_box["min"], np.float32)
    max_b = np.asarray(bounding_box["max"], np.float32)
    return np.all(xyz >= min_b, -1) & np.all(xyz <= max_b, -1)


def compute_selections(scene: GaussianScene, bounding_boxes: dict,
                       model_path: Optional[str] = None) -> Dict[str, np.ndarray]:
    """make_editable's selection pass (editable_gaussian_model.py:16-91),
    incl. cached selections/<key>.pt... here .npy (torch-free)."""
    xyz = np.asarray(scene.xyz)
    selections = {}
    raw = {
        "f0": np.asarray(scene.f0), "roughness": np.asarray(scene.roughness)[:, None],
        "diffuse": np.asarray(scene.diffuse),
    }
    for key, bounding_box in bounding_boxes.items():
        cached = None
        if model_path:
            for ext in (".npy",):
                p = os.path.join(model_path, "selections", key + ext)
                if os.path.exists(p):
                    cached = np.load(p).astype(bool).reshape(-1)
        if cached is not None:
            sel = np.zeros(scene.capacity, bool)
            sel[:cached.shape[0]] = cached
            selections[key] = sel
            continue

        within = compute_bbox_mask(xyz, bounding_box)
        for prop in ("f0", "roughness", "metalness", "diffuse"):
            if prop in bounding_box:
                vals = raw.get(prop if prop != "metalness" else "f0")
                prop_mean = vals.mean(-1)
                lo, hi = bounding_box[prop][0], bounding_box[prop][1]
                if "zrange" in bounding_box:
                    low = np.asarray(bounding_box["min"], np.float32)
                    high = np.asarray(bounding_box["max"], np.float32)
                    zlow = low + (high - low) * bounding_box["zrange"]
                    m = np.all(xyz >= zlow, -1) & np.all(xyz <= high, -1)
                    within &= (prop_mean >= lo) | m
                    within &= (prop_mean <= hi) | m
                else:
                    within &= prop_mean >= lo
                    within &= prop_mean <= hi
        if "exclude" in bounding_box:
            for exclusion in bounding_box["exclude"]:
                within &= ~compute_bbox_mask(xyz, bounding_boxes[exclusion])
        selections[key] = within & np.asarray(scene.live_mask)
    selections["everything"] = np.asarray(scene.live_mask).copy()
    return selections


class EditableGaussianScene:
    """Holds a base scene + selections + per-object edits; produces the
    edited scene on demand with dirty tracking."""

    def __init__(self, scene: GaussianScene):
        self.base = scene
        self.ready_for_editing = False
        self.edits: Dict[str, Edit] = {}
        self.bounding_boxes: Dict[str, dict] = {}
        self.selections: Dict[str, np.ndarray] = {}
        self.created_objects = []
        self.is_dirty = True
        self.last_edits = None
        self.last_scaling_modifier = 1.0
        self._cached = None

    @classmethod
    def from_model_dir(cls, scene: GaussianScene, model_path: str):
        obj = cls(scene)
        bb_path = os.path.join(model_path, "bounding_boxes.json")
        if os.path.exists(bb_path):
            with open(bb_path) as f:
                boxes = json.load(f)
            edits = {k: Edit() for k in boxes}
            obj.make_editable(edits, boxes, model_path)
        return obj

    def make_editable(self, edits: Dict[str, Edit], bounding_boxes: dict,
                      model_path: Optional[str] = None):
        assert set(edits.keys()) == set(bounding_boxes.keys())
        self.edits = edits
        self.bounding_boxes = bounding_boxes
        self.created_objects = list(edits.keys())
        self.selections = compute_selections(self.base, bounding_boxes, model_path)
        self.ready_for_editing = True
        self.is_dirty = True
        self.last_edits = None

    def dirty_check(self, scaling_modifier: float = 1.0):
        """editable_gaussian_model.py:95-103."""
        if (self.last_edits is None or self.edits != self.last_edits
                or self.last_scaling_modifier != scaling_modifier):
            self.last_edits = copy.deepcopy(self.edits)
            self.last_scaling_modifier = scaling_modifier
            self.is_dirty = True
        else:
            self.is_dirty = False
        return self.is_dirty

    def edited_scene(self) -> GaussianScene:
        """Apply all edits; returns the scene pytree to render."""
        if not self.ready_for_editing:
            return self.base
        if not self.is_dirty and self._cached is not None:
            return self._cached

        import jax.numpy as jnp

        xyz = np.asarray(self.base.xyz).copy()
        scaling = np.exp(np.asarray(self.base.scaling))
        rotation = np.asarray(self.base.rotation).copy()
        diffuse = np.maximum(np.asarray(self.base.diffuse), 0.0)
        normal = np.asarray(self.base.normal).copy()
        f0 = np.clip(np.asarray(self.base.f0), 0, 1)
        roughness = np.clip(np.asarray(self.base.roughness), 0, 1)

        for key, edit in self.edits.items():
            sel = self.selections[key]
            if not sel.any():
                continue

            # * roughness (editable_gaussian_model.py:106-124)
            if edit.use_roughness_override:
                base_r = np.zeros_like(roughness) + edit.roughness_override**2
            else:
                base_r = roughness
            mod_r = np.clip(
                edit.roughness_mult
                * (base_r + math.copysign(edit.roughness_shift,
                                          edit.roughness_shift**2)),
                0, 1,
            )
            roughness = np.where(sel, mod_r, roughness)

            # * diffuse HSV (:126-147)
            ov = np.asarray(edit.diffuse_override, np.float32)
            base_d = diffuse * (1 - ov[3]) + ov[None, :3] * ov[3]
            hsv = rgb_to_hsv(base_d)
            hsv[:, 0] = (hsv[:, 0] + math.pi * edit.diffuse_hue_shift) % (2 * math.pi)
            hsv[:, 1] = np.clip(
                edit.diffuse_saturation_mult * (hsv[:, 1] + edit.diffuse_saturation_shift), 0, 1)
            hsv[:, 2] = np.maximum(
                edit.diffuse_value_mult * (hsv[:, 2] + edit.diffuse_value_shift), 0)
            diffuse = np.where(sel[:, None], hsv_to_rgb(hsv), diffuse)

            # * f0 HSV (:149-170)
            ov = np.asarray(edit.specular_override, np.float32)
            base_f = f0 * (1 - ov[3]) + ov[None, :3] * ov[3]
            hsv = rgb_to_hsv(base_f)
            hsv[:, 0] = (hsv[:, 0] + math.pi * edit.specular_hue_shift) % (2 * math.pi)
            hsv[:, 1] = np.clip(
                edit.specular_saturation_mult * (hsv[:, 1] + edit.specular_saturation_shift), 0, 1)
            hsv[:, 2] = np.maximum(
                edit.specular_value_mult * (hsv[:, 2] + edit.specular_value_shift), 0)
            f0 = np.where(sel[:, None], hsv_to_rgb(hsv), f0)

            # * geometry (:172-279)
            angles = np.deg2rad([edit.rotate_x, edit.rotate_y, edit.rotate_z])
            Rm = axis_angle_to_rotation_matrix(np.asarray(angles, np.float64))

            normal[sel] = normal[sel] @ Rm.T

            t = np.array([edit.translate_x, edit.translate_y, edit.translate_z],
                         np.float32)
            xyz[sel] += t
            bb = self.bounding_boxes.get(key)
            if bb is not None and "min" in bb:
                center = np.array(
                    [(bb["min"][i] + bb["max"][i]) / 2 for i in range(3)],
                    np.float32) + t
            else:
                center = xyz[sel].mean(0)
            xyz[sel] = (xyz[sel] - center) * edit.scale + center
            xyz[sel] = (xyz[sel] - center) @ Rm.T + center

            scaling[sel] *= edit.scale

            if any(abs(a) > 1e-12 for a in angles):
                q = rotation[sel]
                q = q / np.linalg.norm(q, axis=-1, keepdims=True)
                Rq = _np_quat_to_rotmat(q)
                Rq = Rm[None] @ Rq
                rotation[sel] = _np_rotmat_to_quat(Rq)

        edited = self.base._replace(
            xyz=jnp.asarray(xyz),
            scaling=jnp.asarray(np.log(np.maximum(scaling, 1e-30))),
            rotation=jnp.asarray(rotation),
            diffuse=jnp.asarray(diffuse),
            normal=jnp.asarray(normal),
            f0=jnp.asarray(f0),
            roughness=jnp.asarray(roughness),
        )
        self._cached = edited
        self.is_dirty = False
        return edited

    def duplicate_object(self, obj_name: str, offset: float = DUPLICATION_OFFSET):
        """editable_gaussian_model.py:283-322: append copies + grow selections."""
        import jax.numpy as jnp
        sel = self.selections[obj_name]
        idx = np.nonzero(sel)[0]
        edit = self.edits[obj_name]
        delta = np.array([edit.translate_x, edit.translate_y, edit.translate_z],
                         np.float32)
        n_new = idx.size

        def cat(arr, new):
            return jnp.concatenate([arr, jnp.asarray(new)], axis=0)

        b = self.base
        self.base = GaussianScene(
            xyz=cat(b.xyz, np.asarray(b.xyz)[idx] + offset + delta),
            scaling=cat(b.scaling, np.asarray(b.scaling)[idx]),
            rotation=cat(b.rotation, np.asarray(b.rotation)[idx]),
            opacity=cat(b.opacity, np.asarray(b.opacity)[idx]),
            diffuse=cat(b.diffuse, np.asarray(b.diffuse)[idx]),
            normal=cat(b.normal, np.asarray(b.normal)[idx]),
            f0=cat(b.f0, np.asarray(b.f0)[idx]),
            roughness=cat(b.roughness, np.asarray(b.roughness)[idx]),
            live_mask=cat(b.live_mask, np.ones(n_new, bool)),
        )
        copy_key = obj_name + "_copy"
        self.selections[copy_key] = np.zeros(sel.shape[0], bool)
        for key in list(self.selections):
            extra = (np.ones(n_new, bool)
                     if key in ("everything", copy_key)
                     else np.zeros(n_new, bool))
            self.selections[key] = np.concatenate([self.selections[key], extra])
        self.edits[copy_key] = Edit()
        self.bounding_boxes[copy_key] = dict(self.bounding_boxes.get(obj_name, {}))
        self.created_objects.append(copy_key)
        self.is_dirty = True
        self._cached = None

    def remove_object(self, obj_name: str):
        """editable_gaussian_model.py:324-328 (opacity -> -1e8)."""
        import jax.numpy as jnp
        sel = self.selections[obj_name]
        op = np.asarray(self.base.opacity).copy()
        op[sel] = op[sel] * 0.0 - 100000000.0
        self.base = self.base._replace(opacity=jnp.asarray(op))
        self.is_dirty = True
        self._cached = None
