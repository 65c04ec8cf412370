"""Viewer state machine - the GUI-free core of the reference's GaussianViewer.

TPU-native twin of gaussian_viewer.py:71-891 with the imgui layer removed:
render-mode list, exposure/znear/scaling-modifier, SPP accumulation with
dirty-tracked resets, per-object Edit state from bounding_boxes.json,
duplicate/remove objects, and point-and-click object selection via
selection-mask renders (one-hot diffuse, gaussian_viewer.py:292-321).

The websocket service (viewer/service.py) drives this over the same
metadata+binary tick protocol shape as the reference's SERVER mode; a GUI
client can attach remotely, matching viewer/__init__.py:93-187.
"""

from __future__ import annotations

import json
import os
from dataclasses import asdict
from typing import Dict, Optional

import numpy as np

from ..config import Config, load_config
from ..ops.tonemap import tonemap, untonemap
from ..renderer.raytracer import RenderSettings
from ..renderer.render import camera_params
from ..scene.cameras import MiniCam
from ..scene.editable import Edit, EditableGaussianScene
from ..scene.scene import load_scene_ply, search_for_max_iteration

RENDER_MODES = ["RGB", "Normals", "Depth", "F0", "Roughness", "Ellipsoids",
                "Points"]
DUPLICATION_OFFSET = 0.08

_raster_jit = None  # process-wide compiled rasterizer (shape-keyed by jit)


class ViewerState:
    def __init__(self, scene: EditableGaussianScene, cfg: Config,
                 width: int, height: int, fovy: float,
                 settings: Optional[RenderSettings] = None):
        self.gaussians = scene
        self.cfg = cfg
        self.width = width
        self.height = height
        self.fovy = fovy
        self.settings = settings or RenderSettings()

        self.render_mode = 0
        self.exposure = 1.0
        self.znear = 0.05
        self.zfar = 1000.0
        self.scaling_modifier = 1.0
        self.accumulate_samples = True
        self.denoise = False
        self.num_bounces = 2
        self.spp = 1
        # interactive preview downscale (1/2/4): the client drops to s>1
        # during camera/gizmo drags (render cost falls ~s^2; the frame is
        # nearest-upscaled back to width x height so the protocol shape,
        # pick/inspect coordinates, and accumulation buffers never change).
        # The reference gets the same effect statically via cfg.resolution
        # downsampling at viewer start (gaussian_viewer.py:146-147).
        self.preview_scale = 1
        # EllipsoidViewer widget knobs (viewer/widgets/ellipsoid_viewer.py:
        # 315-317): alpha clip limit for the solid stage, the widget's own
        # scale modifier (composed with scaling_modifier), and whether the
        # additive sub-limit "floaters" stage renders.
        self.ellipsoid_limit = 0.2
        self.ellipsoid_scale = 0.5
        self.render_floaters = False

        self._accum = None
        self._accum_count = 0
        self._last_pose = None
        self.is_dirty = True
        self.selection_masks: Dict[str, np.ndarray] = {}
        self.dataset_cameras: list = []  # CameraSelect poses (from_ply)

    @classmethod
    def from_ply(cls, model_path: str, iteration: Optional[int] = None,
                 resolution: Optional[int] = None):
        """gaussian_viewer.py:125-184: self-contained pretrained model dir."""
        cfg_path = os.path.join(model_path, "cfg.json")
        cfg = load_config(cfg_path) if os.path.exists(cfg_path) else Config()
        if resolution:
            cfg.resolution = resolution
        iteration = iteration or search_for_max_iteration(
            os.path.join(model_path, "point_cloud"))
        ply = os.path.join(model_path, "point_cloud",
                           f"iteration_{iteration}", "point_cloud.ply")
        base = load_scene_ply(ply, pad_multiple=cfg.trace_chunk)
        scene = EditableGaussianScene.from_model_dir(base, model_path)

        fovy = 0.7
        tj = os.path.join(model_path, "transforms_train.json")
        width = height = cfg.resolution or 512
        dataset_cameras = []
        if os.path.exists(tj):
            with open(tj) as f:
                contents = json.load(f)
            fovy = contents.get("camera_angle_y", contents.get("camera_angle_x", 0.7))
            # dataset camera poses for the CameraSelect widget analog
            # (viewer/widgets/camera_select.py): snap the view to a
            # training camera.  Same OpenGL->COLMAP conversion as
            # dataset/blender.py.
            for frame in contents.get("frames", [])[:100]:
                c2w = np.array(frame["transform_matrix"], np.float64)
                c2w[:3, 1:3] *= -1
                w2c = np.linalg.inv(c2w)
                dataset_cameras.append(dict(
                    name=os.path.basename(str(frame.get("file_path", ""))),
                    R=np.transpose(w2c[:3, :3]).tolist(),
                    camera_center=c2w[:3, 3].tolist(),
                ))
        from ..training import settings_from_config
        st = cls(scene, cfg, width, height, fovy,
                 settings_from_config(cfg))
        st.dataset_cameras = dataset_cameras
        return st

    # ------------------------------------------------------------------

    def _pose_key(self, camera: MiniCam):
        return (np.asarray(camera.R).tobytes(),
                np.asarray(camera.camera_center).tobytes(),
                self.znear, self.zfar, self.render_mode, self.num_bounces,
                self.preview_scale, self.ellipsoid_limit,
                self.ellipsoid_scale, self.render_floaters)

    def _check_dirty(self, camera: MiniCam):
        scene_dirty = self.gaussians.dirty_check(self.scaling_modifier)
        pose = self._pose_key(camera)
        cam_dirty = pose != self._last_pose
        self._last_pose = pose
        if scene_dirty or cam_dirty or not self.accumulate_samples:
            self._accum = None
            self._accum_count = 0
            return True
        return False

    def step(self, camera: MiniCam) -> np.ndarray:
        """One render tick; returns the HWC display image [0,1]
        (gaussian_viewer.py:256-381)."""
        import jax

        from ..renderer.raytracer import render_frame
        from ..scene.gaussian_scene import GaussianScene

        self._check_dirty(camera)
        scene = self.gaussians.edited_scene()
        # drag-time preview downscale: all backends need 16 | H, W (fused
        # pixel tiling / cull-tile divisibility / raster tiles), so only
        # drop when the reduced frame still qualifies
        s = int(self.preview_scale)
        if s not in (2, 4) or self.height % (16 * s) or self.width % (16 * s):
            s = 1
        H, W = self.height // s, self.width // s
        mode = RENDER_MODES[self.render_mode]
        if mode in ("Ellipsoids", "Points"):
            frame = self._raster_frame(scene, camera, W, H,
                                       points=(mode == "Points"))
        else:
            if self.scaling_modifier != 1.0:
                settings = self.settings._replace(
                    global_scale_factor=self.scaling_modifier)
            else:
                settings = self.settings

            from ..renderer.render import (
                default_backend_kwargs,
                dispatch_render_frame,
            )

            cam = camera_params(camera, znear=self.znear, zfar=self.zfar)
            key = jax.random.PRNGKey(self._accum_count)
            bk = default_backend_kwargs(self.cfg)
            if s > 1 and bk.get("use_culling"):
                # drag-time preview: the drain-free scan composite (~3x
                # faster, streaming-order approximation) compounds with the
                # downscale; the full-res settled frame re-renders exact
                bk["composite_mode"] = "scan"
                bk["kernel_stats"] = False  # preview needs no counters
            steps, final = dispatch_render_frame(
                scene, cam, settings, key, W, H,
                num_bounces=self.num_bounces,
                max_hits=self.cfg.max_hits,
                chunk=self.cfg.trace_chunk, tile=self.cfg.ray_tile,
                **bk,
            )
            frame = dict(
                rgb=np.asarray(final).reshape(H, W, 3),
                normal=np.asarray(steps.normal[0]).reshape(H, W, 3),
                depth=np.asarray(steps.depth[0]).reshape(H, W, 1),
                f0=np.asarray(steps.f0[0]).reshape(H, W, 3),
                roughness=np.asarray(steps.roughness[0]).reshape(H, W, 1),
            )
        if s > 1:  # nearest-upscale so downstream shapes stay full-res
            frame = {k: np.repeat(np.repeat(v, s, 0), s, 1)
                     for k, v in frame.items()}
            H, W = self.height, self.width
        if self.accumulate_samples:
            gid = frame.pop("gid", None)  # integer G-buffer: never averaged
            if self._accum is None:
                self._accum = frame
                self._accum_count = 1
            else:
                self._accum = {k: a + frame[k] for k, a in self._accum.items()}
                self._accum_count += 1
            frame = {k: v / self._accum_count for k, v in self._accum.items()}
            if gid is not None:
                frame["gid"] = gid
        self._last_frame = frame  # G-buffer stash for inspect_pixel

        mode = RENDER_MODES[self.render_mode]
        if mode == "RGB":
            img = frame["rgb"]
            import jax.numpy as jnp
            img = np.asarray(tonemap(jnp.asarray(img * self.exposure)))
        elif mode == "Normals":
            n = frame["normal"]
            n = n / np.maximum(np.linalg.norm(n, axis=-1, keepdims=True), 1e-8)
            img = n * 0.5 + 0.5
        elif mode == "Depth":
            dmax = max(float(frame["depth"].max()), 1e-8)
            img = np.repeat(frame["depth"] / dmax, 3, -1)
        elif mode == "F0":
            img = frame["f0"] * self.exposure
        elif mode == "Roughness":
            img = np.repeat(frame["roughness"], 3, -1)
        else:  # Ellipsoids/Points: the preview colors ride the rgb channel
            img = frame["rgb"]
        return np.clip(img, 0.0, 1.0)

    # ------------------------------------------------------------------

    def compute_selection_masks(self, camera: MiniCam):
        """Point-and-click selection via one-hot diffuse renders
        (gaussian_viewer.py:292-321): render each object's selection as its
        diffuse color, threshold to get per-pixel object masks."""
        import jax
        import jax.numpy as jnp

        from ..renderer.raytracer import render_frame

        scene = self.gaussians.edited_scene()
        cam = camera_params(camera, znear=self.znear, zfar=self.zfar)
        for key, sel in self.gaussians.selections.items():
            if key == "everything":
                continue
            onehot = jnp.asarray(sel[:, None].astype(np.float32).repeat(3, 1))
            sel_scene = scene._replace(diffuse=onehot)
            _, final = render_frame(
                sel_scene, cam, self.settings, jax.random.PRNGKey(0),
                self.width, self.height, num_bounces=0,
                max_hits=self.cfg.max_hits, chunk=self.cfg.trace_chunk,
                tile=self.cfg.ray_tile, jitter=False,
            )
            img = np.asarray(final).reshape(self.height, self.width, 3)
            self.selection_masks[key] = img.mean(-1) > 0.5
        return self.selection_masks

    def object_at_pixel(self, x: int, y: int) -> Optional[str]:
        # in raster modes the hit-id G-buffer resolves the pick instantly
        # (no per-object mask renders needed) - the capability the GL
        # widget's commented-out out_id (ellipsoid_viewer.py:219) was for
        frame = getattr(self, "_last_frame", None)
        if frame is not None and "gid" in frame \
                and 0 <= y < self.height and 0 <= x < self.width:
            gid = int(frame["gid"][y, x, 0])
            if gid < 0:
                return None
            for key, sel in self.gaussians.selections.items():
                if key != "everything" and gid < len(sel) and sel[gid]:
                    return key
            return None
        for key, mask in self.selection_masks.items():
            if 0 <= y < mask.shape[0] and 0 <= x < mask.shape[1] and mask[y, x]:
                return key
        return None

    def inspect_pixel(self, x: int, y: int) -> Optional[dict]:
        """G-buffer values at a pixel of the LAST rendered frame - the
        PixelInspector widget analog (viewer/widgets/inspector.py)."""
        frame = getattr(self, "_last_frame", None)
        if frame is None or not (0 <= y < self.height and 0 <= x < self.width):
            return None
        out = {}
        for k, v in frame.items():
            val = v[y, x]
            out[k] = [round(float(c), 4) for c in np.atleast_1d(val)]
        return out

    def duplicate_object(self, name: str):
        self.gaussians.duplicate_object(name, DUPLICATION_OFFSET)
        self.__dict__.pop("_raw_centers", None)  # gizmo anchors changed

    def reset_edits(self):
        for k in self.gaussians.edits:
            self.gaussians.edits[k] = Edit()
        self.gaussians.is_dirty = True

    # serialization for the websocket protocol -------------------------

    def object_centers(self) -> dict:
        """World-space gizmo anchor per selectable object: raw xyz mean plus
        the edit's translation (scale/rotate pivot about the center, so only
        translate moves it - editable.py geometry semantics).  The client's
        3D transform gizmo draws here (the imguizmo placement,
        gaussian_viewer.py:620-789)."""
        if not hasattr(self, "_raw_centers"):
            xyz = np.asarray(self.gaussians.base.xyz)
            self._raw_centers = {}
            for key, sel in self.gaussians.selections.items():
                if key == "everything" or not np.any(sel):
                    continue
                self._raw_centers[key] = xyz[np.asarray(sel)].mean(0)
        out = {}
        for key, c in self._raw_centers.items():
            e = self.gaussians.edits.get(key)
            t = (np.array([e.translate_x, e.translate_y, e.translate_z])
                 if e is not None else 0.0)
            out[key] = (c + t).tolist()
        return out

    def _raster_frame(self, scene, camera, width, height, points=False):
        """Ellipsoids/Points preview via the screen-space instanced
        ellipsoid rasterizer (ops/ellipsoid_raster.py - the EllipsoidViewer
        / PointRenderer widget analogs, viewer/widgets/ellipsoid_viewer.py,
        point_renderer.py) instead of the ray tracer: one fused z-buffer
        pass, interactive at full resolution."""
        import jax
        import jax.numpy as jnp

        from ..ops.activations import sigmoid_act
        from ..ops.ellipsoid_raster import rasterize_ellipsoids

        n = scene.capacity
        if points:
            # every Gaussian as a small opaque isotropic sphere keeping its
            # diffuse color
            xyz = np.asarray(scene.xyz)
            extent = float(np.linalg.norm(xyz.max(0) - xyz.min(0))) or 1.0
            radius = max(0.004 * extent, 1e-4) * self.scaling_modifier
            radii = jnp.full((n, 3), radius, jnp.float32)
            colors = jnp.clip(scene.diffuse, 0.0, 1.0)
            alphas = jnp.ones((n,), jnp.float32)
        else:
            # per-Gaussian hash colors, widget half-axes
            # 2 * scale * modifier, sigmoid alphas clipped at the limit
            idx = np.arange(n, dtype=np.uint32)
            h = (idx * np.uint32(2654435761)) & np.uint32(0xFFFFFF)
            colors = jnp.asarray(np.stack([
                (h & 0xFF) / 255.0, ((h >> 8) & 0xFF) / 255.0,
                ((h >> 16) & 0xFF) / 255.0,
            ], -1).astype(np.float32))
            radii = 2.0 * jnp.exp(scene.scaling) * (
                self.ellipsoid_scale * self.scaling_modifier)
            alphas = sigmoid_act(scene.opacity)

        cam = camera_params(camera, znear=self.znear, zfar=self.zfar)
        global _raster_jit
        if _raster_jit is None:
            _raster_jit = jax.jit(
                rasterize_ellipsoids,
                static_argnames=("width", "height", "render_floaters",
                                 "max_per_tile", "tile", "select_chunk"))
        out = _raster_jit(
            scene.xyz, scene.rotation, radii, colors, alphas,
            scene.live_mask, cam.c2w, cam.origin, cam.fov_y,
            width=width, height=height, znear=self.znear, zfar=self.zfar,
            alpha_limit=jnp.float32(0.0 if points else self.ellipsoid_limit),
            render_floaters=bool(self.render_floaters) and not points)
        zeros = np.zeros((height, width, 3), np.float32)
        return dict(
            rgb=np.asarray(out.rgb),
            normal=np.asarray(out.normal),
            depth=np.asarray(out.depth)[..., None],
            f0=zeros,
            roughness=zeros[..., :1],
            gid=np.asarray(out.gid)[..., None],
        )

    def get_state(self) -> dict:
        return dict(
            object_centers=self.object_centers(),
            render_mode=self.render_mode,
            exposure=self.exposure,
            znear=self.znear,
            zfar=self.zfar,
            scaling_modifier=self.scaling_modifier,
            accumulate_samples=self.accumulate_samples,
            num_bounces=self.num_bounces,
            preview_scale=self.preview_scale,
            ellipsoid_limit=self.ellipsoid_limit,
            ellipsoid_scale=self.ellipsoid_scale,
            render_floaters=self.render_floaters,
            objects=list(self.gaussians.edits.keys()),
            edits={k: asdict(e) for k, e in self.gaussians.edits.items()},
            width=self.width,
            height=self.height,
            dataset_camera_names=[c["name"] for c in self.dataset_cameras],
        )

    def set_state(self, state: dict):
        for k in ("render_mode", "exposure", "znear", "zfar",
                  "scaling_modifier", "accumulate_samples", "num_bounces",
                  "preview_scale", "ellipsoid_limit", "ellipsoid_scale",
                  "render_floaters"):
            if k in state:
                setattr(self, k, state[k])
        for name, e in state.get("edits", {}).items():
            if name in self.gaussians.edits:
                cur = self.gaussians.edits[name]
                for field, val in e.items():
                    if isinstance(val, list):
                        val = tuple(val)
                    setattr(cur, field, val)
