"""render() facade - twin of reference renderer/gaussian_renderer.py:21-92.

Returns a SimpleNamespace with the same field names as the reference package
(rgb per-bounce, final, depth/normal/roughness/f0, targets), shaped
[S, 3, H, W] / [3, H, W] numpy - so eval tooling and the viewer consume it
unchanged in spirit.
"""

from __future__ import annotations

from types import SimpleNamespace

import jax
import jax.numpy as jnp
import numpy as np

from ..scene.gaussian_scene import GaussianScene
from .raytracer import (
    CameraParams,
    RenderSettings,
    fused_path_ok,
    render_frame,
    render_frame_fused,
)


def camera_params(camera, znear=0.01, zfar=999.9) -> CameraParams:
    origin, c2w, fovy, zn, zf = camera.render_pose(znear, zfar)
    return CameraParams(
        origin=jnp.asarray(origin),
        c2w=jnp.asarray(c2w),
        fov_y=jnp.asarray(fovy),
        znear=jnp.asarray(zn),
        zfar=jnp.asarray(zf),
    )


def default_backend_kwargs(cfg=None):
    """Pallas + culling when on TPU (mirrors training.use_pallas_backend)."""
    use_pallas = jax.default_backend() != "cpu"
    if cfg is not None and getattr(cfg, "backend", "auto") == "xla":
        use_pallas = False
    kw = dict(use_pallas=use_pallas)
    if use_pallas and (cfg is None or getattr(cfg, "cull", True)):
        kw.update(use_culling=True)
        if cfg is not None:
            kw.update(cull_tile=cfg.cull_tile, cull_cluster=cfg.cull_cluster,
                      max_clusters=cfg.max_clusters,
                      max_clusters_secondary=(
                          getattr(cfg, "max_clusters_secondary", 0) or None),
                      cull_tile_secondary=getattr(
                          cfg, "cull_tile_secondary", 256),
                      split_far=getattr(cfg, "split_far", False),
                      mc_far=getattr(cfg, "mc_far", 32),
                      max_hits_far=getattr(cfg, "max_hits_far", 0),
                      split_radius_scale=getattr(
                          cfg, "split_radius_scale", 1.5),
                      composite_mode=getattr(
                          cfg, "composite_mode", "kbuffer"))
    return kw


def dispatch_render_frame(scene, cam, settings, key, W, H, *, num_bounces=2,
                          max_hits=32, chunk=2048, tile=8192, jitter=True,
                          **backend_kwargs):
    """Route to the fully-fused whole-frame path when eligible.

    The fused path (one Pallas kernel per bounce, round-2 perf work) needs
    16x16 pixel tiling and a cluster-padded scene; anything else falls back
    to render_frame (which itself falls back from culled to brute)."""
    kw = dict(backend_kwargs)
    use_fused = kw.pop("use_fused", kw.get("use_pallas", False)
                       and kw.get("use_culling", False))
    cull_cluster = kw.get("cull_cluster", 256)
    # fused-path-only knobs: never forwarded to render_frame
    mc_secondary = kw.pop("max_clusters_secondary", None)
    tile_secondary = kw.pop("cull_tile_secondary", 256)
    split_far = kw.pop("split_far", False)
    mc_far = kw.pop("mc_far", 32)
    max_hits_far = kw.pop("max_hits_far", 0)
    split_radius_scale = kw.pop("split_radius_scale", 1.5)
    composite_mode = kw.pop("composite_mode", "kbuffer")
    kernel_stats = kw.pop("kernel_stats", True)
    attr_precision = kw.pop("attr_precision", "highest")
    if composite_mode not in ("kbuffer", "scan", "scanq"):
        raise ValueError(
            f"composite_mode={composite_mode!r}: expected 'kbuffer', "
            "'scan' or 'scanq' (a typo would otherwise silently render "
            "with the k-buffer kernels)")
    if use_fused and fused_path_ok(scene, W, H, cull_cluster,
                                   composite_mode):
        return render_frame_fused(
            scene, cam, settings, key, W, H,
            num_bounces=num_bounces, max_hits=max_hits, jitter=jitter,
            cull_cluster=cull_cluster,
            max_clusters=kw.get("max_clusters", 64),
            interpret=kw.get("interpret", False),
            max_clusters_secondary=mc_secondary,
            cull_tile_secondary=tile_secondary,
            split_far=split_far, mc_far=mc_far, max_hits_far=max_hits_far,
            split_radius_scale=split_radius_scale,
            composite_mode=composite_mode, kernel_stats=kernel_stats,
            attr_precision=attr_precision,
        )
    return render_frame(
        scene, cam, settings, key, W, H,
        num_bounces=num_bounces, max_hits=max_hits, chunk=chunk, tile=tile,
        jitter=jitter, **kw,
    )


def render(
    camera,
    scene: GaussianScene,
    settings: RenderSettings = RenderSettings(),
    key=None,
    num_bounces: int = 2,
    max_hits: int = 32,
    chunk: int = 2048,
    tile: int = 8192,
    jitter: bool = True,
    denoise: bool = False,
    znear: float = 0.01,
    zfar: float = 999.9,
    targets_available: bool = True,
    **backend_kwargs,
):
    if key is None:
        key = jax.random.PRNGKey(0)
    H, W = camera.image_height, camera.image_width
    cam = camera_params(camera, znear, zfar)
    steps, final = dispatch_render_frame(
        scene, cam, settings, key, W, H,
        num_bounces=num_bounces, max_hits=max_hits, chunk=chunk, tile=tile,
        jitter=jitter, **backend_kwargs,
    )

    def chw(a, ch=3):  # [S, R, C] -> [S, C, H, W]
        a = np.asarray(a)
        if a.ndim == 2:
            a = a[..., None]
        return a.reshape(a.shape[0], H, W, a.shape[-1]).transpose(0, 3, 1, 2)

    rgb = chw(steps.rgb)
    final_img = np.asarray(final).reshape(H, W, 3).transpose(2, 0, 1)
    if denoise:
        from .denoise import denoise_specular
        normal0 = np.asarray(steps.normal[0]).reshape(H, W, 3)
        depth0 = np.asarray(steps.depth[0]).reshape(H, W)
        rough0 = np.asarray(steps.roughness[0]).reshape(H, W)
        diffuse0 = np.asarray(steps.rgb[0]).reshape(H, W, 3)
        final_img = denoise_specular(
            final_img.transpose(1, 2, 0), diffuse0, normal0, depth0, rough0
        ).transpose(2, 0, 1)

    t = camera if targets_available else None

    def tgt(name):
        if t is None:
            return None
        img = getattr(t, name, None)
        return None if img is None else np.asarray(img).transpose(2, 0, 1)

    # fraction of (step, ray) slots STARVED by candidate-list overflow:
    # the tile overflowed max_clusters AND the ray was still accumulating
    # at list end (raytracer._starved; dropped hits are NOT
    # tail-corrected - culling.py); the train loop and render CLI log it
    # so silent hit loss is observable
    overflow_frac = float(np.asarray(steps.overflow).mean())
    return SimpleNamespace(
        rgb=rgb,
        final=final_img,
        overflow_frac=overflow_frac,
        depth=chw(steps.depth),
        normal=chw(steps.normal),
        roughness=chw(steps.roughness),
        f0=chw(steps.f0),
        transmittance=chw(steps.transmittance),
        target=tgt("original_image"),
        target_diffuse=tgt("diffuse_image"),
        target_specular=tgt("specular_image"),
        target_depth=tgt("depth_image"),
        target_normal=tgt("normal_image"),
        target_roughness=tgt("roughness_image"),
        target_f0=tgt("f0_image"),
    )
