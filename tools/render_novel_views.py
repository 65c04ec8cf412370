"""Spiral-path novel-view rendering - twin of reference tools/render_novel_views.py.

EnvGS-style spiral around the train cameras, SPP accumulation, and the
EnvGS-matched normal visualization (camera-space, flipped axes).
"""

from __future__ import annotations

import argparse
import os
import sys
from copy import deepcopy

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from editable_gaussian_reflections_tpu.config import load_model_config
from editable_gaussian_reflections_tpu.ops.tonemap import tonemap
from editable_gaussian_reflections_tpu.renderer.render import camera_params
from editable_gaussian_reflections_tpu.renderer.raytracer import render_accumulated
from editable_gaussian_reflections_tpu.scene.scene import (
    Scene,
    search_for_max_iteration,
)
from editable_gaussian_reflections_tpu.training import settings_from_config
from editable_gaussian_reflections_tpu.utils.cam_paths import generate_spiral_path
from editable_gaussian_reflections_tpu.utils.general import set_seeds
from editable_gaussian_reflections_tpu.utils.image import save_image


def _np_tonemap(x):
    import jax.numpy as jnp
    return np.asarray(tonemap(jnp.asarray(x, jnp.float32)))


def render_set(cli, cfg, cameras, scene_params, settings, save_dir):
    import jax

    for idx, camera in enumerate(cameras):
        H, W = camera.image_height, camera.image_width
        cam = camera_params(camera, znear=cli.znear, zfar=camera.zfar)
        from editable_gaussian_reflections_tpu.renderer.render import (
            default_backend_kwargs,
        )
        steps, final = render_accumulated(
            scene_params, cam, settings, jax.random.PRNGKey(idx), W, H,
            spp=cli.spp, num_bounces=2, max_hits=cfg.max_hits,
            chunk=cfg.trace_chunk, tile=cfg.ray_tile,
            **default_backend_kwargs(cfg),
        )
        final_img = np.asarray(final).reshape(H, W, 3)
        if cli.denoise:
            from editable_gaussian_reflections_tpu.renderer.denoise import (
                denoise_specular,
            )
            final_img = denoise_specular(
                final_img,
                np.asarray(steps.rgb[0]).reshape(H, W, 3),
                np.asarray(steps.normal[0]).reshape(H, W, 3),
                np.asarray(steps.depth[0]).reshape(H, W),
                np.asarray(steps.roughness[0]).reshape(H, W),
                spp=cli.spp,
            )

        rgb = np.asarray(steps.rgb).reshape(-1, H, W, 3)
        depth = np.asarray(steps.depth[0]).reshape(H, W)

        # EnvGS-matched normal viz (tools/render_novel_views.py:86-96)
        normal = np.asarray(steps.normal[0]).reshape(H, W, 3)
        normal = normal / np.maximum(
            np.linalg.norm(normal, axis=-1, keepdims=True), 1e-8)
        normal = np.einsum("ij,...j->...i", camera.R.T.astype(np.float32), normal)
        normal *= -1
        normal[..., 0] *= -1

        result = {
            "render": np.clip(_np_tonemap(final_img), 0, 1),
            "specular": np.clip(_np_tonemap(rgb[1:].sum(0)), 0, 1),
            "diffuse": np.clip(_np_tonemap(rgb[0]), 0, 1),
            "depth": depth / max(float(depth.max()), 1e-8),
            "normal": np.clip(normal * 0.5 + 0.5, 0, 1),
            "roughness": np.clip(np.asarray(steps.roughness[0]).reshape(H, W), 0, 1),
            "f0": np.clip(np.asarray(steps.f0[0]).reshape(H, W, 3), 0, 1),
        }
        for k, v in result.items():
            save_image(v, os.path.join(save_dir, k, f"{idx:05d}_{k}.png"))
        print(f"novel view {idx + 1}/{len(cameras)}")


def main(argv=None):
    p = argparse.ArgumentParser(prog="render_novel_views", allow_abbrev=False)
    p.add_argument("--model_path", "-m", required=True)
    p.add_argument("--iteration", type=int, default=None)
    p.add_argument("--spp", type=int, default=128)
    p.add_argument("--denoise", dest="denoise", action="store_true", default=True)
    p.add_argument("--no_denoise", dest="denoise", action="store_false")
    p.add_argument("--znear", type=float, default=1.0)
    p.add_argument("--n_views", type=int, default=300)
    cli, unknown = p.parse_known_args(argv)

    cfg = load_model_config(cli.model_path, unknown, prog="render_novel_views")
    iteration = cli.iteration or search_for_max_iteration(
        os.path.join(cli.model_path, "point_cloud"))
    print(f"Loading trained model at iteration {iteration}")
    set_seeds()

    scene = Scene(cfg, load_iteration=iteration, shuffle=False,
                  model_path=cli.model_path)
    views = scene.getTrainCameras()

    c2ws = []
    for view in views:
        w2c = np.eye(4)
        w2c[:3, :3] = view.R.T
        w2c[:3, 3] = view.T
        c2ws.append(np.linalg.inv(w2c))
    spiral = generate_spiral_path(np.array(c2ws), n_render_views=cli.n_views)
    spiral = np.concatenate(
        [spiral, np.repeat(np.array([[[0.0, 0.0, 0.0, 1.0]]]),
                           len(spiral), axis=0)], axis=1)

    cameras = []
    for c2w in spiral:
        camera = deepcopy(views[0])
        w2c = np.linalg.inv(c2w)
        camera.R = np.transpose(w2c[:3, :3])
        camera.T = w2c[:3, 3]
        camera.update()
        cameras.append(camera)
    if cfg.max_images is not None:
        cameras = cameras[:cfg.max_images]

    save_dir = os.path.join(cfg.model_path, "novel_views", f"ours_{iteration}")
    render_set(cli, cfg, cameras, scene.gaussians,
               settings_from_config(cfg), save_dir)


if __name__ == "__main__":
    main()
