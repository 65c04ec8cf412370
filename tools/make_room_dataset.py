"""Render the synthetic room scene into a Blender-format dataset.

Produces the full 7-buffer G-buffer stack (render/diffuse/specular/depth/
normal/roughness/f0) by rendering utils/synth.room_scene with this
framework's own renderer - a self-contained stand-in for the shiny_* scenes
when the real datasets aren't available, and the basis for the
fit-your-own-renders regression (train from scratch against these targets
and PSNR must climb).

HDR buffers are written as float32 TIFFs (the dataset loader's second
fallback), so no tonemap round-trip is involved.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def look_at_blender_c2w(eye, target):
    fwd = target - eye
    fwd = fwd / np.linalg.norm(fwd)
    up = np.array([0.0, 0.0, 1.0])
    right = np.cross(fwd, up)
    right = right / np.linalg.norm(right)
    u = np.cross(right, fwd)
    c2w = np.eye(4)
    c2w[:3, 0] = right
    c2w[:3, 1] = u
    c2w[:3, 2] = -fwd     # OpenGL: camera looks down -z
    c2w[:3, 3] = eye
    return c2w


def main(argv=None):
    import imageio.v3 as iio
    import jax
    import jax.numpy as jnp

    from editable_gaussian_reflections_tpu.renderer.raytracer import (
        CameraParams,
        RenderSettings,
        fused_path_ok,
        render_accumulated,
        render_accumulated_fused,
    )
    from editable_gaussian_reflections_tpu.scene.gaussian_scene import from_arrays
    from editable_gaussian_reflections_tpu.scene.scene import save_scene_ply
    from editable_gaussian_reflections_tpu.utils.ply import save_xyzrgb_ply
    from editable_gaussian_reflections_tpu.utils.synth import room_scene

    p = argparse.ArgumentParser(prog="make_room_dataset", allow_abbrev=False)
    p.add_argument("--out", default="/tmp/room_dataset")
    p.add_argument("--size", type=int, default=128)
    p.add_argument("--n_gaussians", type=int, default=20000)
    p.add_argument("--n_train", type=int, default=10)
    p.add_argument("--n_test", type=int, default=2)
    p.add_argument("--spp", type=int, default=4)
    p.add_argument("--extent", type=float, default=3.0)
    args = p.parse_args(argv)

    arrs = room_scene(args.n_gaussians, extent=args.extent,
                      farfield_fraction=0.25)
    scene = from_arrays(**arrs, pad_multiple=2048)
    settings = RenderSettings()
    os.makedirs(args.out, exist_ok=True)
    save_scene_ply(os.path.join(args.out, "gt_scene.ply"), scene)

    target = np.array([0.0, 0.0, args.extent * 0.75])
    use_pallas = jax.default_backend() != "cpu"

    def render_split(split, count, offset):
        frames = []
        for i in range(count):
            ang = 2 * np.pi * (i + offset) / (args.n_train + args.n_test)
            eye = np.array([
                args.extent * 0.7 * np.cos(ang),
                args.extent * 0.7 * np.sin(ang),
                args.extent * (0.6 + 0.3 * ((i + offset) % 3) / 2),
            ])
            c2w = look_at_blender_c2w(eye, target)
            # the OpenGL/Blender c2w IS the renderer's convention
            # (dir = c2w @ [x, y_up, -1]); the dataset loader's
            # GL->COLMAP->render_pose round trip reconstructs exactly it
            cam = CameraParams(
                origin=jnp.asarray(eye, jnp.float32),
                c2w=jnp.asarray(c2w[:3, :3], jnp.float32),
                fov_y=jnp.asarray(0.9),
                znear=jnp.asarray(0.05),
                zfar=jnp.asarray(50.0),
            )
            if use_pallas and fused_path_ok(scene, args.size, args.size, 128):
                steps, final = render_accumulated_fused(
                    scene, cam, settings,
                    jax.random.PRNGKey(1000 + i + offset),
                    args.size, args.size, spp=args.spp, num_bounces=2,
                    max_hits=32, cull_cluster=128, max_clusters=192,
                )
            else:
                steps, final = render_accumulated(
                    scene, cam, settings,
                    jax.random.PRNGKey(1000 + i + offset),
                    args.size, args.size, spp=args.spp, num_bounces=2,
                    max_hits=32, chunk=2048, tile=8192,
                    use_pallas=use_pallas,
                )
            H = W = args.size
            bufs = {
                "render": np.asarray(final).reshape(H, W, 3),
                "diffuse": np.asarray(steps.rgb[0]).reshape(H, W, 3),
                "specular": np.asarray(steps.rgb[1:].sum(0)).reshape(H, W, 3),
                "depth": np.asarray(steps.depth[0]).reshape(H, W),
                "normal": np.asarray(steps.normal[0]).reshape(H, W, 3),
                "roughness": np.asarray(steps.roughness[0]).reshape(H, W),
                "f0": np.asarray(steps.f0[0]).reshape(H, W, 3),
            }
            name = f"{split}_render_{i:03d}"
            for buf, arr in bufs.items():
                iio.imwrite(
                    os.path.join(args.out,
                                 name.replace("render", buf) + ".tiff"),
                    arr.astype(np.float32),
                )
            frames.append({"file_path": name,
                           "transform_matrix": c2w.tolist()})
            print(f"rendered {split} {i + 1}/{count}")
        with open(os.path.join(args.out, f"transforms_{split}.json"), "w") as f:
            json.dump({"camera_angle_x": 0.9, "camera_angle_y": 0.9,
                       "frames": frames}, f)

    render_split("train", args.n_train, 0)
    render_split("test", args.n_test, args.n_train)

    # init point cloud: jittered GT means (the dense-init analog)
    rng = np.random.default_rng(0)
    n_init = min(args.n_gaussians, 120000)
    idx = rng.permutation(args.n_gaussians)[:n_init]
    pts = arrs["xyz"][idx] + rng.normal(0, 0.02, (n_init, 3)).astype(np.float32)
    cols = np.clip(arrs["diffuse"][idx], 0, 1)
    save_xyzrgb_ply(os.path.join(args.out, "point_cloud_dense.ply"), pts, cols)
    print(f"dataset written -> {args.out}")


if __name__ == "__main__":
    main()
