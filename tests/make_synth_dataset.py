"""Generate a tiny synthetic Blender-format dataset for end-to-end tests.

Writes transforms_{train,test}.json + per-frame EXR-free PNG/TIFF-free
buffers (PNG via PIL for uint8 buffers, .npy is not in the reference's
fallback chain, so we write 16-bit PNGs where HDR is needed... the loader's
fallback chain is exr -> tiff -> png; we write PNGs) and
point_cloud_dense.ply.  The scene is a handful of emissive Gaussian blobs
rendered analytically as soft discs - enough to exercise dataset loading,
Scene setup, and a few training iterations.
"""

from __future__ import annotations

import json
import os

import numpy as np


def look_at_c2w(eye, target=np.zeros(3), up=np.array([0.0, 0.0, 1.0])):
    """OpenGL/Blender convention c2w (camera looks down -Z)."""
    f = target - eye
    f = f / np.linalg.norm(f)
    r = np.cross(f, up)
    r = r / np.linalg.norm(r)
    u = np.cross(r, f)
    c2w = np.eye(4)
    c2w[:3, 0] = r
    c2w[:3, 1] = u
    c2w[:3, 2] = -f
    c2w[:3, 3] = eye
    return c2w


def make_dataset(out_dir: str, size: int = 32, n_train: int = 4,
                 n_test: int = 2, n_points: int = 200, seed: int = 0):
    from PIL import Image

    rng = np.random.default_rng(seed)
    os.makedirs(out_dir, exist_ok=True)

    # world: colored blobs around origin at z in [4, 6]
    centers = rng.uniform(-1, 1, (5, 3)).astype(np.float32)
    colors = rng.uniform(0.2, 1.0, (5, 3)).astype(np.float32)

    def render_view(c2w, w, h, fovx):
        """Analytic soft-disc render + buffers (approximate, just plausible)."""
        fx = w / (2 * np.tan(fovx / 2))
        K = np.array([[fx, 0, w / 2], [0, fx, h / 2], [0, 0, 1]])
        w2c = np.linalg.inv(c2w)
        img = np.zeros((h, w, 3), np.float32)
        depth = np.full((h, w), 8.0, np.float32)
        normal = np.zeros((h, w, 3), np.float32)
        normal[..., 2] = -1.0
        for c, col in zip(centers, colors):
            pc = (w2c[:3, :3] @ c + w2c[:3, 3])
            # COLMAP-style: +z forward after the blender flip below; here c2w
            # is OpenGL so camera looks down -z
            z = -pc[2]
            if z <= 0.1:
                continue
            uv = np.array([fx * pc[0] / z + w / 2, -fx * pc[1] / z + h / 2])
            yy, xx = np.mgrid[0:h, 0:w]
            d2 = (xx - uv[0]) ** 2 + (yy - uv[1]) ** 2
            sigma = 0.06 * fx / z * 4
            wgt = np.exp(-d2 / (2 * sigma**2))
            img += wgt[..., None] * col[None, None]
            depth = np.where(wgt > 0.5, z, depth)
        return img, depth, normal

    def write_frames(split, n, offset):
        frames = []
        for i in range(n):
            ang = 2 * np.pi * (i + offset) / (n_train + n_test)
            eye = np.array([3.5 * np.cos(ang), 3.5 * np.sin(ang), 1.2])
            c2w = look_at_c2w(eye)
            fovx = 0.9
            img, depth, normal = render_view(c2w, size, size, fovx)

            name = f"{split}_render_{i:03d}"
            frames.append({
                "file_path": name,
                "transform_matrix": c2w.tolist(),
            })

            def save_png(arr, buffer):
                fn = os.path.join(out_dir, name.replace("render", buffer) + ".png")
                a = np.clip(arr, 0, 1)
                if a.ndim == 2:
                    a = a[..., None].repeat(3, -1)
                Image.fromarray((a * 255).astype(np.uint8)).save(fn)

            # render/diffuse/specular are untonemapped by the loader for
            # uint8; store tonemapped-ish values in [0,1]
            save_png(img * 0.8, "render")
            save_png(img * 0.8, "diffuse")
            save_png(np.zeros_like(img), "specular")
            save_png(np.full_like(img[..., 0], 0.5), "roughness")
            save_png(normal * 0.5 + 0.5, "normal")
            # depth must not be uint8 (the reference asserts) - write .tiff?
            # loader chain: exr -> tiff -> png. Write float tiff via imageio.
            import imageio.v3 as iio
            iio.imwrite(
                os.path.join(out_dir, name.replace("render", "depth") + ".tiff"),
                depth.astype(np.float32),
            )
            save_png(np.full_like(img, 0.04), "f0")
        with open(os.path.join(out_dir, f"transforms_{split}.json"), "w") as f:
            json.dump({"camera_angle_x": fovx, "frames": frames}, f)

    write_frames("train", n_train, 0)
    write_frames("test", n_test, n_train)

    # init point cloud near the blobs
    pts = (centers[rng.integers(0, 5, n_points)]
           + rng.normal(0, 0.3, (n_points, 3))).astype(np.float32)
    cols = colors[rng.integers(0, 5, n_points)].astype(np.float32)
    from editable_gaussian_reflections_tpu.utils.ply import save_xyzrgb_ply
    save_xyzrgb_ply(os.path.join(out_dir, "point_cloud_dense.ply"), pts, cols)
    return out_dir


if __name__ == "__main__":
    import sys
    make_dataset(sys.argv[1] if len(sys.argv) > 1 else "/tmp/synth_scene")
    print("dataset written")
