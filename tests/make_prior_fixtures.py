"""Synthetic fixtures for the prior-prediction dataset pipelines.

Builds tiny on-disk scenes in the exact layouts the prior datasets consume
(reference dataset/blender_prior_dataset.py + colmap_prior_dataset.py):
a COLMAP sparse/0 (binary) with points lying on a known depth ramp, plus the
7 prior buffers as PNGs (8-bit RGB for color, 16-bit gray for scalar maps).

The monocular depth buffer is written pre-descaled (mono = (z + 0.8) / 8) so
the RANSAC linear fit against the projected sparse COLMAP depth must recover
a=8, b=-0.8 for the returned distance image to be correct - i.e. the tests
fail if the rescale path doesn't execute.
"""

from __future__ import annotations

import json
import os
import struct

import numpy as np

# the known depth->mono transform the RANSAC fit has to invert
DEPTH_A = 8.0
DEPTH_B = -0.8


def rotmat2qvec(R):
    """Rotation matrix -> COLMAP qvec (w, x, y, z)."""
    Rxx, Ryx, Rzx, Rxy, Ryy, Rzy, Rxz, Ryz, Rzz = R.flat
    K = np.array([
        [Rxx - Ryy - Rzz, 0, 0, 0],
        [Ryx + Rxy, Ryy - Rxx - Rzz, 0, 0],
        [Rzx + Rxz, Rzy + Ryz, Rzz - Rxx - Ryy, 0],
        [Ryz - Rzy, Rzx - Rxz, Rxy - Ryx, Rxx + Ryy + Rzz],
    ]) / 3.0
    vals, vecs = np.linalg.eigh(K)
    q = vecs[[3, 0, 1, 2], np.argmax(vals)]
    if q[0] < 0:
        q = -q
    return q


def true_depth(size: int) -> np.ndarray:
    """Per-pixel z-depth ramp: 3 -> 5 left-to-right (never degenerate for a
    linear fit)."""
    u = np.arange(size, dtype=np.float64)
    return np.broadcast_to(3.0 + 2.0 * u / (size - 1), (size, size)).copy()


def _save_rgb8(path, arr):
    from PIL import Image
    a = np.clip(arr, 0, 1)
    Image.fromarray((a * 255).round().astype(np.uint8)).save(path)


def _save_gray16(path, arr):
    from PIL import Image
    a = np.clip(arr, 0, 1)
    Image.fromarray((a * (2**16 - 1)).round().astype(np.uint16)).save(path)


def _sample_scene(size, n_frames, pts_per_frame, fov, seed=0):
    """Cameras on an x-offset line (COLMAP w2c R=I), world points on each
    camera's depth ramp.  Returns (centers, world points per frame, pixel
    coords per frame)."""
    rng = np.random.default_rng(seed)
    fx = size / (2 * np.tan(fov / 2))
    cx = cy = size / 2
    D = true_depth(size)
    centers, pts_w, pix = [], [], []
    for i in range(n_frames):
        center = np.array([0.15 * i, 0.0, 0.0])
        u = rng.integers(2, size - 2, pts_per_frame)
        v = rng.integers(2, size - 2, pts_per_frame)
        z = D[v, u]
        pc = np.stack([(u - cx) * z / fx, (v - cy) * z / fy_eq(fx), z], -1)
        pts_w.append(pc + center)  # R = I: world = cam + center
        centers.append(center)
        pix.append(np.stack([u, v], -1))
    return np.array(centers), pts_w, pix


def fy_eq(fx):
    return fx  # square pixels everywhere in the fixtures


def _write_colmap(sparse_dir, centers, pts_w, pix, image_names, size, fov):
    os.makedirs(sparse_dir, exist_ok=True)
    fx = size / (2 * np.tan(fov / 2))
    with open(os.path.join(sparse_dir, "cameras.bin"), "wb") as f:
        f.write(struct.pack("<Q", 1))
        f.write(struct.pack("<iiQQ", 1, 1, size, size))  # PINHOLE
        f.write(struct.pack("<4d", fx, fx, size / 2, size / 2))

    n_frames = len(centers)
    ppf = pts_w[0].shape[0]
    with open(os.path.join(sparse_dir, "images.bin"), "wb") as f:
        f.write(struct.pack("<Q", n_frames))
        for i in range(n_frames):
            qvec = rotmat2qvec(np.eye(3))
            tvec = -centers[i]  # w2c: x_cam = R x_w + t, R = I
            f.write(struct.pack("<i", i + 1))
            f.write(struct.pack("<4d", *qvec))
            f.write(struct.pack("<3d", *tvec))
            f.write(struct.pack("<i", 1))
            f.write(image_names[i].encode() + b"\x00")
            f.write(struct.pack("<Q", ppf))
            for j in range(ppf):
                pid = i * ppf + j + 1
                f.write(struct.pack("<ddq", float(pix[i][j, 0]),
                                    float(pix[i][j, 1]), pid))

    with open(os.path.join(sparse_dir, "points3D.bin"), "wb") as f:
        f.write(struct.pack("<Q", n_frames * ppf))
        for i in range(n_frames):
            for j in range(ppf):
                pid = i * ppf + j + 1
                f.write(struct.pack("<Q", pid))
                f.write(struct.pack("<3d", *pts_w[i][j]))
                f.write(struct.pack("<3B", 128, 128, 128))
                f.write(struct.pack("<d", 0.1))
                f.write(struct.pack("<Q", 1))
                f.write(struct.pack("<ii", i + 1, j))


def _write_buffers(buf_dir, frame_id, size, rng):
    """The 7 prior buffers for one frame. frame_id is the filename suffix."""
    os.makedirs(buf_dir, exist_ok=True)
    D = true_depth(size)
    mono = (D - DEPTH_B) / DEPTH_A  # what the RANSAC fit must invert
    img = rng.uniform(0.1, 0.9, (size, size, 3))
    n_cam = np.zeros((size, size, 3))
    n_cam[..., 2] = 1.0
    bufs = {
        "render": (img, _save_rgb8),
        "diffuse": (img * 0.8, _save_rgb8),
        "specular": (img * 0.1, _save_rgb8),
        "roughness": (np.full((size, size), 0.5), _save_gray16),
        "metalness": (np.full((size, size), 0.3), _save_gray16),
        "depth": (mono, _save_gray16),
        "normal": (n_cam * 0.5 + 0.5, _save_rgb8),
    }
    for name, (arr, save) in bufs.items():
        d = os.path.join(buf_dir, name)
        os.makedirs(d, exist_ok=True)
        save(os.path.join(d, f"{name}_{frame_id}.png"), arr)


def make_blender_prior_dataset(out_dir, size=32, n_train=3, n_test=1,
                               pts_per_frame=25, fov=0.9, seed=0):
    """Blender-prior layout: transforms_{split}.json + {split}/{buf}/... +
    sparse/0 (triggers the BlenderPriorDataset dispatch)."""
    rng = np.random.default_rng(seed)
    n = n_train + n_test
    centers, pts_w, pix = _sample_scene(size, n, pts_per_frame, fov, seed)
    image_names = [f"r_{i:03d}.png" for i in range(n)]
    _write_colmap(os.path.join(out_dir, "sparse", "0"),
                  centers, pts_w, pix, image_names, size, fov)

    for split, lo, cnt in (("train", 0, n_train), ("test", n_train, n_test)):
        frames = []
        for k in range(cnt):
            i = lo + k
            frame_id = f"{i:03d}"
            _write_buffers(os.path.join(out_dir, split), frame_id, size, rng)
            # blender c2w: flip cols 1:3 of the COLMAP c2w (involutive)
            c2w = np.eye(4)
            c2w[:3, 3] = centers[i]
            c2w[:3, 1:3] *= -1
            frames.append({"file_path": f"{split}/r_{frame_id}",
                           "transform_matrix": c2w.tolist()})
        with open(os.path.join(out_dir, f"transforms_{split}.json"), "w") as f:
            json.dump({"camera_angle_x": fov, "camera_angle_y": fov,
                       "frames": frames}, f)

    # init point cloud for readSceneInfo / training
    allp = np.concatenate(pts_w).astype(np.float32)
    cols = np.full_like(allp, 0.5)
    from editable_gaussian_reflections_tpu.utils.ply import save_xyzrgb_ply
    save_xyzrgb_ply(os.path.join(out_dir, "point_cloud_dense.ply"), allp, cols)
    return out_dir


def make_colmap_prior_dataset(out_dir, size=32, n_frames=9,
                              pts_per_frame=25, fov=0.9, seed=0):
    """Colmap-prior layout: priors/{buf}/... + sparse/0 (priors/ dir triggers
    the ColmapPriorDataset dispatch; llffhold=8 split)."""
    rng = np.random.default_rng(seed)
    centers, pts_w, pix = _sample_scene(size, n_frames, pts_per_frame, fov,
                                        seed)
    image_names = [f"f_{i:03d}.jpg" for i in range(n_frames)]
    _write_colmap(os.path.join(out_dir, "sparse", "0"),
                  centers, pts_w, pix, image_names, size, fov)
    for i in range(n_frames):
        _write_buffers(os.path.join(out_dir, "priors"), f"f_{i:03d}",
                       size, rng)

    allp = np.concatenate(pts_w).astype(np.float32)
    cols = np.full_like(allp, 0.5)
    from editable_gaussian_reflections_tpu.utils.ply import save_xyzrgb_ply
    save_xyzrgb_ply(os.path.join(out_dir, "point_cloud_dense.ply"), allp, cols)
    return out_dir
