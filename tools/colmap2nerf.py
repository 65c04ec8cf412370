"""COLMAP -> transforms.json converter (instant-ngp style).

Twin of reference tools/colmap2nerf.py (used by scripts/transforms_from_colmap.sh):
reads a COLMAP sparse reconstruction with the pure-python loaders and writes
transforms.json with camera_angle_x and per-frame c2w matrices in the
OpenGL/Blender convention the Blender datasets expect.

Also covers the reference's capture front-end (tools/colmap2nerf.py:1-465):
--video extracts frames at --video_fps via ffmpeg, and --sharpen_percent
culls the blurriest frames by variance-of-Laplacian sharpness before they go
to COLMAP.
"""

from __future__ import annotations

import argparse
import json
import math
import os
import shutil
import subprocess
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from editable_gaussian_reflections_tpu.dataset.colmap_loader import (
    qvec2rotmat,
    read_model,
)


def sharpness(image_path) -> float:
    """Variance of the Laplacian (the reference's blur metric)."""
    try:
        import cv2
        img = cv2.imread(image_path, cv2.IMREAD_GRAYSCALE)
        if img is None:
            return 0.0
        return float(cv2.Laplacian(img, cv2.CV_64F).var())
    except ImportError:
        from PIL import Image
        g = np.asarray(Image.open(image_path).convert("L"), np.float32)
        lap = (-4 * g[1:-1, 1:-1] + g[:-2, 1:-1] + g[2:, 1:-1]
               + g[1:-1, :-2] + g[1:-1, 2:])
        return float(lap.var())


def extract_video_frames(video: str, out_dir: str, fps: float) -> int:
    """ffmpeg frame extraction (reference run_ffmpeg equivalent)."""
    if shutil.which("ffmpeg") is None:
        raise RuntimeError("ffmpeg not found on PATH (needed for --video)")
    os.makedirs(out_dir, exist_ok=True)
    subprocess.run(
        ["ffmpeg", "-y", "-i", video, "-qscale:v", "1", "-qmin", "1",
         "-vf", f"fps={fps}", os.path.join(out_dir, "%04d.jpg")],
        check=True, capture_output=True,
    )
    return len([f for f in os.listdir(out_dir) if f.endswith(".jpg")])


def cull_blurry(images_dir: str, keep_percent: float) -> int:
    """Delete the blurriest (100 - keep_percent)% of frames."""
    files = sorted(
        f for f in os.listdir(images_dir)
        if f.lower().endswith((".jpg", ".jpeg", ".png")))
    scored = [(sharpness(os.path.join(images_dir, f)), f) for f in files]
    scored.sort(reverse=True)
    keep = max(1, int(len(scored) * keep_percent / 100.0))
    removed = 0
    for _, f in scored[keep:]:
        os.remove(os.path.join(images_dir, f))
        removed += 1
    return removed


def main(argv=None):
    p = argparse.ArgumentParser(prog="colmap2nerf", allow_abbrev=False)
    p.add_argument("--colmap_path", required=False, default=None,
                   help="dir containing sparse/0 (or the sparse dir itself)")
    p.add_argument("--images", default="images")
    p.add_argument("--out", default="transforms.json")
    p.add_argument("--aabb_scale", type=int, default=16)
    p.add_argument("--video", default=None,
                   help="extract frames from this video into --images first")
    p.add_argument("--video_fps", type=float, default=2.0)
    p.add_argument("--sharpen_percent", type=float, default=None,
                   help="keep only this percent of sharpest frames")
    args = p.parse_args(argv)

    if args.video:
        n = extract_video_frames(args.video, args.images, args.video_fps)
        print(f"extracted {n} frames from {args.video} @ {args.video_fps} fps")
    if args.sharpen_percent is not None:
        removed = cull_blurry(args.images, args.sharpen_percent)
        print(f"culled {removed} blurry frames "
              f"(kept sharpest {args.sharpen_percent}%)")
    if args.colmap_path is None:
        if args.video or args.sharpen_percent is not None:
            print("no --colmap_path given - frames prepared, run COLMAP "
                  "then re-invoke with --colmap_path")
            return
        p.error("--colmap_path is required (unless only preparing frames)")

    sparse = args.colmap_path
    for sub in ("sparse/0", "sparse"):
        cand = os.path.join(args.colmap_path, sub)
        if os.path.isdir(cand):
            sparse = cand
            break
    cams, images, _pts = read_model(sparse)

    cam = next(iter(cams.values()))
    w, h = cam.width, cam.height
    if cam.model in ("SIMPLE_PINHOLE", "SIMPLE_RADIAL", "RADIAL"):
        fl_x = fl_y = cam.params[0]
    else:
        fl_x, fl_y = cam.params[0], cam.params[1]
    angle_x = 2 * math.atan(w / (2 * fl_x))
    angle_y = 2 * math.atan(h / (2 * fl_y))

    frames = []
    for img in sorted(images.values(), key=lambda im: im.name):
        R = qvec2rotmat(img.qvec)
        t = img.tvec.reshape(3, 1)
        w2c = np.concatenate([np.concatenate([R, t], 1),
                              [[0, 0, 0, 1]]], 0)
        c2w = np.linalg.inv(w2c)
        # COLMAP (y down, z forward) -> OpenGL/Blender (y up, z back)
        c2w[0:3, 1:3] *= -1
        frames.append({
            "file_path": os.path.join(args.images, img.name),
            "transform_matrix": c2w.tolist(),
        })

    out = {
        "camera_angle_x": angle_x,
        "camera_angle_y": angle_y,
        "fl_x": float(fl_x), "fl_y": float(fl_y),
        "w": int(w), "h": int(h),
        "cx": w / 2, "cy": h / 2,
        "aabb_scale": args.aabb_scale,
        "frames": frames,
    }
    with open(args.out, "w") as f:
        json.dump(out, f, indent=2)
    print(f"wrote {args.out} with {len(frames)} frames")


if __name__ == "__main__":
    main()
