"""COLMAP -> transforms.json converter (instant-ngp style).

Twin of reference tools/colmap2nerf.py (used by scripts/transforms_from_colmap.sh):
reads a COLMAP sparse reconstruction with the pure-python loaders and writes
transforms.json with camera_angle_x and per-frame c2w matrices in the
OpenGL/Blender convention the Blender datasets expect.
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from editable_gaussian_reflections_tpu.dataset.colmap_loader import (
    qvec2rotmat,
    read_model,
)


def main(argv=None):
    p = argparse.ArgumentParser(prog="colmap2nerf", allow_abbrev=False)
    p.add_argument("--colmap_path", required=True,
                   help="dir containing sparse/0 (or the sparse dir itself)")
    p.add_argument("--images", default="images")
    p.add_argument("--out", default="transforms.json")
    p.add_argument("--aabb_scale", type=int, default=16)
    args = p.parse_args(argv)

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
