"""Convert raw Blender multi-pass renders into the dataset layout.

Twin of reference tools/blender_renders_to_dataset.py: takes a directory of
Blender EXR multi-pass renders + transforms json and writes the per-buffer
files (render/diffuse/specular/roughness/normal/depth/f0) at the requested
bit depth (png 8-bit, tiff 32-bit float, exr passthrough).
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("OPENCV_IO_ENABLE_OPENEXR", "1")

BUFFER_CHANNELS = {
    # Blender pass name -> dataset buffer name
    "Image": "render",
    "DiffCol": "diffuse",
    "GlossCol": "specular",
    "Roughness": "roughness",
    "Normal": "normal",
    "Depth": "depth",
    "F0": "f0",
}


def _read_multilayer_exr(path):
    import cv2
    img = cv2.imread(path, cv2.IMREAD_UNCHANGED)
    if img is None:
        raise IOError(path)
    if img.ndim == 3 and img.shape[-1] >= 3:
        img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
    return np.asarray(img, np.float32)


def _write(path, arr, bits):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    if bits == 8:
        from PIL import Image
        a = np.clip(arr, 0, 1)
        if a.ndim == 2:
            a = a[..., None].repeat(3, -1)
        Image.fromarray((a * 255).astype(np.uint8)).save(path + ".png")
    elif bits == 32:
        import imageio.v3 as iio
        iio.imwrite(path + ".tiff", arr.astype(np.float32))
    else:
        raise ValueError(f"unsupported bit depth {bits}")


def main(argv=None):
    p = argparse.ArgumentParser(prog="blender_renders_to_dataset",
                                allow_abbrev=False)
    p.add_argument("--input_dir", required=True,
                   help="dir of per-frame per-pass EXRs named "
                        "{pass}_{frame:04d}.exr")
    p.add_argument("--output_dir", required=True)
    p.add_argument("--split", default="train")
    p.add_argument("--bits", type=int, default=8,
                   help="8 (png) or 32 (float tiff); depth always 32")
    args = p.parse_args(argv)

    tj = os.path.join(args.input_dir, f"transforms_{args.split}.json")
    if os.path.exists(tj):
        shutil.copyfile(
            tj, os.path.join(args.output_dir, f"transforms_{args.split}.json"))
        with open(tj) as f:
            frames = json.load(f)["frames"]
    else:
        frames = None

    os.makedirs(args.output_dir, exist_ok=True)
    count = 0
    for fn in sorted(os.listdir(args.input_dir)):
        if not fn.endswith(".exr"):
            continue
        stem = fn[:-4]
        parts = stem.rsplit("_", 1)
        if len(parts) != 2:
            continue
        pass_name, frame_id = parts
        buffer = BUFFER_CHANNELS.get(pass_name, pass_name.lower())
        arr = _read_multilayer_exr(os.path.join(args.input_dir, fn))
        out_stem = os.path.join(args.output_dir,
                                f"{args.split}_{buffer}_{frame_id}")
        bits = 32 if buffer == "depth" else args.bits
        _write(out_stem, arr, bits)
        count += 1
    print(f"converted {count} buffers -> {args.output_dir}")


if __name__ == "__main__":
    main()
