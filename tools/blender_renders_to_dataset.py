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
    if path.endswith((".tiff", ".tif")):
        import imageio.v3 as iio
        return np.asarray(iio.imread(path), np.float32)
    import cv2
    img = cv2.imread(path, cv2.IMREAD_UNCHANGED)
    if img is None:
        raise IOError(
            f"{path}: unreadable (this OpenCV build may lack the EXR codec; "
            "re-render to float TIFF or install opencv with OpenEXR)")
    if img.ndim == 3 and img.shape[-1] >= 3:
        img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
    return np.asarray(img, np.float32)


def _write(path, arr, bits, fmt="auto"):
    """Write one buffer in the requested format x precision (the reference's
    format matrix, tools/blender_renders_to_dataset.py:27-42: png 8/16-bit,
    tiff 16/32-bit float, exr 16/32-bit float, safetensors packed)."""
    os.makedirs(os.path.dirname(path), exist_ok=True)
    if fmt == "auto":
        fmt = "png" if bits == 8 else "tiff"
    if fmt == "png":
        a = np.clip(arr, 0, 1)
        if a.ndim == 2:
            a = a[..., None].repeat(3, -1)
        if bits == 16:
            import cv2
            bgr = cv2.cvtColor((a * 65535).astype(np.uint16),
                               cv2.COLOR_RGB2BGR)
            cv2.imwrite(path + ".png", bgr)
        else:
            from PIL import Image
            Image.fromarray((a * 255).astype(np.uint8)).save(path + ".png")
    elif fmt == "tiff":
        import imageio.v3 as iio
        dt = np.float16 if bits == 16 else np.float32
        iio.imwrite(path + ".tiff", arr.astype(dt))
    elif fmt == "exr":
        import cv2
        a = arr.astype(np.float32)
        if a.ndim == 3 and a.shape[-1] == 3:
            a = cv2.cvtColor(a, cv2.COLOR_RGB2BGR)
        if not cv2.imwrite(path + ".exr", a):
            raise RuntimeError(
                "this OpenCV build lacks the EXR writer; use --format tiff")
    else:
        raise ValueError(f"unsupported format {fmt}")


def main(argv=None):
    p = argparse.ArgumentParser(prog="blender_renders_to_dataset",
                                allow_abbrev=False)
    p.add_argument("--input_dir", required=True,
                   help="dir of per-frame per-pass EXRs named "
                        "{pass}_{frame:04d}.exr")
    p.add_argument("--output_dir", required=True)
    p.add_argument("--split", default="train")
    p.add_argument("--bits", type=int, default=8, choices=(8, 16, 32),
                   help="sample precision; depth is always written float")
    p.add_argument("--format", default="auto",
                   choices=("auto", "png", "tiff", "exr", "safetensors"),
                   help="container (auto: png for 8-bit, tiff otherwise)")
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
    st_frames = {}
    for fn in sorted(os.listdir(args.input_dir)):
        if not fn.endswith((".exr", ".tiff", ".tif")):
            continue
        stem = fn.rsplit(".", 1)[0]
        parts = stem.rsplit("_", 1)
        if len(parts) != 2:
            continue
        pass_name, frame_id = parts
        buffer = BUFFER_CHANNELS.get(pass_name, pass_name.lower())
        arr = _read_multilayer_exr(os.path.join(args.input_dir, fn))
        if args.format == "safetensors":
            st_frames.setdefault(frame_id, {})[buffer] = arr
            count += 1
            continue
        out_stem = os.path.join(args.output_dir,
                                f"{args.split}_{buffer}_{frame_id}")
        bits = 32 if buffer == "depth" else args.bits
        # depth stays float regardless of the display-buffer container
        fmt = ("tiff" if buffer == "depth" and args.format in ("auto", "png")
               else args.format)
        _write(out_stem, arr, bits, fmt)
        count += 1

    if args.format == "safetensors":
        # packed per-frame buffer files (reference :179-187)
        import torch
        from safetensors.torch import save_file
        dt = {8: torch.uint8, 16: torch.float16, 32: torch.float32}[args.bits]
        for frame_id, bufs in st_frames.items():
            tensors = {}
            for k, a in bufs.items():
                t = torch.from_numpy(np.ascontiguousarray(a))
                if dt == torch.uint8:
                    t = (t.clamp(0, 1) * 255).to(torch.uint8)
                else:
                    t = t.to(dt)
                tensors[k] = t
            save_file(tensors, os.path.join(
                args.output_dir,
                f"{args.split}_buffers_{frame_id}.safetensors"))
    print(f"converted {count} buffers -> {args.output_dir}")


if __name__ == "__main__":
    main()
