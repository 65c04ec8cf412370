"""Quantize a GT renders dataset into a compressed copy.

Working analog of the step behind the reference's scripts/compress_renders.sh
(its `tools/compress_dataset.py` is absent from the release; README.md:182-184
documents the effect - "post-submission data quantization changed PSNR
slightly").  Every float G-buffer (.exr/.tiff) is re-encoded as 16-bit TIFF
(half precision; depth kept 32-bit to preserve range), LDR .png buffers are
copied through, and transforms_*.json / sparse / priors ride along - the
output directory loads through the same BlenderDataset fallback chain
(dataset/blender.py:84-94).
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def _read_float(path):
    if path.endswith(".exr"):
        import cv2
        os.environ.setdefault("OPENCV_IO_ENABLE_OPENEXR", "1")
        img = cv2.imread(path, cv2.IMREAD_UNCHANGED | cv2.IMREAD_ANYDEPTH)
        if img is None:
            raise IOError(path)
        if img.ndim == 3 and img.shape[2] >= 3:
            img[..., :3] = img[..., 2::-1]  # BGR -> RGB
        return np.asarray(img, np.float32)
    import imageio.v3 as iio
    return np.asarray(iio.imread(path), np.float32)


def compress_scene(src: str, dst: str, depth_bits: int = 32) -> int:
    os.makedirs(dst, exist_ok=True)
    n = 0
    for name in sorted(os.listdir(src)):
        sp = os.path.join(src, name)
        dp = os.path.join(dst, name)
        if os.path.isdir(sp):
            if name in ("sparse", "priors", "train", "test"):
                if name in ("sparse", "priors"):
                    shutil.copytree(sp, dp, dirs_exist_ok=True)
                else:
                    n += compress_scene(sp, dp, depth_bits)
            continue
        if name.endswith((".exr", ".tiff", ".tif")):
            import imageio.v3 as iio
            arr = _read_float(sp)
            is_depth = "depth" in name
            dt = np.float32 if (is_depth and depth_bits == 32) else np.float16
            out = os.path.splitext(dp)[0] + ".tiff"
            iio.imwrite(out, arr.astype(dt))
            n += 1
        else:
            shutil.copy2(sp, dp)
    return n


def main(argv=None):
    p = argparse.ArgumentParser(prog="compress_dataset")
    p.add_argument("--input_dir", default="data/renders")
    p.add_argument("--output_dir", default="data/renders_compressed")
    p.add_argument("--scenes", nargs="*", default=None,
                   help="scene subdirs (default: all with a transforms_train.json)")
    p.add_argument("--depth_bits", type=int, default=32, choices=(16, 32))
    args = p.parse_args(argv)

    scenes = args.scenes
    if scenes is None:
        scenes = [s for s in sorted(os.listdir(args.input_dir))
                  if os.path.exists(os.path.join(args.input_dir, s,
                                                 "transforms_train.json"))]
    report = {}
    for scene in scenes:
        n = compress_scene(os.path.join(args.input_dir, scene),
                           os.path.join(args.output_dir, scene),
                           args.depth_bits)
        report[scene] = n
        print(f"{scene}: {n} buffers quantized")
    print(json.dumps(report))


if __name__ == "__main__":
    main()
