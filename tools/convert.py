"""3DGS COLMAP undistort/convert pipeline - twin of tools/convert.py.

Requires the external `colmap` binary (feature extraction, matching, mapping,
image undistortion); exits with instructions when unavailable.
"""

from __future__ import annotations

import argparse
import os
import shutil
import subprocess
import sys


def run(cmd):
    print("+", " ".join(cmd))
    subprocess.run(cmd, check=True)


def main(argv=None):
    p = argparse.ArgumentParser(prog="convert", allow_abbrev=False)
    p.add_argument("--source_path", "-s", required=True)
    p.add_argument("--camera", default="OPENCV")
    p.add_argument("--no_gpu", action="store_true")
    p.add_argument("--skip_matching", action="store_true")
    args = p.parse_args(argv)

    if shutil.which("colmap") is None:
        print("error: the `colmap` binary is required for convert.py "
              "(feature extraction / matching / undistortion). Install "
              "COLMAP or prepare sparse/0 + images/ manually.")
        return 1

    src = args.source_path
    use_gpu = "0" if args.no_gpu else "1"
    if not args.skip_matching:
        os.makedirs(os.path.join(src, "distorted", "sparse"), exist_ok=True)
        run(["colmap", "feature_extractor",
             "--database_path", f"{src}/distorted/database.db",
             "--image_path", f"{src}/input",
             "--ImageReader.single_camera", "1",
             "--ImageReader.camera_model", args.camera,
             "--SiftExtraction.use_gpu", use_gpu])
        run(["colmap", "exhaustive_matcher",
             "--database_path", f"{src}/distorted/database.db",
             "--SiftMatching.use_gpu", use_gpu])
        run(["colmap", "mapper",
             "--database_path", f"{src}/distorted/database.db",
             "--image_path", f"{src}/input",
             "--output_path", f"{src}/distorted/sparse",
             "--Mapper.ba_global_function_tolerance", "0.000001"])

    run(["colmap", "image_undistorter",
         "--image_path", f"{src}/input",
         "--input_path", f"{src}/distorted/sparse/0",
         "--output_path", src,
         "--output_type", "COLMAP"])

    sparse = os.path.join(src, "sparse")
    os.makedirs(os.path.join(sparse, "0"), exist_ok=True)
    for f in os.listdir(sparse):
        if f != "0":
            shutil.move(os.path.join(sparse, f),
                        os.path.join(sparse, "0", f))
    print("done")
    return 0


if __name__ == "__main__":
    sys.exit(main())
