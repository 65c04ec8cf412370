"""Parallel prior-buffer resizing - twin of reference tools/resize_priors.py."""

from __future__ import annotations

import argparse
import os
from concurrent.futures import ThreadPoolExecutor


def resize_one(src, dst, resolution):
    from PIL import Image
    img = Image.open(src)
    w = int(resolution * img.size[0] / img.size[1])
    img.resize((w, resolution)).save(dst)


def main(argv=None):
    p = argparse.ArgumentParser(prog="resize_priors", allow_abbrev=False)
    p.add_argument("--priors_dir", required=True)
    p.add_argument("--out_dir", required=True)
    p.add_argument("--resolution", type=int, default=768)
    p.add_argument("--workers", type=int, default=8)
    args = p.parse_args(argv)

    jobs = []
    for root, _dirs, files in os.walk(args.priors_dir):
        rel = os.path.relpath(root, args.priors_dir)
        for fn in files:
            if not fn.lower().endswith((".png", ".jpg", ".jpeg")):
                continue
            out_root = os.path.join(args.out_dir, rel)
            os.makedirs(out_root, exist_ok=True)
            jobs.append((os.path.join(root, fn), os.path.join(out_root, fn)))

    with ThreadPoolExecutor(max_workers=args.workers) as ex:
        list(ex.map(lambda j: resize_one(j[0], j[1], args.resolution), jobs))
    print(f"resized {len(jobs)} images -> {args.out_dir}")


if __name__ == "__main__":
    main()
