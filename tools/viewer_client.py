"""Headless viewer client - connects to the render service, drives the
camera, applies edits, and saves received frames (the CLIENT mode analog of
viewer/__init__.py:189-275 without a GUI)."""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main(argv=None):
    p = argparse.ArgumentParser(prog="viewer_client", allow_abbrev=False)
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8765)
    p.add_argument("--frames", type=int, default=4)
    p.add_argument("--out", default="/tmp/viewer_frames")
    p.add_argument("--orbit_radius", type=float, default=4.0)
    p.add_argument("--edit", default=None,
                   help='JSON edit dict, e.g. \'{"obj": {"roughness_mult": 0.0}}\'')
    p.add_argument("--fps_json", default=None,
                   help="record a frames/sec trace through the pipelined "
                        "service to this JSON file (skips saving PNGs)")
    p.add_argument("--preview_scale", type=int, default=1,
                   help="viewer preview_scale to request (2 = the web "
                        "client's fast-drag rate)")
    p.add_argument("--render_mode", type=int, default=None,
                   help="render-mode index (viewer.state.RENDER_MODES; "
                        "5 = Ellipsoids rasterizer, 6 = Points)")
    args = p.parse_args(argv)

    import asyncio

    import websockets
    from PIL import Image

    os.makedirs(args.out, exist_ok=True)

    async def run():
        async with websockets.connect(
            f"ws://{args.host}:{args.port}", max_size=None, compression=None
        ) as ws:
            for i in range(args.frames):
                ang = 2 * np.pi * i / max(args.frames, 1)
                eye = np.array([
                    args.orbit_radius * np.cos(ang),
                    args.orbit_radius * np.sin(ang),
                    1.0,
                ])
                fwd = -eye / np.linalg.norm(eye)
                up = np.array([0.0, 0.0, 1.0])
                right = np.cross(fwd, up)
                right /= np.linalg.norm(right)
                down = np.cross(fwd, right)
                # COLMAP-style R (stored transposed c2w)
                R = np.stack([right, down, fwd], axis=1)
                req = {
                    "camera": {"R": R.tolist(),
                               "camera_center": eye.tolist()},
                }
                if args.edit and i == 0:
                    req["viewer"] = {"edits": json.loads(args.edit)}
                if args.preview_scale != 1:
                    req.setdefault("viewer", {})[
                        "preview_scale"] = args.preview_scale
                if args.render_mode is not None:
                    req.setdefault("viewer", {})[
                        "render_mode"] = args.render_mode
                await ws.send(json.dumps(req))
                metadata = json.loads(await ws.recv())
                _mapping = json.loads(await ws.recv())
                frame = await ws.recv()
                if args.fps_json:
                    if i == 1:
                        t_start = time.perf_counter()  # skip compile frame 0
                    last_perf = metadata["viewer"].get("perf")
                    continue
                h, w, c = metadata["viewer"]["frame_shape"]
                img = np.frombuffer(frame, np.uint8).reshape(h, w, c)
                path = os.path.join(args.out, f"frame_{i:03d}.png")
                Image.fromarray(img).save(path)
                print(f"saved {path}")
            if args.fps_json and args.frames > 1:
                wall = time.perf_counter() - t_start
                trace = {
                    "frames": args.frames - 1,
                    "wall_s": round(wall, 3),
                    "fps_pipelined": round((args.frames - 1) / wall, 2),
                    "server_perf": last_perf,
                    "render_mode": args.render_mode,
                    "preview_scale": args.preview_scale,
                }
                with open(args.fps_json, "w") as f:
                    json.dump(trace, f, indent=1)
                print(json.dumps(trace))

    asyncio.run(run())


if __name__ == "__main__":
    main()
