"""Capture a jax.profiler trace of the fused render kernel on hardware.

The round-3 kernel is ~6x off its own pair-math roofline at K16/mc96
(120 ms per 65k-ray dispatch vs ~19 ms of pure pair math - RESULTS.md);
scalar-fetch A/B timing localized the round-2 walls (DMA issue rate) but
cannot decompose the remaining in-kernel machinery.  This dumps an xprof
trace of a few fused dispatches for op-level attribution.

Usage: python tools/profile_kernel.py [--trace_dir /tmp/xprof] [--split_far]
The trace directory is tarred next to itself for artifact collection; view
with tensorboard or xprof offline.
"""

from __future__ import annotations

import argparse
import os
import sys
import tarfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--trace_dir", default="/tmp/xprof_fused")
    ap.add_argument("--n", type=int, default=100_000)
    ap.add_argument("--res", type=int, default=800)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--max_hits", type=int, default=16)
    ap.add_argument("--mc", type=int, default=96)
    ap.add_argument("--mc_sec", type=int, default=192)
    ap.add_argument("--cluster", type=int, default=128)
    ap.add_argument("--split_far", action="store_true")
    args = ap.parse_args()

    import numpy as np

    import jax
    import jax.numpy as jnp

    from editable_gaussian_reflections_tpu.renderer.raytracer import (
        CameraParams,
        RenderSettings,
        render_frame_fused,
    )
    from editable_gaussian_reflections_tpu.scene.gaussian_scene import (
        from_arrays,
    )
    from editable_gaussian_reflections_tpu.utils.synth import (
        room_camera,
        room_scene,
    )

    scene = from_arrays(**room_scene(args.n), pad_multiple=2048)
    eye, c2w = room_camera()
    camera = CameraParams(
        origin=jnp.asarray(eye), c2w=jnp.asarray(c2w),
        fov_y=jnp.asarray(0.9), znear=jnp.asarray(0.05),
        zfar=jnp.asarray(50.0))
    settings = RenderSettings()
    key = jax.random.PRNGKey(0)
    interpret = jax.default_backend() == "cpu"  # smoke mode off-TPU
    fn = lambda k: render_frame_fused(
        scene, camera, settings, k, args.res, args.res, num_bounces=2,
        max_hits=args.max_hits, cull_cluster=args.cluster,
        max_clusters=args.mc, max_clusters_secondary=args.mc_sec,
        rays_per_call=65536, split_far=args.split_far, interpret=interpret)

    # compile outside the trace (axon compiles lazily at first transfer)
    _, final = fn(key)
    np.asarray(final)
    print("compiled; tracing...", flush=True)

    t0 = time.perf_counter()
    with jax.profiler.trace(args.trace_dir):
        for i in range(args.iters):
            _, final = fn(jax.random.fold_in(key, i))
        np.asarray(final)
    dt = (time.perf_counter() - t0) / args.iters
    print(f"{args.res}x{args.res} frame: {dt:.3f} s/frame "
          f"({args.res * args.res / dt / 1e6:.3f} Mrays/s)", flush=True)

    tar = args.trace_dir.rstrip("/") + ".tar.gz"
    with tarfile.open(tar, "w:gz") as t:
        t.add(args.trace_dir, arcname=os.path.basename(args.trace_dir))
    print("trace:", tar)


if __name__ == "__main__":
    main()
