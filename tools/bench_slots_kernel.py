"""Isolate the training slots-kernel dispatch cost (trace share of the
768px train step).  Times pallas_trace_slots_v4 on 65536-ray dispatches at
the training config for (a) coherent primary rays and (b) direction-shuffled
rays (secondary-bounce proxy), so the train-step decomposition
(tools/bench_train_step.py) can be attributed between trace and
backward/scatter XLA stages."""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=175_000)
    ap.add_argument("--max_hits", type=int, default=32)
    ap.add_argument("--cluster", type=int, default=256)
    ap.add_argument("--max_clusters", type=int, default=192)
    ap.add_argument("--iters", type=int, default=5)
    args = ap.parse_args()

    import numpy as np

    import jax
    import jax.numpy as jnp

    from editable_gaussian_reflections_tpu.ops.culling import (
        cluster_bounds,
        morton_order,
        select_candidates,
        tile_pixel_order,
    )
    from editable_gaussian_reflections_tpu.ops.camera_rays import (
        primary_ray_directions,
    )
    from editable_gaussian_reflections_tpu.ops.pallas.render_kernel import (
        pack_attr_table,
        pack_frame_table,
    )
    from editable_gaussian_reflections_tpu.ops.pallas.render_kernel_v3 import (
        pallas_trace_slots_v4,
    )
    from editable_gaussian_reflections_tpu.ops.pallas.trace_kernel import (
        pack_frames,
    )
    from editable_gaussian_reflections_tpu.renderer.raytracer import (
        CameraParams,
        RenderSettings,
    )
    from editable_gaussian_reflections_tpu.scene.gaussian_scene import (
        build_frames,
        from_arrays,
    )
    from editable_gaussian_reflections_tpu.utils.synth import (
        room_camera,
        room_scene,
    )

    scene = from_arrays(**room_scene(args.n), pad_multiple=2048)
    settings = RenderSettings()
    frames, attrs = build_frames(scene, settings.alpha_threshold,
                                 settings.exp_power,
                                 settings.global_scale_factor)
    perm = morton_order(frames)
    frames = jax.tree_util.tree_map(lambda a: a[perm], frames)
    attrs = jax.tree_util.tree_map(lambda a: a[perm], attrs)
    scene_s = jax.tree_util.tree_map(lambda a: a[perm], scene)
    bounds = cluster_bounds(frames, args.cluster)
    gpack = pack_frames(frames, attrs)
    ftable = pack_frame_table(frames, scene_s)

    eye, c2w = room_camera()
    camera = CameraParams(
        origin=jnp.asarray(eye), c2w=jnp.asarray(c2w),
        fov_y=jnp.asarray(0.9), znear=jnp.asarray(0.05),
        zfar=jnp.asarray(50.0),
    )
    W = H = 256
    ray_perm, _ = tile_pixel_order(H, W, 16, 16)
    dirs = primary_ray_directions(W, H, camera.fov_y, camera.c2w
                                  ).reshape(-1, 3)[np.asarray(ray_perm)]
    R = dirs.shape[0]
    rays_o = jnp.broadcast_to(camera.origin, (R, 3))

    @jax.jit
    def cull(ro, rd, near):
        cands, cnear, _n, ovf, _tdrop = select_candidates(
            ro, rd, bounds, near, camera.zfar, tile=256,
            max_clusters=args.max_clusters)
        return cands, cnear, ovf

    @jax.jit
    def kern(ro, rd, near, cands, cnear):
        slots, acc = pallas_trace_slots_v4(
            ro, rd, gpack, ftable, cands, cnear, near, camera.zfar,
            3.0, jnp.float32(0.0),
            settings.backfacing_max_dist,
            settings.backfacing_invalid_normal_threshold,
            transmittance_threshold=settings.transmittance_threshold,
            max_hits=args.max_hits, cluster=args.cluster, tile=256,
        )
        return slots.sum()

    def timed(label, ro, rd, near):
        cands, cnear, ovf = cull(ro, rd, near)
        s = kern(ro, rd, near, cands, cnear)
        np.asarray(s)
        t0 = time.perf_counter()
        for _ in range(args.iters):
            cands, cnear, ovf = cull(ro, rd, near)
        np.asarray(cands)
        t_cull = (time.perf_counter() - t0) / args.iters
        t0 = time.perf_counter()
        for _ in range(args.iters):
            s = kern(ro, rd, near, cands, cnear)
        np.asarray(s)
        t_kern = (time.perf_counter() - t0) / args.iters
        print(json.dumps({"case": label,
                          "cull_ms": round(t_cull * 1e3, 1),
                          "kernel_ms": round(t_kern * 1e3, 1),
                          "overflow": round(float(np.asarray(ovf).mean()), 4)}),
              flush=True)

    timed("primary", rays_o, dirs, camera.znear)

    # secondary proxy: origins on scene surfaces, cosine-ish shuffled dirs
    rng = np.random.default_rng(1)
    so = np.asarray(rays_o) + np.asarray(dirs) * rng.uniform(
        1.0, 4.0, (R, 1)).astype(np.float32)
    sd = rng.normal(size=(R, 3)).astype(np.float32)
    sd /= np.linalg.norm(sd, axis=1, keepdims=True)
    timed("secondary_shuffled", jnp.asarray(so), jnp.asarray(sd),
          jnp.zeros_like(camera.znear))


if __name__ == "__main__":
    main()
