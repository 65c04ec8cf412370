"""In-kernel time attribution for the fused v4 render kernel.

Times pallas_render_culled_v4 on the bench room at a given config, under
its debug modes:

  mode 1  = pair math + group-loop machinery only (no drain)
  mode 2  = pair math + exactly ONE drain iteration per chunk
  mode 0  = full kernel

on (a) coherent primary rays and (b) direction-shuffled rays (secondary
proxy, wider candidate lists).  Reports us per computed [tile x cluster]
chunk for each mode plus the drain share, so kernel work targets the
measured bottleneck instead of the assumed one (VERDICT r3 next-step 3).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=100_000)
    ap.add_argument("--res", type=int, default=800)
    ap.add_argument("--max_hits", type=int, default=16)
    ap.add_argument("--cluster", type=int, default=128)
    ap.add_argument("--mc", type=int, default=96)
    ap.add_argument("--mc_sec", type=int, default=192)
    ap.add_argument("--tile", type=int, default=256)
    ap.add_argument("--rays", type=int, default=65536)
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()

    import numpy as np

    import jax
    import jax.numpy as jnp

    from editable_gaussian_reflections_tpu.ops.camera_rays import (
        primary_ray_directions,
    )
    from editable_gaussian_reflections_tpu.ops.culling import (
        cluster_bounds,
        morton_order,
        select_candidates,
        tile_pixel_order,
    )
    from editable_gaussian_reflections_tpu.ops.pallas.render_kernel import (
        unpack_composite,
    )
    from editable_gaussian_reflections_tpu.ops.pallas.render_kernel_v3 import (
        pallas_render_culled_v4,
    )
    from editable_gaussian_reflections_tpu.ops.pallas.trace_kernel import (
        pack_frames,
    )
    from editable_gaussian_reflections_tpu.renderer.raytracer import (
        CameraParams,
        RenderSettings,
        build_frames,
    )
    from editable_gaussian_reflections_tpu.scene.gaussian_scene import (
        from_arrays,
    )
    from editable_gaussian_reflections_tpu.utils.synth import (
        room_camera,
        room_scene,
    )

    W = H = args.res
    scene = from_arrays(**room_scene(args.n), pad_multiple=2048)
    eye, c2w = room_camera()
    settings = RenderSettings()
    frames, attrs = build_frames(scene, settings.alpha_threshold,
                                 settings.exp_power,
                                 settings.global_scale_factor)
    perm = morton_order(frames)
    frames = jax.tree_util.tree_map(lambda a: a[perm], frames)
    attrs = jax.tree_util.tree_map(lambda a: a[perm], attrs)
    bounds = cluster_bounds(frames, args.cluster)
    gpack = pack_frames(frames, attrs)

    tpx = int(args.tile ** 0.5)
    ray_perm, _ = tile_pixel_order(H, W, tpx, tpx)
    dirs = np.asarray(
        primary_ray_directions(W, H, jnp.asarray(0.9), jnp.asarray(c2w))
    ).reshape(-1, 3)[np.asarray(ray_perm)]
    rays_o = np.broadcast_to(np.asarray(eye, np.float32), dirs.shape)

    R = args.rays
    rays_o_p = jnp.asarray(rays_o[:R])
    rays_d_p = jnp.asarray(dirs[:R])

    # secondary proxy: same origins pushed into the scene, shuffled
    # directions (GGX-like incoherence) - re-sorted by (origin, direction)
    # exactly as the renderer's secondary re-tiling does
    rng = np.random.default_rng(0)
    sec_d = dirs[rng.permutation(len(dirs))[:R]]
    sec_o = rays_o[:R] + 2.0 * dirs[:R]
    from editable_gaussian_reflections_tpu.ops.culling import morton_codes
    lo = jnp.min(jnp.where(frames.valid[:, None], frames.mean, jnp.inf), 0)
    hi = jnp.max(jnp.where(frames.valid[:, None], frames.mean, -jnp.inf), 0)
    pos_bits = morton_codes(jnp.asarray(sec_o), lo, hi, bits=5)
    qd = jnp.clip((jnp.asarray(sec_d) * 0.5 + 0.5) * 4.0, 0, 3).astype(
        jnp.uint32)
    keys = (pos_bits << 6) | (qd[:, 0] << 4) | (qd[:, 1] << 2) | qd[:, 2]
    order = jnp.argsort(keys)
    rays_o_s = jnp.asarray(sec_o)[order]
    rays_d_s = jnp.asarray(sec_d)[order]

    def run(ro, rd, mc, sec, debug_mode, iters):
        cands, cnear, num, _ovf, _tdrop = select_candidates(
            rays_o=ro, rays_d=rd, bounds=bounds,
            near=jnp.float32(0.05), far=jnp.float32(50.0),
            tile=args.tile, max_clusters=mc,
        )
        fn = jax.jit(lambda a, b: pallas_render_culled_v4(
            a, b, gpack, cands, cnear, num,
            jnp.float32(0.05), jnp.float32(50.0),
            3.0, jnp.float32(sec), jnp.float32(3.0), jnp.float32(0.1),
            max_hits=args.max_hits, cluster=args.cluster, tile=args.tile,
            debug_mode=debug_mode, secondary_static=sec,
        ))
        out = fn(ro, rd)
        np.asarray(out)
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(ro, rd)
        np.asarray(out)
        dt = (time.perf_counter() - t0) / iters
        return dt, out

    results = {}
    for name, (ro, rd, mc, sec) in dict(
        primary=(rays_o_p, rays_d_p, args.mc, 0),
        secondary=(rays_o_s, rays_d_s, args.mc_sec, 1),
    ).items():
        row = {}
        for mode, label in [(1, "pair_only"), (2, "pair_drain1"),
                            (0, "full")]:
            dt, out = run(ro, rd, mc, sec, mode, args.iters)
            row[label] = round(dt * 1e3, 3)
        # chunks actually computed (not early-exited), from the full run
        # (OUT_CHUNKS lane 15; per-TILE counter broadcast to its rays)
        mean_chunks = float(jnp.mean(out[:, 15]))
        n_tiles = R // args.tile
        row["mean_chunks_per_tile"] = round(mean_chunks, 1)
        row["us_per_chunk_full"] = round(
            row["full"] * 1e3 / max(mean_chunks * n_tiles, 1), 3)
        row["us_per_chunk_pair"] = round(
            row["pair_only"] * 1e3 / max(mean_chunks * n_tiles, 1), 3)
        row["drain_share"] = round(
            (row["full"] - row["pair_only"]) / row["full"], 3)
        results[name] = row
        print(json.dumps({name: row}), flush=True)

    print(json.dumps({"config": vars(args), "results": results}))


if __name__ == "__main__":
    main()
