"""Head-to-head kernel bench: v4 (c128 lanes) vs v5 (transposed, fine
clusters) on the bench room, isolated per pass (coherent primary rays and
re-sorted secondary-proxy rays), at matched honest candidate budgets.
Prints ms/dispatch and effective Mrays/s per config row."""

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
    ap.add_argument("--rays", type=int, default=65536)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--raise_errors", action="store_true")
    ap.add_argument("--configs", type=str,
                    default="v4:128:256:96:192,v5:64:128:128:256,"
                            "v5:32:128:160:320,v5:64:128:96:192",
                    help="comma list of ver:cluster:tile:mc_prim:mc_sec")
    args = ap.parse_args()

    import numpy as np

    import jax
    import jax.numpy as jnp

    from editable_gaussian_reflections_tpu.ops.camera_rays import (
        primary_ray_directions,
    )
    from editable_gaussian_reflections_tpu.ops.culling import (
        cluster_bounds,
        morton_codes,
        morton_order,
        select_candidates,
        tile_pixel_order,
    )
    from editable_gaussian_reflections_tpu.ops.pallas.render_kernel_v3 import (
        pallas_render_culled_v4,
    )
    from editable_gaussian_reflections_tpu.ops.pallas.render_kernel_v5 import (
        pallas_render_culled_v5,
    )
    from editable_gaussian_reflections_tpu.ops.pallas.render_kernel_v6 import (
        pallas_render_culled_v6,
    )
    from editable_gaussian_reflections_tpu.ops.pallas.trace_kernel import (
        pack_frames,
    )
    from editable_gaussian_reflections_tpu.renderer.raytracer import (
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
    gpack = pack_frames(frames, attrs)

    ray_perm, _ = tile_pixel_order(H, W, 16, 16)
    dirs = np.asarray(
        primary_ray_directions(W, H, jnp.asarray(0.9), jnp.asarray(c2w))
    ).reshape(-1, 3)[np.asarray(ray_perm)]
    rays_o = np.broadcast_to(np.asarray(eye, np.float32), dirs.shape)
    R = args.rays
    rays_p = (jnp.asarray(rays_o[:R]), jnp.asarray(dirs[:R]))

    rng = np.random.default_rng(0)
    sec_d = dirs[rng.permutation(len(dirs))[:R]]
    sec_o = rays_o[:R] + 2.0 * dirs[:R]
    lo = jnp.min(jnp.where(frames.valid[:, None], frames.mean, jnp.inf), 0)
    hi = jnp.max(jnp.where(frames.valid[:, None], frames.mean, -jnp.inf), 0)
    pos_bits = morton_codes(jnp.asarray(sec_o), lo, hi, bits=5)
    qd = jnp.clip((jnp.asarray(sec_d) * 0.5 + 0.5) * 4.0, 0, 3).astype(
        jnp.uint32)
    keys = (pos_bits << 6) | (qd[:, 0] << 4) | (qd[:, 1] << 2) | qd[:, 2]
    order = jnp.argsort(keys)
    rays_s = (jnp.asarray(sec_o)[order], jnp.asarray(sec_d)[order])

    bounds_cache = {}

    def run(ver, cluster, tile, mc, rays, sec):
        if cluster not in bounds_cache:
            bounds_cache[cluster] = cluster_bounds(frames, cluster)
        ro, rd = rays
        cands, cnear, num, _o, _td = select_candidates(
            rays_o=ro, rays_d=rd, bounds=bounds_cache[cluster],
            near=jnp.float32(0.05), far=jnp.float32(50.0),
            tile=tile, max_clusters=mc,
        )
        kern = {"v5": pallas_render_culled_v5,
                "v6": pallas_render_culled_v6}.get(ver,
                                                   pallas_render_culled_v4)
        fn = jax.jit(lambda a, b: kern(
            a, b, gpack, cands, cnear, num,
            jnp.float32(0.05), jnp.float32(50.0),
            3.0, jnp.float32(sec), jnp.float32(3.0), jnp.float32(0.1),
            max_hits=args.max_hits, cluster=cluster, tile=tile,
            secondary_static=sec,
        ))
        out = fn(ro, rd)
        np.asarray(out)
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = fn(ro, rd)
        np.asarray(out)
        dt = (time.perf_counter() - t0) / args.iters
        chunks = float(jnp.mean(out[:, 15]))
        return dt, chunks

    for cfg in args.configs.split(","):
        ver, cl, tl, mcp, mcs = cfg.split(":")
        cl, tl, mcp, mcs = int(cl), int(tl), int(mcp), int(mcs)
        try:
            dp, cp = run(ver, cl, tl, mcp, rays_p, 0)
            ds, cs = run(ver, cl, tl, mcs, rays_s, 1)
        except Exception as e:  # noqa: BLE001 - sweep must survive one bad cfg
            if args.raise_errors:
                raise
            print(json.dumps({"cfg": cfg, "error": str(e)[-200:]}),
                  flush=True)
            continue
        # frame proxy: 1 primary + 2 secondary dispatches per ray
        frame = dp + 2 * ds
        print(json.dumps({
            "cfg": cfg,
            "primary_ms": round(dp * 1e3, 2),
            "secondary_ms": round(ds * 1e3, 2),
            "frame_proxy_mrays": round(R / frame / 1e6, 3),
            "chunks_p": round(cp, 1), "chunks_s": round(cs, 1),
        }), flush=True)


if __name__ == "__main__":
    main()
