"""Sweep fused-render configs on the bench scene (VERDICT r2 item 1).

For each (max_clusters_primary, max_clusters_secondary) pair, times the
full 2-bounce 800x800 frame through render_frame_fused on hardware and
reports Mrays/s plus the per-pass STARVED-ray fraction (tile candidate list
overflowed AND the ray was still accumulating at list end - see
raytracer._starved); the honest operating point is the fastest config whose
starved fraction is ~0 (dropped clusters are NOT tail-corrected;
ops/culling.py select_candidates).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_render_config(cfg: str):
    """'mcp:mcs[:tile_s[:tile_p]][:sN[:kM]]' -> kwargs dict for
    render_frame_fused (shared by bench.py to consume the sweep's
    best-honest pick)."""
    raw = cfg.split(":")
    mc_far, k_far, tcut = 0, 0, -1.0
    if raw and raw[-1].startswith("tc"):
        # throughput cutoff: tc3 = kill secondary rays below 1e-3
        # (fractional exponents allowed: tc2.52 ~= 3e-3, so the
        # bench_scan_mode adoption hook round-trips non-decade cutoffs)
        tcut = 10.0 ** -float(raw.pop()[2:])
    if raw and raw[-1].startswith("k"):
        k_far = int(raw.pop()[1:])
    if raw and raw[-1].startswith("s"):
        mc_far = int(raw.pop()[1:])
    parts = [int(x) for x in raw]
    return dict(
        max_clusters=parts[0],
        max_clusters_secondary=parts[1],
        cull_tile_secondary=parts[2] if len(parts) > 2 else 256,
        cull_tile_primary=parts[3] if len(parts) > 3 else 256,
        split_far=mc_far > 0,
        mc_far=mc_far or 32,
        max_hits_far=k_far,
        throughput_cutoff=tcut,
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=100_000)
    ap.add_argument("--res", type=int, default=800)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--max_hits", type=int, default=16)
    ap.add_argument("--cluster", type=int, default=128)
    ap.add_argument("--configs", type=str,
                    default="64:64,64:96,64:128,96:128",
                    help="comma list of mcp:mcs[:secondary_tile[:primary_"
                         "tile]][:sN[:kM]] entries; a trailing sN enables "
                         "the split-far two-pass renderer with mc_far=N "
                         "(kM sets the far-pass k-buffer depth)")
    ap.add_argument("--rays_per_call", type=int, default=65536,
                    help="shrink with small secondary tiles to keep the "
                         "candidate lists inside the SMEM prefetch budget")
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

    W = H = args.res
    scene = from_arrays(**room_scene(args.n), pad_multiple=2048)
    eye, c2w = room_camera()
    camera = CameraParams(
        origin=jnp.asarray(eye), c2w=jnp.asarray(c2w),
        fov_y=jnp.asarray(0.9), znear=jnp.asarray(0.05),
        zfar=jnp.asarray(50.0),
    )
    key = jax.random.PRNGKey(0)

    results = []
    for cfg in args.configs.split(","):
        cfg_kw = parse_render_config(cfg)
        tcut = cfg_kw.pop("throughput_cutoff")
        settings = RenderSettings(secondary_throughput_threshold=tcut)
        # the per-call SMEM prefetch holds candidates + cand_near
        # (tiles/call x mc x 8 bytes, CE=8-padded mc) for the widest pass;
        # shrink rays_per_call so it stays under ~0.7 MB of the 1 MB SMEM
        # (config 96:192:128 measured 1.6 KB over the limit at 65536)
        def pad8(m):
            return (m + 7) // 8 * 8
        per_ray = max(
            pad8(cfg_kw["max_clusters"]) / cfg_kw["cull_tile_primary"],
            pad8(cfg_kw["max_clusters_secondary"])
            / cfg_kw["cull_tile_secondary"],
            (pad8(cfg_kw["mc_far"]) / cfg_kw["cull_tile_secondary"]
             if cfg_kw["split_far"] else 0.0),
        ) * 8.0
        tile_lcm = max(cfg_kw["cull_tile_primary"],
                       cfg_kw["cull_tile_secondary"])
        rpc = min(args.rays_per_call,
                  int(0.7 * 2**20 / per_ray) // tile_lcm * tile_lcm)
        if rpc != args.rays_per_call:
            print(f"{cfg}: rays_per_call {args.rays_per_call} -> {rpc} "
                  f"(SMEM budget)", file=sys.stderr)
        fn = lambda k: render_frame_fused(
            scene, camera, settings, k, W, H,
            num_bounces=2, max_hits=args.max_hits,
            cull_cluster=args.cluster,
            rays_per_call=rpc, **cfg_kw,
        )
        try:
            steps, final = fn(key)
            np.asarray(final)                   # force the lazy axon compile
        except Exception as e:  # noqa: BLE001 - sweep survives one bad cfg
            print(json.dumps({"mc": cfg, "error": str(e)[-300:]}),
                  flush=True)
            continue
        ovf = np.asarray(steps.overflow)        # [num_steps, R]
        ovf_by_step = [round(float(o.mean()), 4) for o in ovf]

        t0 = time.perf_counter()
        for i in range(args.iters):
            steps, final = fn(jax.random.fold_in(key, i))
        np.asarray(final)
        dt = (time.perf_counter() - t0) / args.iters
        mrays = W * H / dt / 1e6
        row = dict(mc=cfg, mrays=round(mrays, 3), s=round(dt, 3),
                   starved=ovf_by_step)
        if tcut > 0:
            # honesty check for the throughput cutoff: tonemapped PSNR vs
            # the same config without the cutoff must be visually exact
            from editable_gaussian_reflections_tpu.ops.tonemap import tonemap
            _, final_ref = render_frame_fused(
                scene, camera, RenderSettings(), key, W, H,
                num_bounces=2, max_hits=args.max_hits,
                cull_cluster=args.cluster, rays_per_call=rpc, **cfg_kw)
            a = np.clip(np.asarray(tonemap(final)), 0, 1)
            b = np.clip(np.asarray(tonemap(final_ref)), 0, 1)
            mse = float(np.mean((a - b) ** 2))
            row["tc_psnr"] = round(10 * np.log10(1.0 / max(mse, 1e-12)), 2)
        results.append(row)
        print(json.dumps(row), flush=True)

    best = max((r for r in results
                if max(r["starved"]) < 0.005
                and r.get("tc_psnr", 99.0) >= 45.0),
               key=lambda r: r["mrays"], default=None)
    print(json.dumps({"best_honest": best}))
    if best is not None:
        # record for bench.py: it adopts the fastest honest config found so
        # far (only if faster than any previously recorded one)
        path = os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "artifacts", "bench_best.json")
        try:
            prev = json.load(open(path))
        except (OSError, ValueError):
            prev = None
        if prev is None or best["mrays"] > prev.get("mrays", 0):
            rec = dict(best, max_hits=args.max_hits, cluster=args.cluster)
            os.makedirs(os.path.dirname(path), exist_ok=True)
            json.dump(rec, open(path, "w"))
            print(f"bench_best.json updated: {rec}", file=sys.stderr)


if __name__ == "__main__":
    main()
