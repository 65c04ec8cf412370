"""In-kernel time attribution for the v7 quadric scan render kernel.

Times pallas_render_culled_v7 on the bench room under its debug modes:

  mode 1  = quadric pair math + group-loop machinery only
  mode 2  = pair math + prefix-product scan (no attribute dot/bookkeeping)
  mode 0  = full kernel

with a ~0 transmittance threshold so every mode traverses every candidate
chunk (comparable work), on coherent primary rays and a re-sorted
secondary proxy.  Also reports the END-TO-END kernel deltas of the round-5
levers at the real threshold: stats=False (counters compiled out) and
attr_precision="high" (3-pass attribute dot).  The us/chunk split is the
measured roofline input for RESULTS.md round 5 (VERDICT r4 #4).
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
    ap.add_argument("--cluster", type=int, default=128)
    ap.add_argument("--mc", type=int, default=128)
    ap.add_argument("--mc_sec", type=int, default=768)
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
        morton_codes,
        morton_order,
        select_candidates,
        sort_within_clusters,
        tile_pixel_order,
    )
    from editable_gaussian_reflections_tpu.ops.pallas.render_kernel_v7 import (
        pack_quadric_lanes,
        pallas_render_culled_v7,
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
    TILE = 128  # scan kernels put rays on lanes
    scene = from_arrays(**room_scene(args.n), pad_multiple=2048)
    eye, c2w = room_camera()
    settings = RenderSettings()
    frames, attrs = build_frames(scene, settings.alpha_threshold,
                                 settings.exp_power,
                                 settings.global_scale_factor)
    perm = morton_order(frames)
    frames = jax.tree_util.tree_map(lambda a: a[perm], frames)
    attrs = jax.tree_util.tree_map(lambda a: a[perm], attrs)
    fwd = jnp.asarray(c2w)[:, 2]
    perm2 = sort_within_clusters(frames, -fwd, args.cluster)
    frames = jax.tree_util.tree_map(lambda a: a[perm2], frames)
    attrs = jax.tree_util.tree_map(lambda a: a[perm2], attrs)
    bounds = cluster_bounds(frames, args.cluster)
    gpack = pack_frames(frames, attrs)
    tq, center = pack_quadric_lanes(
        jnp.pad(gpack, ((0, 0), (0, args.cluster))))

    ray_perm, _ = tile_pixel_order(H, W, 16, 16)
    dirs = np.asarray(
        primary_ray_directions(W, H, jnp.asarray(0.9), jnp.asarray(c2w))
    ).reshape(-1, 3)[np.asarray(ray_perm)]
    rays_o = np.broadcast_to(np.asarray(eye, np.float32), dirs.shape)

    R = args.rays
    rays_o_p = jnp.asarray(rays_o[:R])
    rays_d_p = jnp.asarray(dirs[:R])

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
    rays_o_s = jnp.asarray(sec_o)[order]
    rays_d_s = jnp.asarray(sec_d)[order]

    def prep(ro, rd, mc):
        cands, cnear, num, _ovf, _td = select_candidates(
            rays_o=ro, rays_d=rd, bounds=bounds,
            near=jnp.float32(0.05), far=jnp.float32(50.0),
            tile=TILE, max_clusters=mc,
        )
        # center-depth re-sort, as the scan dispatch does (raytracer)
        tpo = ro.reshape(-1, TILE, 3).mean(1)
        tpd = rd.reshape(-1, TILE, 3).mean(1)
        tpd = tpd / jnp.maximum(
            jnp.linalg.norm(tpd, axis=-1, keepdims=True), 1e-12)
        cid = jnp.where(cands < 0, 0, cands)
        cdep = jnp.einsum("tmc,tc->tm",
                          bounds.center[cid] - tpo[:, None, :], tpd)
        ckey = jnp.where(cands < 0, jnp.inf, cdep)
        corder = jnp.argsort(ckey, axis=1)
        cands = jnp.take_along_axis(cands, corder, axis=1)
        cnear = jnp.take_along_axis(cnear, corder, axis=1)
        return cands, cnear, num

    def run(ro, rd, cands, cnear, num, sec, iters, thr, **kw):
        # slab the rays so each call's prefetched candidate lists stay
        # under ~0.4 MB of the 1 MB SMEM (the raytracer's clamp; a direct
        # 65536-ray call at mc=768 is a 1.5 MB prefetch and won't compile)
        mc = cands.shape[1]
        slab_tiles = max(1, int(0.4 * 2**20 / (mc * 4)) )
        slab = min(ro.shape[0], slab_tiles * TILE)
        n_slab = (ro.shape[0] + slab - 1) // slab

        def call(a, b, cd, cn, nm):
            return pallas_render_culled_v7(
                a, b, gpack, cd, cn, nm,
                jnp.float32(0.05), jnp.float32(50.0),
                3.0, jnp.float32(sec), jnp.float32(3.0), jnp.float32(0.1),
                transmittance_threshold=thr,
                max_hits=16, cluster=args.cluster, tile=TILE,
                tpack=(tq, center), secondary_static=sec, **kw)

        fn = jax.jit(lambda a, b: jnp.concatenate([
            call(a[i * slab:(i + 1) * slab], b[i * slab:(i + 1) * slab],
                 cands[i * slab // TILE:(i + 1) * slab // TILE],
                 cnear[i * slab // TILE:(i + 1) * slab // TILE],
                 num[i * slab // TILE:(i + 1) * slab // TILE])
            for i in range(n_slab)], axis=0))
        out = fn(ro, rd)
        np.asarray(out)
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(ro, rd)
        np.asarray(out)
        return (time.perf_counter() - t0) / iters, out

    results = {}
    for name, (ro, rd, mc, sec) in dict(
        primary=(rays_o_p, rays_d_p, args.mc, 0),
        secondary=(rays_o_s, rays_d_s, args.mc_sec, 1),
    ).items():
        cands, cnear, num = prep(ro, rd, mc)
        row = {}
        # attribution at thr~0: every mode traverses every chunk
        for mode, label in [(1, "pair_only"), (2, "pair_scan"), (0, "full")]:
            dt, out = run(ro, rd, cands, cnear, num, sec, args.iters,
                          1e-30, debug_mode=mode)
            row[label] = round(dt * 1e3, 3)
        n_chunks = float(jnp.sum(jnp.where(cands >= 0, 1, 0)))
        row["us_per_chunk"] = {
            k: round(row[k] * 1e3 / max(n_chunks, 1), 3)
            for k in ("pair_only", "pair_scan", "full")}
        row["scan_share"] = round(
            (row["pair_scan"] - row["pair_only"]) / row["full"], 3)
        row["attr_share"] = round(
            (row["full"] - row["pair_scan"]) / row["full"], 3)
        # end-to-end lever deltas at the real threshold
        dt0, out = run(ro, rd, cands, cnear, num, sec, args.iters, 0.01)
        row["real_thr_ms"] = round(dt0 * 1e3, 3)
        mean_chunks = float(jnp.mean(out[:, 15]))
        row["mean_chunks_per_tile"] = round(mean_chunks, 1)
        for label, kw in [("nostats", dict(stats=False)),
                          ("ap_bf16", dict(attr_precision="bf16")),
                          ("nostats_ap_bf16",
                           dict(stats=False, attr_precision="bf16"))]:
            dt, _ = run(ro, rd, cands, cnear, num, sec, args.iters, 0.01,
                        **kw)
            row[label + "_ms"] = round(dt * 1e3, 3)
        results[name] = row
        print(json.dumps({name: row}), flush=True)

    print(json.dumps({"config": vars(args), "results": results}))


if __name__ == "__main__":
    main()
