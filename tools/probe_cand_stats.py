"""Measure per-tile candidate-cluster counts vs cull-tile size.

Answers: how much does shrinking the cull tile (256 -> 64 rays) tighten
the per-tile cone, i.e. how many candidate clusters would a finer-grained
(sub-tile) culling actually skip?  Uses REAL bounce-1 secondary rays from
the bench room (not a shuffle proxy) via render_frame_fused's StepOutputs.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=100_000)
    ap.add_argument("--res", type=int, default=800)
    ap.add_argument("--cluster", type=int, default=128)
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
    from editable_gaussian_reflections_tpu.renderer.raytracer import (
        CameraParams,
        RenderSettings,
        build_frames,
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
    settings = RenderSettings()
    frames, attrs = build_frames(scene, settings.alpha_threshold,
                                 settings.exp_power,
                                 settings.global_scale_factor)
    perm = morton_order(frames)
    frames = jax.tree_util.tree_map(lambda a: a[perm], frames)
    bounds = cluster_bounds(frames, args.cluster)

    camera = CameraParams(
        origin=jnp.asarray(eye), c2w=jnp.asarray(c2w),
        fov_y=jnp.asarray(0.9), znear=jnp.asarray(0.05),
        zfar=jnp.asarray(50.0),
    )
    # real bounce-1 rays: hit positions + GGX directions from a cheap frame
    key = jax.random.PRNGKey(0)
    steps, _ = render_frame_fused(
        scene, camera, settings, key, W, H, num_bounces=1, max_hits=16,
        cull_cluster=128, max_clusters=96,
        max_clusters_secondary=160, rays_per_call=65536)
    # reconstruct bounce-1 ray state exactly as the bounce core does
    tpx = 16
    ray_perm, _ = tile_pixel_order(H, W, tpx, tpx)
    dirs0 = np.asarray(primary_ray_directions(
        W, H, camera.fov_y, camera.c2w)).reshape(-1, 3)
    d0 = jnp.asarray(dirs0)
    o0 = jnp.broadcast_to(camera.origin, d0.shape)
    depth0 = jnp.asarray(steps.depth[0])
    # steps fields are in canonical (linear pixel) order after render; the
    # secondary origin/dir need the GGX sample - approximate with mirror
    # reflection off the primary normal (cone stats are what matter here)
    nrm = jnp.asarray(steps.normal[0])
    nlen = jnp.linalg.norm(nrm, axis=-1, keepdims=True)
    nrm = nrm / jnp.maximum(nlen, 1e-20)
    d1 = d0 - 2.0 * jnp.sum(d0 * nrm, -1, keepdims=True) * nrm
    o1 = o0 + depth0[:, None] * d0 + 1e-3 * d1
    alive = np.asarray(steps.alive[0]) > 0

    scene_lo = jnp.min(jnp.where(frames.valid[:, None], frames.mean,
                                 jnp.inf), axis=0)
    scene_hi = jnp.max(jnp.where(frames.valid[:, None], frames.mean,
                                 -jnp.inf), axis=0)
    pos_bits = morton_codes(o1, scene_lo, scene_hi, bits=5)
    qd = jnp.clip((d1 * 0.5 + 0.5) * 4.0, 0, 3).astype(jnp.uint32)
    keys = (jnp.where(jnp.asarray(alive), jnp.uint32(0), jnp.uint32(1 << 26))
            | (pos_bits << 6) | (qd[:, 0] << 4) | (qd[:, 1] << 2) | qd[:, 2])
    order = jnp.argsort(keys)
    o1s, d1s = o1[order], d1[order]

    out = {}
    for name, (ro, rd) in dict(
        primary=(o0[jnp.asarray(ray_perm)], d0[jnp.asarray(ray_perm)]),
        secondary=(o1s, d1s),
    ).items():
        rows = {}
        for tile in (256, 128, 64, 32):
            _c, _n, num, ovf, _td = select_candidates(
                rays_o=ro, rays_d=rd, bounds=bounds,
                near=jnp.float32(0.0 if name == "secondary" else 0.05),
                far=jnp.float32(50.0), tile=tile, max_clusters=512,
            )
            num = np.asarray(num).astype(np.float64)
            rows[tile] = dict(
                mean=round(float(num.mean()), 1),
                p50=round(float(np.percentile(num, 50)), 1),
                p90=round(float(np.percentile(num, 90)), 1),
                p99=round(float(np.percentile(num, 99)), 1),
                max=int(num.max()),
            )
            print(json.dumps({name: {tile: rows[tile]}}), flush=True)
        out[name] = rows

    # per-ray work upper bound comparison: mean candidates x rays is the
    # pair-math volume; finer tiles pay more tiles but fewer pairs each
    print(json.dumps({"summary": {
        k: {t: r["mean"] for t, r in v.items()} for k, v in out.items()
    }}))


if __name__ == "__main__":
    main()
