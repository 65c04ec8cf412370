"""End-to-end fused-renderer bench: kbuffer vs scan composite mode.

Renders the bench room (utils/synth.py) at full resolution through
render_frame_fused in both modes, reporting per-frame ms / Mrays/s, the
starved-ray fraction, and the cross-mode PSNR (tonemapped, clamped - the
metrics.py convention) so the scan mode's streaming-order approximation is
quantified at REAL tile granularity (16x16-pixel primary tiles), not the
adversarial 32x32 probe of the unit tests."""

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
    ap.add_argument("--bounces", type=int, default=2)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--configs", type=str,
                    default="kbuffer:128:16:96:192,scan:32:16:128:256,"
                            "scan:32:16:192:384,scan:64:16:128:256",
                    help="mode:cluster:max_hits:mc_prim:mc_sec[:key=val...]"
                         " extra keys: far=N (split_far w/ mc_far=N),"
                         " tsec=N (cull_tile_secondary), tcut=F (secondary"
                         " throughput cutoff), kfar=N (max_hits_far),"
                         " ns=1 (kernel_stats off), ap=bf16 (scanq attr-dot"
                         " single-pass bf16)")
    args = ap.parse_args()

    import numpy as np

    import jax
    import jax.numpy as jnp

    from editable_gaussian_reflections_tpu.ops.tonemap import tonemap
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
    settings = RenderSettings()
    key = jax.random.PRNGKey(0)
    n_rays = W * H * (args.bounces + 1)

    ref_img = None
    results = []
    for cfg in args.configs.split(","):
        parts = cfg.split(":")
        mode, cl, k, mcp, mcs = (parts[0], int(parts[1]), int(parts[2]),
                                 int(parts[3]), int(parts[4]))
        extra = dict(p.split("=", 1) for p in parts[5:] if "=" in p)
        # bare 6th field = mc_far (back-compat with the r4 sweep logs)
        mc_far = int(parts[5]) if len(parts) > 5 and "=" not in parts[5] \
            else int(extra.get("far", 0))
        tsec = int(extra.get("tsec", 256))
        tcut = float(extra.get("tcut", 0.0))
        kfar = int(extra.get("kfar", 0))
        nstats = int(extra.get("ns", 0))
        ap = extra.get("ap", "highest")
        cfg_settings = settings if tcut <= 0 else settings._replace(
            secondary_throughput_threshold=tcut)
        fn = lambda kk: render_frame_fused(  # noqa: E731
            scene, camera, cfg_settings, kk, W, H, num_bounces=args.bounces,
            max_hits=k, cull_cluster=cl, max_clusters=mcp,
            max_clusters_secondary=mcs, composite_mode=mode,
            split_far=mc_far > 0, mc_far=max(mc_far, 32),
            cull_tile_secondary=tsec, max_hits_far=kfar,
            kernel_stats=not nstats, attr_precision=ap,
        )
        try:
            steps, final = fn(key)
            img = np.asarray(final)
        except Exception as e:  # noqa: BLE001 - sweep survives one bad cfg
            print(json.dumps({"cfg": cfg, "error": str(e)[-200:]}),
                  flush=True)
            continue
        ovf = np.asarray(steps.overflow)
        starved = float(ovf.mean())
        per_pass = [round(float(x), 4) for x in ovf.reshape(ovf.shape[0], -1).mean(axis=1)]
        t0 = time.perf_counter()
        for i in range(args.iters):
            steps, final = fn(jax.random.fold_in(key, i + 1))
        np.asarray(final)
        dt = (time.perf_counter() - t0) / args.iters

        rec = {"cfg": cfg, "ms": round(dt * 1e3, 1),
               "mrays": round(n_rays / dt / 1e6, 3),
               "starved": round(starved, 4), "starved_per_pass": per_pass}
        tm = np.clip(np.asarray(tonemap(jnp.asarray(img))), 0.0, 1.0)
        if ref_img is None:
            ref_img = tm
            rec["role"] = "reference"
        else:
            mse = float(((tm - ref_img) ** 2).mean())
            rec["psnr_vs_kbuffer"] = round(-10 * np.log10(max(mse, 1e-12)),
                                           2)
        print(json.dumps(rec), flush=True)
        results.append((rec, dict(mode=mode, cl=cl, k=k, mcp=mcp, mcs=mcs,
                                  mc_far=mc_far, tsec=tsec, tcut=tcut,
                                  kfar=kfar, nstats=nstats, ap=ap)))

    # record the fastest HONEST config (starved < 1% on EVERY pass - the
    # bench.py adoption hook, VERDICT r4 #2) in parse_render_config format
    honest = [(r, p) for r, p in results
              if r.get("starved_per_pass") and max(r["starved_per_pass"]) < 0.01
              # quality floor: the streaming-order approximation itself
              # measures ~28.7 dB vs kbuffer at real tile granularity; a
              # knob that degrades the image below that (e.g. a lossy
              # precision mode) must not become the committed bench
              and r.get("psnr_vs_kbuffer", 99.0) >= 27.0]
    if honest:
        best, p = max(honest, key=lambda rp: rp[0]["mrays"])
        mc_str = f"{p['mcp']}:{p['mcs']}:{p['tsec']}:256"
        if p["mc_far"]:
            mc_str += f":s{p['mc_far']}"
            if p["kfar"]:
                mc_str += f":k{p['kfar']}"
        if p["tcut"] > 0:
            import math
            # fractional exponent so non-decade cutoffs (e.g. 3e-3 ->
            # tc2.52) round-trip through parse_render_config exactly
            # instead of collapsing to the nearest decade
            mc_str += f":tc{round(-math.log10(p['tcut']), 2):g}"
        path = os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "artifacts", "bench_best.json")
        try:
            prev = json.load(open(path))
        except (OSError, ValueError):
            prev = None
        # frame-rate comparison must be like-for-like: mrays here counts
        # all (bounces+1) passes, bench_render_sweep counts pixels only
        frame_mrays = best["mrays"] / (args.bounces + 1)
        if prev is None or frame_mrays > prev.get("mrays", 0):
            rec = dict(mc=mc_str, mrays=round(frame_mrays, 3),
                       starved=best["starved_per_pass"], max_hits=p["k"],
                       cluster=p["cl"], mode=p["mode"],
                       kernel_stats=not p["nstats"],
                       attr_precision=p["ap"],
                       psnr_vs_kbuffer=best.get("psnr_vs_kbuffer"))
            os.makedirs(os.path.dirname(path), exist_ok=True)
            json.dump(rec, open(path, "w"))
            print(f"bench_best.json updated: {rec}", file=sys.stderr)


if __name__ == "__main__":
    main()
