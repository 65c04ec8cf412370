"""Protocol sweep: isolate eval-protocol effects on reported PSNR.

VERDICT r2 weak #2: the train-time CSV showed specular 15.79 while the
128-spp metrics.json showed 9.77 at the same checkpoint - different spp,
denoise, and view subsets were confounded.  This tool renders the SAME
checkpoint over the SAME (all) test views at a grid of (spp, denoise)
settings and reports tonemapped clamped PSNR per pass, so protocol effects
are separated from bugs.  Writes eval_sweep.json into the model dir.

Usage: python tools/eval_sweep.py -m <model_dir> [--spp 1 16 128]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def psnr(a, b):
    m = float(np.mean((np.asarray(a, np.float64) - np.asarray(b, np.float64)) ** 2))
    return float(20.0 * np.log10(1.0 / np.sqrt(max(m, 1e-12))))


def main(argv=None):
    import jax

    from editable_gaussian_reflections_tpu.config import load_model_config
    from editable_gaussian_reflections_tpu.ops.tonemap import tonemap
    from editable_gaussian_reflections_tpu.renderer.denoise import (
        denoise_specular,
    )
    from editable_gaussian_reflections_tpu.renderer.raytracer import (
        render_accumulated_chunked,
    )
    from editable_gaussian_reflections_tpu.renderer.render import (
        camera_params,
        default_backend_kwargs,
    )
    from editable_gaussian_reflections_tpu.scene.scene import (
        Scene,
        search_for_max_iteration,
    )
    from editable_gaussian_reflections_tpu.training import settings_from_config
    import jax.numpy as jnp

    p = argparse.ArgumentParser(prog="eval_sweep", allow_abbrev=False)
    p.add_argument("--model_path", "-m", required=True)
    p.add_argument("--iteration", type=int, default=None)
    p.add_argument("--spp", type=int, nargs="*", default=[1, 16, 128])
    p.add_argument("--znear", type=float, default=1.0)
    args, unknown = p.parse_known_args(argv)
    cfg = load_model_config(args.model_path, unknown, prog="eval_sweep")

    iteration = args.iteration or search_for_max_iteration(
        os.path.join(args.model_path, "point_cloud"))
    scene = Scene(cfg, load_iteration=iteration, shuffle=False,
                  model_path=args.model_path)
    settings = settings_from_config(cfg)
    views = scene.getTestCameras()
    bk = default_backend_kwargs(cfg)

    def tm(x):
        return np.clip(np.asarray(tonemap(jnp.asarray(x, jnp.float32))), 0, 1)

    results = {}
    for spp in args.spp:
        for denoise in (False, True):
            key = f"spp{spp}_denoise{int(denoise)}"
            scores = dict(diffuse=0.0, specular=0.0, render=0.0)
            for idx, view in enumerate(views):
                cam = camera_params(view, znear=args.znear, zfar=view.zfar)
                H, W = view.image_height, view.image_width
                # same shape gate render.py uses (fused needs 16x16 pixel
                # tiles + cluster-padded capacity; fall back otherwise)
                from editable_gaussian_reflections_tpu.renderer.raytracer \
                    import fused_path_ok
                fused = bool(bk.get("use_pallas") and bk.get("use_culling")
                             and fused_path_ok(scene.gaussians, W, H,
                                               cfg.cull_cluster))
                steps, final = render_accumulated_chunked(
                    scene.gaussians, cam, settings, jax.random.PRNGKey(idx),
                    W, H, spp=spp, spp_chunk=16,
                    fused=fused,
                    num_bounces=2, max_hits=cfg.max_hits,
                    **({"cull_cluster": cfg.cull_cluster,
                        "max_clusters": cfg.max_clusters,
                        "max_clusters_secondary": (
                            getattr(cfg, "max_clusters_secondary", 0) or None),
                        "cull_tile_secondary": getattr(
                            cfg, "cull_tile_secondary", 256)}
                       if fused
                       else {"chunk": cfg.trace_chunk, "tile": cfg.ray_tile,
                             **bk}),
                )
                rgb = np.asarray(steps.rgb).reshape(-1, H, W, 3)
                final_img = np.asarray(final).reshape(H, W, 3)
                if denoise:
                    final_img = denoise_specular(
                        final_img,
                        rgb[0],
                        np.asarray(steps.normal[0]).reshape(H, W, 3),
                        np.asarray(steps.depth[0]).reshape(H, W),
                        np.asarray(steps.roughness[0]).reshape(H, W),
                        spp=spp)
                scores["diffuse"] += psnr(tm(rgb[0]),
                                          tm(view.diffuse_image))
                scores["specular"] += psnr(tm(rgb[1:].sum(0)),
                                           tm(view.specular_image))
                scores["render"] += psnr(tm(final_img),
                                         tm(view.original_image))
            results[key] = {k: round(v / len(views), 2)
                            for k, v in scores.items()}
            print(f"{key}: {results[key]}", flush=True)

    out = os.path.join(args.model_path, "eval_sweep.json")
    with open(out, "w") as f:
        json.dump(dict(iteration=iteration, n_views=len(views),
                       znear=args.znear, results=results), f, indent=2)
    print(f"-> {out}")


if __name__ == "__main__":
    main()
