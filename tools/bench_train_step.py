"""Time the fused training step at reference resolution (VERDICT r2 item 3).

Measures seconds/iteration of the jitted `train_step` (pallas backend,
culled fused path: slots kernel + loss-fused backward + Pallas gradient
scatter) on the synthetic room at the parity configuration - 768px,
100k dense + 75k far-field Gaussians - the config whose round-2 cost
(11.2 s/iter via the XLA segment-sum scatter) gated reference-resolution
training.  Reference analog: train.py's iteration loop around
forward_pass.cu/backward_pass.cu.

Usage: python tools/bench_train_step.py [--res 768] [--n 175000]
       [--iters 3] [--xla-scatter]  (--xla-scatter forces the old
       segment-sum path for an A/B)
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
    ap.add_argument("--res", type=int, default=768)
    ap.add_argument("--n", type=int, default=175_000)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--bounces", type=int, default=2)
    ap.add_argument("--max_hits", type=int, default=32)
    ap.add_argument("--ray_tile", type=int, default=65536)
    ap.add_argument("--cull_cluster", type=int, default=256)
    ap.add_argument("--max_clusters", type=int, default=192)
    ap.add_argument("--mxu-scatter", action="store_true",
                    help="opt into the Pallas MXU scatter kernel (A/B; "
                         "measured 12.0 vs 7.35 s/iter at the default "
                         "config - the XLA scatter-add is the default)")
    # kept for compatibility with earlier A/B invocations: now a no-op
    # because the XLA scatter IS the default
    ap.add_argument("--xla-scatter", action="store_true")
    ap.add_argument("--split_far", action="store_true",
                    help="two-pass near/far split per bounce (exact; the "
                         "far-field shell culls by ray direction)")
    ap.add_argument("--mc_far", type=int, default=32)
    ap.add_argument("--max_hits_far", type=int, default=0)
    args = ap.parse_args()

    import numpy as np

    import jax
    import jax.numpy as jnp

    if args.mxu_scatter:
        from editable_gaussian_reflections_tpu.renderer import raytracer
        raytracer.render_tile_with_grads_fused.__kwdefaults__[
            "use_mxu_scatter"] = True

    from editable_gaussian_reflections_tpu.renderer.raytracer import (
        CameraParams,
        RenderSettings,
        RayTargets,
    )
    from editable_gaussian_reflections_tpu.scene.gaussian_scene import (
        from_arrays,
    )
    from editable_gaussian_reflections_tpu.training import (
        init_train_state,
        train_step,
    )
    from editable_gaussian_reflections_tpu.utils.synth import (
        room_camera,
        room_scene,
    )

    W = H = args.res
    scene = from_arrays(**room_scene(args.n), pad_multiple=2048)
    print(f"scene capacity {scene.capacity} ({args.n} requested), "
          f"{W}x{H} = {W * H} rays", file=sys.stderr)

    eye, c2w = room_camera()
    camera = CameraParams(
        origin=jnp.asarray(eye), c2w=jnp.asarray(c2w),
        fov_y=jnp.asarray(0.9), znear=jnp.asarray(0.05),
        zfar=jnp.asarray(50.0),
    )
    settings = RenderSettings()
    R = W * H
    targets = RayTargets(
        diffuse=jnp.zeros((R, 3), jnp.float32),
        specular=jnp.zeros((R, 3), jnp.float32),
        depth=jnp.zeros((R,), jnp.float32),
        normal=jnp.zeros((R, 3), jnp.float32),
        roughness=jnp.zeros((R,), jnp.float32),
        f0=jnp.zeros((R, 3), jnp.float32),
    )
    state = init_train_state(scene)
    lrs = {f: 1e-4 for f in
           ("xyz", "scaling", "rotation", "opacity", "diffuse", "normal",
            "f0", "roughness")}
    hyper = dict(beta_1=0.9, beta_2=0.999, scale_decay=1.0, apply_grads=1.0)

    step_kw = dict(
        width=W, height=H, num_bounces=args.bounces,
        max_hits=args.max_hits, chunk=2048, tile=args.ray_tile,
        jitter=True, use_pallas=True, exp_power_static=3.0,
        use_culling=True, cull_tile=256, cull_cluster=args.cull_cluster,
        max_clusters=args.max_clusters,
        split_far=args.split_far, mc_far=args.mc_far,
        max_hits_far=args.max_hits_far,
    )

    key = jax.random.PRNGKey(0)
    t0 = time.perf_counter()
    state1, metrics = train_step(state, camera, targets, settings, lrs,
                                 hyper, key, **step_kw)
    l1 = float(np.asarray(metrics["l1_diffuse"]))  # forces the real compile
    t_compile = time.perf_counter() - t0
    print(f"compile+first-step {t_compile:.1f} s, l1 {l1:.4f}",
          file=sys.stderr)

    t0 = time.perf_counter()
    st = state1
    for i in range(args.iters):
        st, metrics = train_step(st, camera, targets, settings, lrs, hyper,
                                 jax.random.fold_in(key, i), **step_kw)
    np.asarray(metrics["l1_diffuse"])  # drain
    dt = (time.perf_counter() - t0) / args.iters

    print(json.dumps({
        "metric": "fused_train_step",
        "res": args.res, "n": args.n,
        "scatter": "mxu" if args.mxu_scatter else "xla",
        "split_far": bool(args.split_far),
        "s_per_iter": round(dt, 3),
    }))


if __name__ == "__main__":
    main()
