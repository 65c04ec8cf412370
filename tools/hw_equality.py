"""Cross-backend equality: Mosaic-on-hardware vs the CPU interpreter.

The suite proves the Pallas kernels' semantics in interpret mode
(tests/test_render_kernel.py, test_split_far.py), but Mosaic lowering on the
real chip (tiling, dynamic slices, f32 reduction order) is a different code
path.  This tool renders a FIXED small configuration of every kernel path
and dumps the raw outputs; run it once per backend and `--compare` the dumps:

  CPU baseline:  PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \\
                   python tools/hw_equality.py --out artifacts/hw_eq_cpu.npz
  TPU:           python tools/hw_equality.py --out artifacts/hw_eq_tpu.npz \\
                   --compare artifacts/hw_eq_cpu.npz

JAX's threefry PRNG is platform-invariant, so the jittered/GGX-sampled
passes draw identical randoms on both backends; any delta beyond float
reassociation noise (~1e-5 relative; GGX direction chaos can amplify it for
isolated rays at 2 bounces) is a hardware-lowering divergence.  Paths
covered: fused render (0/2 bounces), fused split-far render (0/2), the XLA
reference render (cross-backend fp noise floor), and the loss-fused
training forward+gradients, single-pass and split-far.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# fixed config - small enough for the CPU interpreter, exercises every path
N, RES, K, MC, MC_FAR, CLUSTER = 4096, 64, 16, 32, 8, 128


def _psnr(a, b):
    import numpy as np

    mse = float(np.mean((a - b) ** 2))
    return round(10 * np.log10(1.0 / max(mse, 1e-12)), 2)


def compute(interpret: bool):
    import numpy as np

    import jax
    import jax.numpy as jnp

    from editable_gaussian_reflections_tpu.ops.culling import (
        cluster_bounds,
        morton_order,
    )
    from editable_gaussian_reflections_tpu.ops.pallas.render_kernel import (
        pack_attr_table,
        pack_frame_table,
    )
    from editable_gaussian_reflections_tpu.ops.pallas.trace_kernel import (
        pack_frames,
    )
    from editable_gaussian_reflections_tpu.renderer.raytracer import (
        CameraParams,
        RayTargets,
        RenderSettings,
        render_frame,
        render_frame_fused,
        render_tile_with_grads_fused,
    )
    from editable_gaussian_reflections_tpu.scene.gaussian_scene import (
        build_frames,
        from_arrays,
    )
    from editable_gaussian_reflections_tpu.utils.synth import (
        room_camera,
        room_scene,
    )

    scene = from_arrays(**room_scene(N), pad_multiple=2048)
    eye, c2w = room_camera()
    camera = CameraParams(
        origin=jnp.asarray(eye), c2w=jnp.asarray(c2w),
        fov_y=jnp.asarray(0.9), znear=jnp.asarray(0.05),
        zfar=jnp.asarray(50.0))
    settings = RenderSettings()
    key = jax.random.PRNGKey(0)
    arrays = {}

    for nb in (0, 2):
        jit = nb == 2  # b0 deterministic, b2 exercises jitter + GGX draws
        for split in (False, True):
            t0 = time.time()
            _, final = render_frame_fused(
                scene, camera, settings, key, RES, RES, num_bounces=nb,
                max_hits=K, jitter=jit, cull_cluster=CLUSTER,
                max_clusters=MC, max_clusters_secondary=MC,
                rays_per_call=RES * RES, split_far=split, mc_far=MC_FAR,
                interpret=interpret)
            name = f"{'split' if split else 'fused'}_b{nb}"
            arrays[name] = np.asarray(final).reshape(RES, RES, 3)
            print(f"{name}: {time.time() - t0:.1f}s", flush=True)
        for mode in ("scan", "scanq"):
            t0 = time.time()
            _, final = render_frame_fused(
                scene, camera, settings, key, RES, RES, num_bounces=nb,
                max_hits=K, jitter=jit, cull_cluster=CLUSTER,
                max_clusters=MC, max_clusters_secondary=MC,
                rays_per_call=RES * RES, composite_mode=mode,
                interpret=interpret)
            name = f"{mode}_b{nb}"
            arrays[name] = np.asarray(final).reshape(RES, RES, 3)
            print(f"{name}: {time.time() - t0:.1f}s", flush=True)
        t0 = time.time()
        _, final = render_frame(
            scene, camera, settings, key, RES, RES, num_bounces=nb,
            max_hits=K, chunk=2048, tile=RES * RES, jitter=jit)
        arrays[f"xla_b{nb}"] = np.asarray(final).reshape(RES, RES, 3)
        print(f"xla_b{nb}: {time.time() - t0:.1f}s", flush=True)

    # loss-fused training forward + gradients ------------------------------
    frames, attrs = build_frames(
        scene, settings.alpha_threshold, settings.exp_power,
        settings.global_scale_factor)
    perm = morton_order(frames)
    frames = jax.tree_util.tree_map(lambda a: a[perm], frames)
    attrs = jax.tree_util.tree_map(lambda a: a[perm], attrs)
    scene_s = jax.tree_util.tree_map(lambda a: a[perm], scene)
    bounds = cluster_bounds(frames, CLUSTER)
    gpack = pack_frames(frames, attrs)
    table = pack_attr_table(attrs)
    ftable = pack_frame_table(frames, scene_s)

    rng = np.random.default_rng(0)
    R = 4096
    rays_o = jnp.asarray(np.tile(eye, (R, 1)).astype(np.float32))
    d = rng.normal(size=(R, 3)).astype(np.float32)
    rays_d = jnp.asarray(d / np.linalg.norm(d, axis=1, keepdims=True))
    targets = RayTargets(
        diffuse=jnp.asarray(rng.uniform(0, 1, (R, 3)), jnp.float32),
        specular=jnp.asarray(rng.uniform(0, 0.3, (R, 3)), jnp.float32),
        depth=jnp.asarray(rng.uniform(1, 5, (R,)), jnp.float32),
        normal=jnp.asarray(rng.normal(size=(R, 3)), jnp.float32),
        roughness=jnp.asarray(rng.uniform(0, 1, (R,)), jnp.float32),
        f0=jnp.asarray(rng.uniform(0, 1, (R, 3)), jnp.float32))
    gkey = jax.random.PRNGKey(7)
    kw = dict(gpack=gpack, table=table, ftable=ftable, bounds=bounds,
              cull_tile=256, cull_cluster=CLUSTER, max_clusters=MC,
              n_capacity=scene.capacity, interpret=interpret)
    for split in (False, True):
        t0 = time.time()
        _, fwd, grads = render_tile_with_grads_fused(
            rays_o, rays_d, targets, settings, jnp.float32(0.05),
            jnp.float32(50.0), gkey, 2, K, split_far=split,
            mc_far=MC_FAR, max_hits_far=K if split else 0, **kw)
        tag = "gsplit" if split else "gsingle"
        arrays[f"{tag}_fwd"] = np.asarray(fwd)
        for f in grads._fields:
            arrays[f"{tag}_{f}"] = np.asarray(getattr(grads, f))
        print(f"{tag}: {time.time() - t0:.1f}s", flush=True)
    return arrays


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="artifacts/hw_eq.npz")
    ap.add_argument("--compare", default=None,
                    help="baseline npz from the other backend")
    ap.add_argument("--recompare", action="store_true",
                    help="skip rendering; reload --out and re-run the "
                         "comparison (offline metric refresh)")
    args = ap.parse_args()

    import numpy as np

    if args.recompare:
        arrays = dict(np.load(args.out))
    else:
        import jax

        interpret = jax.default_backend() == "cpu"
        print(f"backend={jax.default_backend()} interpret={interpret}",
              flush=True)
        arrays = compute(interpret)
        os.makedirs(os.path.dirname(os.path.abspath(args.out)),
                    exist_ok=True)
        np.savez_compressed(args.out, **arrays)
        print("wrote", args.out)

    if args.compare:
        base = np.load(args.compare)
        report = {}
        for k in sorted(arrays):
            if k not in base:
                continue
            a, b = arrays[k], base[k]
            row = {
                "max_abs": round(float(np.abs(a - b).max()), 8),
                "mean_abs": round(float(np.abs(a - b).mean()), 9),
                "rel": round(float(np.abs(a - b).max())
                             / max(1e-9, float(np.abs(b).max())), 8),
            }
            if a.ndim == 3:
                row["psnr_delta"] = _psnr(a, b)
                # the DISPLAY metric: raw-HDR PSNR is dominated by a few
                # hot specular pixels (scan_b2 measured max_abs 185 from
                # bounce-1 re-tiling chaos); tonemapped+clamped is what a
                # viewer compares
                from editable_gaussian_reflections_tpu.ops.tonemap import (
                    tonemap,
                )
                import jax.numpy as jnp
                ta = np.clip(np.asarray(tonemap(jnp.asarray(a))), 0, 1)
                tb = np.clip(np.asarray(tonemap(jnp.asarray(b))), 0, 1)
                row["psnr_tonemapped"] = _psnr(ta, tb)
            report[k] = row
            print(json.dumps({k: row}), flush=True)
        path = os.path.splitext(args.out)[0] + "_vs_baseline.json"
        json.dump(report, open(path, "w"), indent=2)
        print("wrote", path)


if __name__ == "__main__":
    main()
