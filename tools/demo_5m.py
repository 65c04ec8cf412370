"""5M-Gaussian stretch-config demo on the 8-device virtual mesh.

BASELINE.json configs[4] stretch goal: scenes too large to replicate.  Runs
ONE gaussian_sharded_train_step and ONE sharded trace at (padded) 5M
Gaussians on the virtual CPU mesh, recording per-device parameter/optimizer
bytes to substantiate the [N/S] memory claim (VERDICT r2 item 6).  The
training-state pytree stays sharded along "gauss" end to end: per-device
bytes must be ~1/8 of the replicated footprint.

Writes artifacts/demo_5m.json.  Run via:
  XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
  python tools/demo_5m.py [--n 5000000]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=5_000_000)
    ap.add_argument("--rays", type=int, default=64, help="side of the tiny ray grid")
    ap.add_argument("--out", default="artifacts/demo_5m.json")
    args = ap.parse_args()

    from editable_gaussian_reflections_tpu.config import Config
    from editable_gaussian_reflections_tpu.parallel.gaussian_sharded import (
        gaussian_sharded_train_step,
        gaussian_sharded_trace,
        shard_scene,
    )
    from editable_gaussian_reflections_tpu.renderer.raytracer import (
        CameraParams,
        RayTargets,
    )
    from editable_gaussian_reflections_tpu.scene.gaussian_scene import (
        build_frames,
        from_arrays,
    )
    from editable_gaussian_reflections_tpu.training import (
        init_train_state,
        lr_tree,
        settings_from_config,
    )
    from editable_gaussian_reflections_tpu.utils.synth import (
        room_camera,
        room_scene,
    )

    devices = jax.devices()
    S = len(devices)
    mesh = Mesh(np.array(devices), ("gauss",))
    print(f"devices: {S} x {devices[0].platform}")

    t0 = time.time()
    scene = from_arrays(**room_scene(args.n), pad_multiple=2048)
    scene = shard_scene(scene, S)
    n_cap = scene.capacity
    print(f"scene built: capacity {n_cap} ({time.time() - t0:.1f}s)")

    # shard the full train state [N/S] BEFORE any step so no device ever
    # holds a replicated copy
    state = init_train_state(scene)
    gspec = NamedSharding(mesh, P("gauss"))
    state = jax.tree_util.tree_map(
        lambda a: jax.device_put(a, gspec) if a.ndim >= 1
        and a.shape[0] == n_cap else a,
        state,
    )
    state = jax.block_until_ready(state)

    per_device = {}
    for d in devices:
        per_device[str(d.id)] = 0
    for leaf in jax.tree_util.tree_leaves(state):
        for shard in getattr(leaf, "addressable_shards", []):
            per_device[str(shard.device.id)] += shard.data.nbytes
    total_state = sum(per_device.values())
    max_dev = max(per_device.values())
    print(f"train-state bytes: total {total_state / 1e9:.2f} GB, "
          f"max/device {max_dev / 1e9:.3f} GB "
          f"(replicated would be {total_state / 1e9:.2f} GB/device)")

    eye, c2w = room_camera()
    camera = CameraParams(
        origin=jnp.asarray(eye), c2w=jnp.asarray(c2w),
        fov_y=jnp.asarray(0.9), znear=jnp.asarray(0.05),
        zfar=jnp.asarray(50.0))
    cfg = Config()
    settings = settings_from_config(cfg)
    W = H = args.rays
    R = W * H
    rng = np.random.default_rng(0)
    targets = RayTargets(
        diffuse=jnp.asarray(rng.uniform(0, 1, (R, 3)), jnp.float32),
        specular=jnp.asarray(rng.uniform(0, 0.3, (R, 3)), jnp.float32),
        depth=jnp.asarray(rng.uniform(1, 5, (R,)), jnp.float32),
        normal=jnp.asarray(rng.normal(size=(R, 3)), jnp.float32),
        roughness=jnp.asarray(rng.uniform(0, 1, (R,)), jnp.float32),
        f0=jnp.asarray(rng.uniform(0, 1, (R, 3)), jnp.float32))
    lrs = lr_tree(cfg, 10, 3.0)
    hyper = dict(beta_1=0.9, beta_2=0.999, scale_decay=0.9999,
                 apply_grads=1.0)

    t0 = time.time()
    new_state, metrics, _ = gaussian_sharded_train_step(
        mesh, state, camera, targets, settings, lrs, hyper,
        jax.random.PRNGKey(0), W, H, num_bounces=1, max_hits=8, chunk=2048)
    new_state = jax.block_until_ready(new_state)
    step_s = time.time() - t0
    l1 = float(metrics["l1_diffuse"])
    print(f"sharded train step: {step_s:.1f}s (incl. compile), l1 {l1:.4f}")

    # sharded render (trace) on a small ray grid
    frames_rays = 32
    dirs = np.zeros((frames_rays, 3), np.float32)
    dirs[:, 2] = 1.0
    dirs[:, 0] = np.linspace(-0.3, 0.3, frames_rays)
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    t0 = time.time()
    hits = gaussian_sharded_trace(
        mesh, new_state.scene, jnp.asarray(np.tile(eye, (frames_rays, 1)),
                                           jnp.float32),
        jnp.asarray(dirs), 3.0, jnp.float32(0.05), jnp.float32(50.0),
        max_hits=8, chunk=2048)
    hits = jax.block_until_ready(hits)
    trace_s = time.time() - t0
    n_hits = int(np.asarray(hits.valid).sum())
    print(f"sharded trace: {trace_s:.1f}s, {n_hits} hits")

    out = {
        "n_gaussians": int(n_cap),
        "n_devices": S,
        "train_state_bytes_total": int(total_state),
        "train_state_bytes_max_per_device": int(max_dev),
        "sharding_ratio": round(total_state / max_dev, 2),
        "train_step_seconds_incl_compile": round(step_s, 1),
        "train_l1_diffuse": l1,
        "trace_seconds_incl_compile": round(trace_s, 1),
        "trace_hits": n_hits,
    }
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=2)
    print(f"wrote {args.out}")
    assert total_state / max_dev > S * 0.9, (
        "train state is not [N/S]-sharded: max device holds "
        f"{max_dev / total_state:.0%}")


if __name__ == "__main__":
    main()
