"""Benchmark driver: renders the flagship scene on real hardware and prints ONE
JSON line {"metric", "value", "unit", "vs_baseline"}.

Metric: primary-ray throughput in Mrays/s for a full 2-bounce PBR render at
800x800 with a 100k-Gaussian synthetic scene (the reference's scale ballpark:
init 100k dense + 75k far-field, BASELINE.md).  vs_baseline compares against
30 FPS at 1080p (the BASELINE.json north-star target for v5p-8):
30 * 1920 * 1080 rays/s = 62.2 Mrays/s.
"""

from __future__ import annotations

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from editable_gaussian_reflections_tpu.renderer.raytracer import (
        CameraParams,
        RenderSettings,
        render_frame,
    )
    from editable_gaussian_reflections_tpu.scene.gaussian_scene import from_arrays

    rng = np.random.default_rng(0)
    n = 100_000
    width = height = 800
    scene = from_arrays(
        xyz=(rng.uniform(-2, 2, (n, 3)) + np.array([0, 0, 5])).astype(np.float32),
        scaling=rng.uniform(-4.5, -3.0, (n, 3)).astype(np.float32),
        rotation=rng.normal(size=(n, 4)).astype(np.float32),
        opacity=rng.uniform(-2, 2, n).astype(np.float32),
        diffuse=rng.uniform(0, 1, (n, 3)).astype(np.float32),
        normal=rng.normal(size=(n, 3)).astype(np.float32),
        f0=rng.uniform(0, 0.5, (n, 3)).astype(np.float32),
        roughness=rng.uniform(0, 1, n).astype(np.float32),
        pad_multiple=2048,
    )
    camera = CameraParams(
        origin=jnp.zeros(3),
        c2w=jnp.asarray(np.diag([1.0, 1.0, -1.0]).astype(np.float32)),
        fov_y=jnp.asarray(0.8),
        znear=jnp.asarray(0.1),
        zfar=jnp.asarray(100.0),
    )
    settings = RenderSettings()
    key = jax.random.PRNGKey(0)

    kwargs = dict(num_bounces=2, max_hits=32, chunk=1024, tile=4000)

    # warmup/compile: on the axon backend the real compile happens lazily at
    # the first transfer, so force with an actual device_get
    steps, final = render_frame(scene, camera, settings, key, width, height, **kwargs)
    np.asarray(final)

    iters = 5
    t0 = time.perf_counter()
    for i in range(iters):
        steps, final = render_frame(
            scene, camera, settings, jax.random.fold_in(key, i),
            width, height, **kwargs,
        )
    np.asarray(final)  # drain the dispatch queue
    dt = (time.perf_counter() - t0) / iters

    rays_per_s = width * height / dt
    mrays = rays_per_s / 1e6
    baseline_mrays = 30 * 1920 * 1080 / 1e6  # 30 FPS @ 1080p north star
    print(json.dumps({
        "metric": "render_throughput_2bounce_100k_gaussians",
        "value": round(mrays, 3),
        "unit": "Mrays/s",
        "vs_baseline": round(mrays / baseline_mrays, 4),
    }))


if __name__ == "__main__":
    main()
