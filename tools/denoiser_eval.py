"""Denoiser evidence (VERDICT r1 item 7): does the a-trous filter help?

Renders the synthetic room at several SPP levels with and without the
normal/depth-guided a-trous denoiser (renderer/denoise.py - the OptiX HDR
denoiser replacement, reference optix/denoiser_wrapper.h:22-104) and reports
PSNR against a high-SPP converged reference.  Writes denoiser_eval.json.

Usage: python tools/denoiser_eval.py [--out /tmp/denoiser_eval.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def psnr(a, b):
    m = np.mean((a - b) ** 2)
    return float(20.0 * np.log10(1.0 / np.sqrt(max(m, 1e-12))))


def main(argv=None):
    import jax
    import jax.numpy as jnp

    from editable_gaussian_reflections_tpu.ops.tonemap import tonemap
    from editable_gaussian_reflections_tpu.renderer.denoise import (
        atrous_denoise,
        denoise_specular,
    )
    from editable_gaussian_reflections_tpu.renderer.raytracer import (
        CameraParams,
        RenderSettings,
        render_accumulated_chunked,
    )
    from editable_gaussian_reflections_tpu.scene.gaussian_scene import (
        from_arrays,
    )
    from editable_gaussian_reflections_tpu.utils.synth import (
        room_camera,
        room_scene,
    )

    p = argparse.ArgumentParser(prog="denoiser_eval", allow_abbrev=False)
    p.add_argument("--out", default="/tmp/denoiser_eval.json")
    p.add_argument("--size", type=int, default=256)
    p.add_argument("--ref_spp", type=int, default=256)
    p.add_argument("--spp", type=int, nargs="*", default=[1, 8, 32, 128])
    args = p.parse_args(argv)

    scene = from_arrays(**room_scene(100_000), pad_multiple=2048)
    eye, c2w = room_camera()
    camera = CameraParams(
        origin=jnp.asarray(eye), c2w=jnp.asarray(c2w),
        fov_y=jnp.asarray(0.9), znear=jnp.asarray(0.05),
        zfar=jnp.asarray(50.0))
    settings = RenderSettings()
    H = W = args.size

    def render(spp, key):
        # host-chunked SPP (<=16 per dispatch): 128-spp single dispatches
        # trip the device watchdog (round-2 crash)
        steps, final = render_accumulated_chunked(
            scene, camera, settings, jax.random.PRNGKey(key), W, H,
            spp=spp, spp_chunk=16, fused=True,
            num_bounces=2, max_hits=32, cull_cluster=128,
            max_clusters=128)
        return (np.asarray(final).reshape(H, W, 3),
                np.asarray(steps.rgb[0]).reshape(H, W, 3),
                np.asarray(steps.normal[0]).reshape(H, W, 3),
                np.asarray(steps.depth[0]).reshape(H, W),
                np.asarray(steps.roughness[0]).reshape(H, W))

    def display(img):
        return np.clip(np.asarray(tonemap(jnp.asarray(img))), 0, 1)

    ref_img, _, _, _, _ = render(args.ref_spp, 999)
    ref = display(ref_img)

    results = {}
    for spp in args.spp:
        img, diffuse, normal, depth, rough = render(spp, 0)
        plain = psnr(display(img), ref)
        legacy = psnr(display(atrous_denoise(img, normal, depth, spp=spp)),
                      ref)
        atrous = psnr(display(denoise_specular(img, diffuse, normal, depth,
                                               rough, spp=spp,
                                               learned=False)), ref)
        # the default path: learned KPN when the shipped weights exist,
        # else identical to the a-trous number
        den = psnr(display(denoise_specular(img, diffuse, normal, depth,
                                            rough, spp=spp)), ref)
        results[str(spp)] = dict(psnr=round(plain, 2),
                                 psnr_denoised=round(den, 2),
                                 gain_db=round(den - plain, 2),
                                 atrous_gain_db=round(atrous - plain, 2),
                                 legacy_gain_db=round(legacy - plain, 2))
        print(f"spp={spp:4d}: psnr={plain:6.2f}  denoised={den:6.2f}  "
              f"gain={den - plain:+.2f} dB (atrous {atrous - plain:+.2f}, "
              f"legacy {legacy - plain:+.2f})")

    with open(args.out, "w") as f:
        json.dump(dict(size=args.size, ref_spp=args.ref_spp,
                       results=results), f, indent=2)
    print(f"-> {args.out}")


if __name__ == "__main__":
    main()
