"""Metrics CLI - twin of reference metrics.py:31-73.

Computes PSNR/SSIM (and LPIPS when torch weights are available offline) over
the saved render/diffuse/specular PNGs and writes metrics.json in the same
schema.
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np


def psnr_metric(pred, gt):
    m = np.mean((pred - gt) ** 2)
    return 100.0 if m == 0 else float(20.0 * np.log10(1.0 / np.sqrt(m)))


def ssim_metric(pred, gt, C1=0.01**2, C2=0.03**2, win=11, sigma=1.5):
    """Gaussian-windowed SSIM (matches torchmetrics defaults)."""
    from scipy.ndimage import gaussian_filter

    def chan(p, g):
        mu_p = gaussian_filter(p, sigma, truncate=(win // 2) / sigma)
        mu_g = gaussian_filter(g, sigma, truncate=(win // 2) / sigma)
        mu_p2, mu_g2, mu_pg = mu_p**2, mu_g**2, mu_p * mu_g
        sp = gaussian_filter(p * p, sigma, truncate=(win // 2) / sigma) - mu_p2
        sg = gaussian_filter(g * g, sigma, truncate=(win // 2) / sigma) - mu_g2
        spg = gaussian_filter(p * g, sigma, truncate=(win // 2) / sigma) - mu_pg
        num = (2 * mu_pg + C1) * (2 * spg + C2)
        den = (mu_p2 + mu_g2 + C1) * (sp + sg + C2)
        return np.mean(num / den)

    return float(np.mean([chan(pred[..., c], gt[..., c]) for c in range(pred.shape[-1])]))


def _ssim_cs(pred, gt, C1=0.01**2, C2=0.03**2, win=11, sigma=1.5):
    """Per-channel mean (ssim, contrast-structure) pair for MS-SSIM."""
    from scipy.ndimage import gaussian_filter

    tr = (win // 2) / sigma
    s_vals, cs_vals = [], []
    for c in range(pred.shape[-1]):
        p, g = pred[..., c], gt[..., c]
        mu_p = gaussian_filter(p, sigma, truncate=tr)
        mu_g = gaussian_filter(g, sigma, truncate=tr)
        mu_p2, mu_g2, mu_pg = mu_p**2, mu_g**2, mu_p * mu_g
        sp = gaussian_filter(p * p, sigma, truncate=tr) - mu_p2
        sg = gaussian_filter(g * g, sigma, truncate=tr) - mu_g2
        spg = gaussian_filter(p * g, sigma, truncate=tr) - mu_pg
        cs = (2 * spg + C2) / (sp + sg + C2)
        lum = (2 * mu_pg + C1) / (mu_p2 + mu_g2 + C1)
        s_vals.append(np.mean(lum * cs))
        cs_vals.append(np.mean(cs))
    return float(np.mean(s_vals)), float(np.mean(cs_vals))


MSSSIM_WEIGHTS = (0.0448, 0.2856, 0.3001, 0.2363, 0.1333)  # Wang et al. 2003


def msssim_metric(pred, gt):
    """Multi-scale SSIM: a REAL weight-free perceptual metric shipped
    alongside the lpips_rand substitute (pretrained-VGG LPIPS needs weights
    this environment cannot fetch).  Standard 5-scale protocol: contrast-
    structure at every scale, luminance only at the coarsest, 2x average-
    pool between scales."""
    vals = []
    p, g = pred, gt
    for i, w in enumerate(MSSSIM_WEIGHTS):
        s, cs = _ssim_cs(p, g)
        vals.append(max(s if i == len(MSSSIM_WEIGHTS) - 1 else cs, 1e-6))
        if i < len(MSSSIM_WEIGHTS) - 1:
            h, wd = (p.shape[0] // 2) * 2, (p.shape[1] // 2) * 2
            p = p[:h, :wd].reshape(h // 2, 2, wd // 2, 2, -1).mean((1, 3))
            g = g[:h, :wd].reshape(h // 2, 2, wd // 2, 2, -1).mean((1, 3))
    return float(np.prod([v**w for v, w in zip(vals, MSSSIM_WEIGHTS)]))


class RandomVGGLPIPS:
    """Offline-capable LPIPS substitute (reference metrics.py:31-73 uses
    torchmetrics LPIPS with pretrained VGG weights, which cannot be fetched
    in a zero-egress environment).

    A VGG-16-topology feature stack with DETERMINISTIC He-initialized random
    weights (seed 0) and LPIPS-style scoring: per-layer unit-normalized
    channel features, squared differences averaged over space and channels,
    summed over layers.  Randomly-initialized conv features are an
    established perceptual-distance fallback (Zhang et al. 2018 report
    untrained AlexNet/VGG variants track human judgments well above PSNR /
    SSIM); absolute values are NOT comparable to pretrained-LPIPS numbers,
    so metrics.json labels the field "lpips_rand"."""

    CHANNELS = (64, 128, 256, 512, 512)
    BLOCKS = (2, 2, 3, 3, 3)

    def __init__(self, seed: int = 0):
        rng = np.random.default_rng(seed)
        self.weights = []
        cin = 3
        for cout, blocks in zip(self.CHANNELS, self.BLOCKS):
            layer = []
            for _ in range(blocks):
                w = rng.normal(
                    0.0, np.sqrt(2.0 / (9 * cin)), (3, 3, cin, cout)
                ).astype(np.float32)
                layer.append(w)
                cin = cout
            self.weights.append(layer)
        self._fn = None

    def _build(self):
        import jax
        import jax.numpy as jnp

        weights = [[jnp.asarray(w) for w in layer] for layer in self.weights]
        mean = jnp.asarray([0.485, 0.456, 0.406])
        std = jnp.asarray([0.229, 0.224, 0.225])

        def features(x):          # x: [H, W, 3] in [0, 1]
            x = (x - mean) / std
            x = x[None]
            feats = []
            for layer in weights:
                for w in layer:
                    x = jax.lax.conv_general_dilated(
                        x, w, (1, 1), "SAME",
                        dimension_numbers=("NHWC", "HWIO", "NHWC"))
                    x = jax.nn.relu(x)
                feats.append(x)
                x = jax.lax.reduce_window(
                    x, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1),
                    "VALID")
            return feats

        def dist(a, b):
            fa, fb = features(a), features(b)
            total = 0.0
            for xa, xb in zip(fa, fb):
                na = xa / jnp.sqrt(
                    jnp.sum(xa * xa, axis=-1, keepdims=True) + 1e-10)
                nb = xb / jnp.sqrt(
                    jnp.sum(xb * xb, axis=-1, keepdims=True) + 1e-10)
                total = total + jnp.mean(jnp.sum((na - nb) ** 2, axis=-1))
            return total

        self._fn = jax.jit(dist)

    def __call__(self, pred, gt) -> float:
        if self._fn is None:
            self._build()
        return float(self._fn(pred.astype(np.float32), gt.astype(np.float32)))


def main(argv=None):
    p = argparse.ArgumentParser(prog="metrics", allow_abbrev=False)
    p.add_argument("--model_path", "-m", required=True)
    p.add_argument("--render_passes", nargs="*",
                   default=["diffuse", "specular", "render"])
    p.add_argument("--metrics", nargs="*", default=["psnr"])
    p.add_argument("--split", default="test")
    p.add_argument("--iteration", type=int, default=8000)
    p.add_argument("--num_frames", type=int, default=100)
    args = p.parse_args(argv)

    from PIL import Image

    scores = {rp: {m: 0.0 for m in args.metrics} for rp in args.render_passes}
    counts = {rp: 0 for rp in args.render_passes}
    base = os.path.join(args.model_path, args.split, f"ours_{args.iteration}")
    lpips = RandomVGGLPIPS() if "lpips" in args.metrics else None

    for rp in args.render_passes:
        pred_dir = os.path.join(base, rp)
        gt_dir = os.path.join(base, rp + "_gt")
        if not os.path.isdir(pred_dir):
            continue
        for i in range(args.num_frames):
            pf = os.path.join(pred_dir, f"{i:05d}_{rp}.png")
            gf = os.path.join(gt_dir, f"{i:05d}_{rp}.png")
            if not (os.path.exists(pf) and os.path.exists(gf)):
                continue
            pred = np.asarray(Image.open(pf).convert("RGB"), np.float32) / 255.0
            gt = np.asarray(Image.open(gf).convert("RGB"), np.float32) / 255.0
            counts[rp] += 1
            if "psnr" in args.metrics:
                scores[rp]["psnr"] += psnr_metric(pred, gt)
            if "ssim" in args.metrics:
                scores[rp]["ssim"] += ssim_metric(pred, gt)
            if "msssim" in args.metrics:
                scores[rp]["msssim"] += msssim_metric(pred, gt)
            if lpips is not None:
                scores[rp]["lpips"] += lpips(pred, gt)

    for rp in args.render_passes:
        for m in list(scores[rp]):
            if counts[rp]:
                scores[rp][m] = round(scores[rp][m] / counts[rp], 4)
        if "lpips" in scores[rp]:
            # random-weight substitute - flag it so numbers are never
            # mistaken for pretrained-VGG LPIPS (see RandomVGGLPIPS)
            scores[rp]["lpips_rand"] = scores[rp].pop("lpips")

    print(json.dumps(scores, indent=4))
    with open(os.path.join(args.model_path, "metrics.json"), "w") as f:
        json.dump(scores, f, indent=4)


if __name__ == "__main__":
    main()
