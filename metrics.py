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


class PretrainedVGGLPIPS:
    """REAL LPIPS (Zhang et al. 2018), exactly the reference's
    torchmetrics-VGG configuration (reference metrics.py:31-73), computed in
    JAX from checkpoint files on disk:

      - the torchvision VGG16 backbone state_dict
        (``vgg16-397923af.pth``; env LPIPS_VGG_WEIGHTS or
        ~/.cache/torch/hub/checkpoints/vgg16-397923af.pth), and
      - the LPIPS v0.1 linear calibration heads
        (``vgg.pth`` from the lpips package; env LPIPS_LIN_WEIGHTS or
        <site-packages>/lpips/weights/v0.1/vgg.pth or
        ~/.cache/lpips/vgg.pth).

    Pipeline (matches lpips.LPIPS(net='vgg') source): input [0,1] -> [-1,1]
    -> ScalingLayer (shift/scale constants below) -> VGG16 features tapped
    at relu1_2/relu2_2/relu3_3/relu4_3/relu5_3 -> channel-unit-normalize ->
    squared difference -> 1x1 nonnegative linear head -> spatial mean ->
    sum over the 5 taps.  This environment has no network, so the
    checkpoints usually aren't present: ``available()`` gates usage and
    metrics.py falls back to RandomVGGLPIPS (field "lpips_rand") - but any
    deployment that drops the two standard files in gets real,
    paper-comparable LPIPS numbers (field "lpips").  The weight conversion
    + math are equality-tested against a torch replica of the published
    architecture (tests/test_metrics_lpips.py)."""

    SHIFT = (-0.030, -0.088, -0.188)
    SCALE = (0.458, 0.448, 0.450)
    BLOCKS = (2, 2, 3, 3, 3)  # convs per tap block (VGG16)

    @staticmethod
    def _vgg_path():
        p = os.environ.get("LPIPS_VGG_WEIGHTS") or os.path.expanduser(
            "~/.cache/torch/hub/checkpoints/vgg16-397923af.pth")
        return p if os.path.exists(p) else None

    @staticmethod
    def _lin_path():
        cands = [os.environ.get("LPIPS_LIN_WEIGHTS"),
                 os.path.expanduser("~/.cache/lpips/vgg.pth")]
        try:
            import lpips as _lp  # noqa: F401 - optional
            cands.append(os.path.join(os.path.dirname(_lp.__file__),
                                      "weights", "v0.1", "vgg.pth"))
        except ImportError:
            pass
        for p in cands:
            if p and os.path.exists(p):
                return p
        return None

    @classmethod
    def available(cls) -> bool:
        return cls._vgg_path() is not None and cls._lin_path() is not None

    def __init__(self, vgg_path=None, lin_path=None):
        import torch

        vgg_path = vgg_path or self._vgg_path()
        lin_path = lin_path or self._lin_path()
        if not vgg_path or not lin_path:
            raise FileNotFoundError(
                "LPIPS checkpoints not found (see PretrainedVGGLPIPS "
                "docstring for the expected locations)")
        vgg = torch.load(vgg_path, map_location="cpu", weights_only=True)
        lin = torch.load(lin_path, map_location="cpu", weights_only=True)
        # torchvision layout: features.<idx>.weight [out, in, 3, 3] with
        # idx skipping ReLU/MaxPool slots; collect convs in order.
        conv_ids = sorted(
            {int(k.split(".")[1]) for k in vgg if k.startswith("features.")
             and k.endswith(".weight")})
        convs = [(vgg[f"features.{i}.weight"].numpy(),
                  vgg[f"features.{i}.bias"].numpy()) for i in conv_ids]
        if len(convs) != sum(self.BLOCKS):
            raise ValueError(f"expected VGG16 ({sum(self.BLOCKS)} convs), "
                             f"got {len(convs)}")
        self.conv_blocks, i = [], 0
        for b in self.BLOCKS:
            self.conv_blocks.append(
                [(np.transpose(w, (2, 3, 1, 0)).astype(np.float32),  # HWIO
                  b_.astype(np.float32)) for w, b_ in convs[i:i + b]])
            i += b
        # lpips lin heads: lin<k>.model.1.weight [1, C, 1, 1]
        self.lins = []
        for k in range(5):
            for key in (f"lin{k}.model.1.weight", f"lins.{k}.model.1.weight"):
                if key in lin:
                    self.lins.append(
                        lin[key].numpy().reshape(-1).astype(np.float32))
                    break
            else:
                raise KeyError(f"lin{k} head missing from {lin_path}")
        self._fn = None

    def _build(self):
        import jax
        import jax.numpy as jnp

        blocks = [[(jnp.asarray(w), jnp.asarray(b)) for w, b in blk]
                  for blk in self.conv_blocks]
        lins = [jnp.asarray(l) for l in self.lins]
        shift = jnp.asarray(self.SHIFT)
        scale = jnp.asarray(self.SCALE)

        def features(x):          # x: [H, W, 3] in [0, 1]
            x = (2.0 * x - 1.0 - shift) / scale
            x = x[None]
            feats = []
            for bi, blk in enumerate(blocks):
                if bi:
                    x = jax.lax.reduce_window(
                        x, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1),
                        "VALID")
                for w, b in blk:
                    x = jax.lax.conv_general_dilated(
                        x, w, (1, 1), "SAME",
                        dimension_numbers=("NHWC", "HWIO", "NHWC")) + b
                    x = jax.nn.relu(x)
                feats.append(x)
            return feats

        def dist(a, b):
            total = 0.0
            for xa, xb, lw in zip(features(a), features(b), lins):
                na = xa / jnp.sqrt(
                    jnp.sum(xa * xa, axis=-1, keepdims=True) + 1e-10)
                nb = xb / jnp.sqrt(
                    jnp.sum(xb * xb, axis=-1, keepdims=True) + 1e-10)
                total = total + jnp.mean(
                    jnp.sum((na - nb) ** 2 * lw, axis=-1))
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
    lpips = None
    lpips_real = False
    if "lpips" in args.metrics:
        if PretrainedVGGLPIPS.available():
            lpips, lpips_real = PretrainedVGGLPIPS(), True
        else:
            lpips = RandomVGGLPIPS()

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
        if "lpips" in scores[rp] and not lpips_real:
            # random-weight substitute - flag it so numbers are never
            # mistaken for pretrained-VGG LPIPS (see RandomVGGLPIPS);
            # with the real checkpoints on disk the field stays "lpips"
            scores[rp]["lpips_rand"] = scores[rp].pop("lpips")

    print(json.dumps(scores, indent=4))
    with open(os.path.join(args.model_path, "metrics.json"), "w") as f:
        json.dump(scores, f, indent=4)


if __name__ == "__main__":
    main()
