"""PretrainedVGGLPIPS (JAX) vs a torch replica of the published LPIPS
architecture (Zhang et al. 2018, lpips.LPIPS(net='vgg') v0.1).

No pretrained weights exist in this offline environment, so the test builds
RANDOM weights in the exact torchvision-VGG16 / lpips-linear-head checkpoint
layouts, computes LPIPS with an independent torch implementation of the
published math, and asserts the JAX loader+pipeline reproduces it.  That
proves dropping the official files in yields real LPIPS numbers."""

import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from metrics import PretrainedVGGLPIPS  # noqa: E402

# torchvision VGG16 "features" conv indices (conv slots among ReLU/MaxPool)
VGG16_CONV_IDS = [0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28]
CHANNELS = [64, 64, 128, 128, 256, 256, 256, 512, 512, 512, 512, 512, 512]
TAP_AFTER = {1, 3, 6, 9, 12}  # conv index (0-based) ending each tap block


def _make_checkpoints(tmp_path, seed=0):
    g = torch.Generator().manual_seed(seed)
    vgg_sd, convs = {}, []
    cin = 3
    for idx, cout in zip(VGG16_CONV_IDS, CHANNELS):
        w = torch.randn(cout, cin, 3, 3, generator=g) * 0.08
        b = torch.randn(cout, generator=g) * 0.05
        vgg_sd[f"features.{idx}.weight"] = w
        vgg_sd[f"features.{idx}.bias"] = b
        convs.append((w, b))
        cin = cout
    lin_sd = {}
    for k, c in enumerate([64, 128, 256, 512, 512]):
        lin_sd[f"lin{k}.model.1.weight"] = torch.rand(
            1, c, 1, 1, generator=g)
    vgg_path = os.path.join(tmp_path, "vgg16-397923af.pth")
    lin_path = os.path.join(tmp_path, "vgg.pth")
    torch.save(vgg_sd, vgg_path)
    torch.save(lin_sd, lin_path)
    return vgg_path, lin_path, convs, lin_sd


def _torch_lpips(a, b, convs, lin_sd):
    """Independent torch implementation of the published LPIPS pipeline."""
    shift = torch.tensor([-0.030, -0.088, -0.188]).view(1, 3, 1, 1)
    scale = torch.tensor([0.458, 0.448, 0.450]).view(1, 3, 1, 1)

    def feats(img):
        x = torch.from_numpy(img).permute(2, 0, 1)[None].float()
        x = (2 * x - 1 - shift) / scale
        out = []
        for i, (w, b) in enumerate(convs):
            if i in (2, 4, 7, 10):  # maxpool before blocks 2..5
                x = torch.nn.functional.max_pool2d(x, 2)
            x = torch.nn.functional.conv2d(x, w, b, padding=1)
            x = torch.nn.functional.relu(x)
            if i in TAP_AFTER:
                out.append(x)
        return out

    total = 0.0
    for k, (fa, fb) in enumerate(zip(feats(a), feats(b))):
        na = fa / torch.sqrt((fa * fa).sum(1, keepdim=True) + 1e-10)
        nb = fb / torch.sqrt((fb * fb).sum(1, keepdim=True) + 1e-10)
        lw = lin_sd[f"lin{k}.model.1.weight"]
        d = ((na - nb) ** 2 * lw).sum(1, keepdim=True)
        total += d.mean().item()
    return total


def test_matches_torch_reference(tmp_path):
    vgg_path, lin_path, convs, lin_sd = _make_checkpoints(str(tmp_path))
    rng = np.random.default_rng(0)
    a = rng.uniform(0, 1, (64, 64, 3)).astype(np.float32)
    b = np.clip(a + rng.normal(0, 0.1, a.shape), 0, 1).astype(np.float32)

    metric = PretrainedVGGLPIPS(vgg_path=vgg_path, lin_path=lin_path)
    ours = metric(a, b)
    ref = _torch_lpips(a, b, convs, lin_sd)
    assert ours == pytest.approx(ref, rel=1e-4, abs=1e-6)
    assert metric(a, a) == pytest.approx(0.0, abs=1e-6)
    assert ours > 0


def test_availability_gating(tmp_path, monkeypatch):
    monkeypatch.delenv("LPIPS_VGG_WEIGHTS", raising=False)
    monkeypatch.delenv("LPIPS_LIN_WEIGHTS", raising=False)
    monkeypatch.setenv("HOME", str(tmp_path))  # no caches
    assert not PretrainedVGGLPIPS.available()
    vgg_path, lin_path, _, _ = _make_checkpoints(str(tmp_path))
    monkeypatch.setenv("LPIPS_VGG_WEIGHTS", vgg_path)
    monkeypatch.setenv("LPIPS_LIN_WEIGHTS", lin_path)
    assert PretrainedVGGLPIPS.available()
