"""RGB<->HSV with hue in radians [0, 2pi] (kornia conventions), numpy-native.

Used by the editing layer (the reference edits diffuse/f0 in HSV via kornia,
scene/editable_gaussian_model.py:137-178).
"""

from __future__ import annotations

import numpy as np

TWO_PI = 2.0 * np.pi


def rgb_to_hsv(rgb: np.ndarray) -> np.ndarray:
    """[N, 3] in [0, inf) -> [N, 3] with h in [0, 2pi], s in [0,1], v >= 0."""
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    maxc = np.maximum(np.maximum(r, g), b)
    minc = np.minimum(np.minimum(r, g), b)
    v = maxc
    deltac = maxc - minc
    s = np.where(maxc > 0, deltac / np.maximum(maxc, 1e-20), 0.0)

    dc = np.where(deltac == 0, 1.0, deltac)
    rc = (maxc - r) / dc
    gc = (maxc - g) / dc
    bc = (maxc - b) / dc

    h = np.where(
        maxc == r, bc - gc,
        np.where(maxc == g, 2.0 + rc - bc, 4.0 + gc - rc),
    )
    h = np.where(deltac == 0, 0.0, h)
    h = (h / 6.0) % 1.0 * TWO_PI
    return np.stack([h, s, v], axis=-1)


def hsv_to_rgb(hsv: np.ndarray) -> np.ndarray:
    h = (hsv[..., 0] % TWO_PI) / TWO_PI * 6.0
    s = hsv[..., 1]
    v = hsv[..., 2]
    i = np.floor(h).astype(np.int64) % 6
    f = h - np.floor(h)
    p = v * (1.0 - s)
    q = v * (1.0 - s * f)
    t = v * (1.0 - s * (1.0 - f))
    cond = [(i == k)[..., None] for k in range(6)]
    rgb = np.select(
        cond,
        [
            np.stack([v, t, p], -1), np.stack([q, v, p], -1),
            np.stack([p, v, t], -1), np.stack([p, q, v], -1),
            np.stack([t, p, v], -1), np.stack([v, p, q], -1),
        ],
    )
    return rgb


def axis_angle_to_rotation_matrix(angles_rad: np.ndarray) -> np.ndarray:
    """Rodrigues' formula on a (3,) axis-angle vector (kornia semantics)."""
    theta = np.linalg.norm(angles_rad)
    if theta < 1e-12:
        return np.eye(3)
    k = angles_rad / theta
    K = np.array([
        [0, -k[2], k[1]],
        [k[2], 0, -k[0]],
        [-k[1], k[0], 0],
    ])
    return np.eye(3) + np.sin(theta) * K + (1 - np.cos(theta)) * (K @ K)
