"""Sequential NumPy oracle renderer for tiny scenes.

A deliberately naive per-ray, per-hit loop implementing the same published
algorithm as the framework (max-response intersection, front-to-back
compositing with early-out + truncated-tail correction, and the loss-fused
backward recurrence with back-to-front weighted deltas).  Used only in tests
to validate the vectorized TPU implementation.
"""

from __future__ import annotations

import numpy as np

MAX_ALPHA = 0.9999


def quat_to_rotmat(q):
    q = q / np.linalg.norm(q)
    r, x, y, z = q
    return np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - r * z), 2 * (x * z + r * y)],
        [2 * (x * y + r * z), 1 - 2 * (x * x + z * z), 2 * (y * z - r * x)],
        [2 * (x * z - r * y), 2 * (y * z + r * x), 1 - 2 * (x * x + y * y)],
    ])


def scaling_factor(opacity, tau, p):
    if opacity <= tau:
        return 0.0
    k = 2.0 * p
    return (k * np.log(opacity / tau)) ** (1.0 / k)


def intersect_one(o, d, mean, rot, sizes, sf, opacity, p, near, far):
    """Returns (t, alpha, gaussval, local_hit) or None."""
    if sf <= 0.0 or np.all(sizes <= 0):
        return None
    inv = np.where(sizes > 0, 1.0 / np.maximum(sizes, 1e-30), 0.0)
    lo = inv * (rot.T @ (o - mean))
    ld = inv * (rot.T @ d)
    if np.dot(lo, ld) > 0:
        return None
    norm = np.linalg.norm(ld)
    ldn = ld / norm
    t_loc = -np.dot(lo, ldn)
    t_world = t_loc / norm
    u = lo + t_loc * ldn
    sq = np.dot(u, u)
    if sq > 1.0:
        return None
    if not (near < t_world < far):
        return None
    local_hit = u * sf
    k = 2.0 * p
    gaussval = np.exp(-(np.dot(local_hit, local_hit) ** p) / k)
    alpha = MAX_ALPHA * gaussval * opacity
    return t_world, alpha, gaussval, local_hit


def forward_one_ray(o, d, gaussians, p, near, far, trans_threshold, eps_norm):
    """gaussians: list of dicts with mean, rot, sizes, sf, opacity, rgb,
    normal, f0, roughness, id. Returns outputs dict + composited hit list."""
    hits = []
    full_T = 1.0
    for g in gaussians:
        res = intersect_one(o, d, g["mean"], g["rot"], g["sizes"], g["sf"],
                            g["opacity"], p, near, far)
        if res is None:
            continue
        t, alpha, gaussval, local_hit = res
        full_T *= 1.0 - alpha
        hits.append(dict(t=t, alpha=alpha, gaussval=gaussval,
                         local_hit=local_hit, g=g))
    hits.sort(key=lambda h: h["t"])

    T = 1.0
    out = dict(rgb=np.zeros(3), normal=np.zeros(3), f0=np.zeros(3),
               roughness=0.0, depth=0.0)
    composited = []
    for h in hits:
        if T < trans_threshold:
            break
        nextT = T * (1.0 - h["alpha"])
        w = T - nextT
        out["rgb"] = out["rgb"] + h["g"]["rgb"] * w
        out["normal"] = out["normal"] + h["g"]["normal"] * w
        out["f0"] = out["f0"] + h["g"]["f0"] * w
        out["roughness"] += h["g"]["roughness"] * w
        out["depth"] += h["t"] * w
        T = nextT
        h = dict(h)
        h["T_after"] = T
        h["weight"] = w
        composited.append(h)

    remaining_T = T - full_T
    normalization = max(1.0 - T, eps_norm)
    remaining = {k: out[k] / normalization for k in out}
    for k in out:
        out[k] = out[k] + remaining_T * remaining[k]
    out["T_final"] = T
    out["full_T"] = full_T
    out["remaining"] = remaining
    return out, composited


def backward_one_ray(out, composited, dL, p, eps_scale_grad):
    """dL: dict rgb/normal/f0/roughness/depth upstream per-ray gradients.
    Returns dict gaussian_id -> accumulated grads (back-to-front loop,
    replicating the weighted-deltas recurrence)."""
    grads = {}
    prev = dict(rgb=np.zeros(3), normal=np.zeros(3), f0=np.zeros(3),
                roughness=0.0, depth=0.0, scale=np.zeros(3))
    wd = dict(rgb=np.zeros(3), normal=np.zeros(3), f0=np.zeros(3),
              roughness=0.0, depth=0.0)

    for h in reversed(composited):
        g = h["g"]
        alpha = h["alpha"]
        T_after = h["T_after"]
        weight = T_after / (1.0 - alpha) * alpha

        dL_drgb_g = dL["rgb"] * weight
        dL_dnormal_g = dL["normal"] * weight
        dL_df0_g = dL["f0"] * weight
        dL_drough_g = dL["roughness"] * weight

        for k, val in [("rgb", g["rgb"]), ("normal", g["normal"]),
                       ("f0", g["f0"]), ("roughness", g["roughness"]),
                       ("depth", h["t"])]:
            wd[k] = wd[k] + (val - prev[k]) * T_after
            prev[k] = val

        inv1m = 1.0 / (1.0 - alpha)
        dL_dalpha = (
            np.dot(wd["rgb"] * inv1m, dL["rgb"])
            + np.dot(wd["normal"] * inv1m, dL["normal"])
            + np.dot(wd["f0"] * inv1m, dL["f0"])
            + wd["roughness"] * inv1m * dL["roughness"]
            + wd["depth"] * inv1m * dL["depth"]
        )
        tmp2 = -((out["T_final"] - out["full_T"]) / (1.0 - alpha))
        dL_dalpha += tmp2 * (
            np.dot(out["remaining"]["rgb"], dL["rgb"])
            + np.dot(out["remaining"]["normal"], dL["normal"])
            + np.dot(out["remaining"]["f0"], dL["f0"])
            + out["remaining"]["roughness"] * dL["roughness"]
            + out["remaining"]["depth"] * dL["depth"]
        )

        dL_dopacity = MAX_ALPHA * dL_dalpha * h["gaussval"]
        dL_dopacity = dL_dopacity * g["opacity"] * (1.0 - g["opacity"])  # sigmoid bwd

        dL_dgaussval = MAX_ALPHA * dL_dalpha * g["opacity"]
        lh = h["local_hit"]
        sq_norm = np.dot(lh, lh)
        dL_dsq = h["gaussval"] * sq_norm ** (p - 1.0)
        dL_dx_local = -lh * dL_dsq * dL_dgaussval

        inv = np.where(g["sizes"] > 0, 1.0 / np.maximum(g["sizes"], 1e-30), 0.0)
        w2l = np.diag(inv) @ g["rot"].T
        dL_dx_world = (w2l.T @ dL_dx_local) * g["sf"]
        dL_dmean = -dL_dx_world

        l2w = g["rot"] @ np.diag(g["sizes"])
        dL_dl2w = -np.outer(dL_dx_world, lh)
        denom = g["scaling"] * g["sf"] + eps_scale_grad
        rot_over = l2w / denom[None, :]
        dL_dscale = (dL_dl2w * rot_over).sum(axis=0) * g["scaling"]  # exp bwd

        dL_drot = dL_dl2w * g["scaling"][None, :]
        q = g["quat"] / np.linalg.norm(g["quat"])
        r, x, y, z = q
        d0, d1, d2 = dL_drot[0], dL_drot[1], dL_drot[2]
        dL_dr = (2 * x * (d2[1] - d1[2]) + 2 * y * (d0[2] - d2[0])
                 + 2 * z * (d1[0] - d0[1]))
        dL_dx = (-4 * x * (d1[1] + d2[2]) + 2 * y * (d0[1] + d1[0])
                 + 2 * z * (d0[2] + d2[0]) + 2 * r * (d2[1] - d1[2]))
        dL_dy = (2 * x * (d0[1] + d1[0]) - 4 * y * (d0[0] + d2[2])
                 + 2 * z * (d1[2] + d2[1]) + 2 * r * (d0[2] - d2[0]))
        dL_dz = (2 * x * (d0[2] + d2[0]) + 2 * y * (d1[2] + d2[1])
                 - 4 * z * (d0[0] + d1[1]) + 2 * r * (d1[0] - d0[1]))
        dq = np.array([dL_dr, dL_dx, dL_dy, dL_dz])
        xraw = g["quat"]
        nrm = np.linalg.norm(xraw)
        dL_dquat = np.dot(dq, xraw) * (-xraw) / nrm**3 + dq / nrm

        gid = g["id"]
        if gid not in grads:
            grads[gid] = dict(mean=np.zeros(3), scale=np.zeros(3),
                              rotation=np.zeros(4), opacity=0.0,
                              rgb=np.zeros(3), normal=np.zeros(3),
                              f0=np.zeros(3), roughness=0.0, total_weight=0.0)
        acc = grads[gid]
        acc["mean"] += dL_dmean
        acc["scale"] += dL_dscale
        acc["rotation"] += dL_dquat
        acc["opacity"] += dL_dopacity
        acc["rgb"] += dL_drgb_g
        acc["normal"] += dL_dnormal_g
        acc["f0"] += dL_df0_g
        acc["roughness"] += dL_drough_g
        acc["total_weight"] += weight
    return grads
