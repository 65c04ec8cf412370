"""Kernel-level tests: vectorized trace/composite/backward vs the sequential
NumPy oracle on tiny scenes (the reference has no such tests; SURVEY.md section 4
requires them since we cannot eyeball-compare on GPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from editable_gaussian_reflections_tpu.ops.composite import composite
from editable_gaussian_reflections_tpu.ops.render_grads import (
    backward_step,
    scatter_grads,
)
from editable_gaussian_reflections_tpu.ops.trace import gather_frames, trace_rays
from editable_gaussian_reflections_tpu.scene.gaussian_scene import (
    build_frames,
    from_arrays,
)

from oracle import (
    backward_one_ray,
    forward_one_ray,
    quat_to_rotmat,
    scaling_factor,
)

EXP_POWER = 3.0
ALPHA_THRESHOLD = 0.005
TRANS_THRESHOLD = 0.01
EPS_NORM = 1e-12
EPS_SCALE_GRAD = 1e-12


def make_scene(n=7, seed=0):
    rng = np.random.default_rng(seed)
    xyz = np.stack(
        [
            rng.uniform(-0.4, 0.4, n),
            rng.uniform(-0.4, 0.4, n),
            np.linspace(2.0, 6.0, n) + rng.uniform(-0.2, 0.2, n),
        ],
        axis=-1,
    ).astype(np.float32)
    scaling = rng.uniform(-1.2, -0.3, (n, 3)).astype(np.float32)
    rotation = rng.normal(size=(n, 4)).astype(np.float32)
    opacity = rng.uniform(-0.5, 2.5, n).astype(np.float32)
    diffuse = rng.uniform(0.05, 1.0, (n, 3)).astype(np.float32)
    normal = rng.normal(size=(n, 3)).astype(np.float32)
    f0 = rng.uniform(0.0, 1.0, (n, 3)).astype(np.float32)
    roughness = rng.uniform(0.05, 0.95, n).astype(np.float32)
    return dict(xyz=xyz, scaling=scaling, rotation=rotation, opacity=opacity,
                diffuse=diffuse, normal=normal, f0=f0, roughness=roughness)


def oracle_gaussians(sc):
    n = sc["xyz"].shape[0]
    out = []
    for i in range(n):
        op = 1.0 / (1.0 + np.exp(-sc["opacity"][i]))
        sf = scaling_factor(op, ALPHA_THRESHOLD, EXP_POWER)
        s = np.exp(sc["scaling"][i])
        out.append(dict(
            id=i,
            mean=sc["xyz"][i].astype(np.float64),
            rot=quat_to_rotmat(sc["rotation"][i].astype(np.float64)),
            sizes=(s * sf).astype(np.float64),
            scaling=s.astype(np.float64),
            sf=sf,
            opacity=op,
            quat=sc["rotation"][i].astype(np.float64),
            rgb=np.maximum(sc["diffuse"][i], 0.0).astype(np.float64),
            normal=sc["normal"][i].astype(np.float64),
            f0=np.clip(sc["f0"][i], 0, 1).astype(np.float64),
            roughness=float(np.clip(sc["roughness"][i], 0, 1)),
        ))
    return out


def rays(seed=1, r=5):
    rng = np.random.default_rng(seed)
    o = np.zeros((r, 3), np.float32)
    o[:, :2] = rng.uniform(-0.1, 0.1, (r, 2))
    d = np.stack(
        [rng.uniform(-0.15, 0.15, r), rng.uniform(-0.15, 0.15, r), np.ones(r)],
        axis=-1,
    )
    d = d / np.linalg.norm(d, axis=-1, keepdims=True)
    return o.astype(np.float32), d.astype(np.float32)


def _trace_and_composite(sc, o, d, max_hits=16, near=0.2, far=100.0):
    scene = from_arrays(**sc, pad_multiple=8)
    frames, attrs = build_frames(scene, ALPHA_THRESHOLD, EXP_POWER)
    hits = trace_rays(
        jnp.asarray(o), jnp.asarray(d), frames, EXP_POWER,
        jnp.float32(near), jnp.float32(far), max_hits=max_hits, chunk=8,
    )
    g_attrs = jax.tree_util.tree_map(lambda a: a[hits.ids], attrs)
    comp = composite(hits, g_attrs.rgb, g_attrs.normal, g_attrs.f0,
                     g_attrs.roughness, TRANS_THRESHOLD, EPS_NORM)
    return scene, frames, attrs, hits, comp


def test_forward_matches_oracle():
    sc = make_scene()
    o, d = rays()
    _, _, _, hits, comp = _trace_and_composite(sc, o, d)
    gs = oracle_gaussians(sc)
    for ri in range(o.shape[0]):
        out, composited = forward_one_ray(
            o[ri].astype(np.float64), d[ri].astype(np.float64), gs,
            EXP_POWER, 0.2, 100.0, TRANS_THRESHOLD, EPS_NORM,
        )
        np.testing.assert_allclose(np.asarray(comp.rgb[ri]), out["rgb"],
                                   rtol=2e-3, atol=2e-4)
        np.testing.assert_allclose(np.asarray(comp.depth[ri]), out["depth"],
                                   rtol=2e-3, atol=2e-4)
        np.testing.assert_allclose(np.asarray(comp.normal[ri]), out["normal"],
                                   rtol=2e-3, atol=2e-4)
        np.testing.assert_allclose(np.asarray(comp.T_final[ri]), out["T_final"],
                                   rtol=2e-3, atol=1e-5)
        np.testing.assert_allclose(np.asarray(comp.full_T[ri]), out["full_T"],
                                   rtol=2e-3, atol=1e-5)
        assert int(comp.num_accumulated[ri]) == len(composited)


def test_trace_depth_order_and_truncation():
    sc = make_scene(n=12, seed=3)
    o, d = rays(seed=4, r=3)
    _, _, _, hits, _ = _trace_and_composite(sc, o, d, max_hits=4)
    t = np.asarray(hits.t)
    v = np.asarray(hits.valid)
    for ri in range(t.shape[0]):
        tv = t[ri][v[ri]]
        assert np.all(np.diff(tv) >= 0), "hits must be depth-sorted"


def test_backward_matches_oracle():
    sc = make_scene(n=6, seed=7)
    o, d = rays(seed=8, r=4)
    scene, frames, attrs, hits, comp = _trace_and_composite(sc, o, d)
    R = o.shape[0]
    rng = np.random.default_rng(9)
    dL = dict(
        rgb=rng.normal(size=(R, 3)),
        normal=rng.normal(size=(R, 3)),
        f0=rng.normal(size=(R, 3)),
        roughness=rng.normal(size=R),
        depth=rng.normal(size=R),
    )

    ids = hits.ids
    fg = gather_frames(frames, ids)
    g_attrs = jax.tree_util.tree_map(lambda a: a[ids], attrs)
    g_scaling = jnp.exp(scene.scaling)[ids]
    per_hit = backward_step(
        hits, comp,
        g_attrs.rgb, g_attrs.normal, g_attrs.f0, g_attrs.roughness,
        fg.opacity, g_scaling, scene.rotation[ids],
        fg.rot, fg.inv_sizes, fg.sf,
        jnp.asarray(dL["rgb"], jnp.float32), jnp.asarray(dL["normal"], jnp.float32),
        jnp.asarray(dL["f0"], jnp.float32), jnp.asarray(dL["roughness"], jnp.float32),
        jnp.asarray(dL["depth"], jnp.float32),
        EXP_POWER, EPS_SCALE_GRAD, scene.capacity,
    )
    grads = scatter_grads(per_hit, ids, scene.capacity)

    # oracle accumulation over rays
    gs = oracle_gaussians(sc)
    n = sc["xyz"].shape[0]
    acc = {k: np.zeros((n,) + s) for k, s in
           [("mean", (3,)), ("scale", (3,)), ("rotation", (4,)),
            ("opacity", ()), ("rgb", (3,)), ("normal", (3,)), ("f0", (3,)),
            ("roughness", ()), ("total_weight", ())]}
    for ri in range(R):
        out, composited = forward_one_ray(
            o[ri].astype(np.float64), d[ri].astype(np.float64), gs,
            EXP_POWER, 0.2, 100.0, TRANS_THRESHOLD, EPS_NORM)
        dL_ray = {k: (dL[k][ri] if np.ndim(dL[k]) > 1 else float(dL[k][ri]))
                  for k in dL}
        og = backward_one_ray(out, composited, dL_ray, EXP_POWER, EPS_SCALE_GRAD)
        for gid, gg in og.items():
            for k in acc:
                acc[k][gid] += gg[k]

    got = {k: np.asarray(getattr(grads, k))[:n] for k in acc}
    for k in acc:
        np.testing.assert_allclose(
            got[k], acc[k], rtol=5e-3, atol=5e-3,
            err_msg=f"grad mismatch for {k}",
        )


def test_no_truncation_grads_match_autograd():
    """When every hit is composited (K covers all, no early-out), the
    hand-written alpha/attr gradients equal autograd of the plain L1-free
    weighted-sum forward (the tail terms vanish)."""
    sc = make_scene(n=4, seed=11)
    # low opacity so transmittance never crosses the threshold
    sc["opacity"] = np.full(4, -1.0, np.float32)
    o, d = rays(seed=12, r=2)
    scene, frames, attrs, hits, comp = _trace_and_composite(sc, o, d)
    # cumprod vs exp(sum(log1p)) agree to f32 rounding only
    np.testing.assert_allclose(np.asarray(comp.T_final), np.asarray(comp.full_T),
                               rtol=1e-3)

    R = o.shape[0]
    rng = np.random.default_rng(13)
    dL_rgb = jnp.asarray(rng.normal(size=(R, 3)), jnp.float32)

    ids = hits.ids
    fg = gather_frames(frames, ids)
    g_attrs = jax.tree_util.tree_map(lambda a: a[ids], attrs)
    zeros3 = jnp.zeros((R, 3), jnp.float32)
    zeros1 = jnp.zeros((R,), jnp.float32)
    per_hit = backward_step(
        hits, comp, g_attrs.rgb, g_attrs.normal, g_attrs.f0, g_attrs.roughness,
        fg.opacity, jnp.exp(scene.scaling)[ids], scene.rotation[ids],
        fg.rot, fg.inv_sizes, fg.sf,
        dL_rgb, zeros3, zeros3, zeros1, zeros1,
        EXP_POWER, EPS_SCALE_GRAD, scene.capacity,
    )
    grads = scatter_grads(per_hit, ids, scene.capacity)

    # autograd twin: loss = sum(dL_rgb * rendered_rgb) through compositing only
    # (alpha and rgb as independent inputs)
    def render_rgb(opacity_raw):
        sc2 = from_arrays(**{**sc, "opacity": opacity_raw}, pad_multiple=8)
        frames2, attrs2 = build_frames(sc2, ALPHA_THRESHOLD, EXP_POWER)
        hits2 = trace_rays(jnp.asarray(o), jnp.asarray(d), frames2, EXP_POWER,
                           jnp.float32(0.2), jnp.float32(100.0),
                           max_hits=16, chunk=8)
        ga = jax.tree_util.tree_map(lambda a: a[hits2.ids], attrs2)
        comp2 = composite(hits2, ga.rgb, ga.normal, ga.f0, ga.roughness,
                          TRANS_THRESHOLD, EPS_NORM)
        return jnp.sum(comp2.rgb * dL_rgb)

    auto = jax.grad(render_rgb)(jnp.asarray(sc["opacity"]))
    got = np.asarray(grads.opacity)[:4]
    np.testing.assert_allclose(got, np.asarray(auto), rtol=2e-2, atol=1e-4)
