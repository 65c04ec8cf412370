"""Pallas trace kernel vs the XLA reference tracer (interpret mode on CPU)."""

import jax.numpy as jnp
import numpy as np
import pytest

from editable_gaussian_reflections_tpu.ops.pallas.trace_kernel import pack_frames
from editable_gaussian_reflections_tpu.ops.trace import (
    trace_rays,
    trace_rays_pallas,
)
from editable_gaussian_reflections_tpu.scene.gaussian_scene import (
    build_frames,
    from_arrays,
)


def make_scene(n=96, seed=0):
    rng = np.random.default_rng(seed)
    return from_arrays(
        xyz=(rng.uniform(-1.5, 1.5, (n, 3)) + np.array([0, 0, 5])).astype(np.float32),
        scaling=rng.uniform(-2.0, -1.0, (n, 3)).astype(np.float32),
        rotation=rng.normal(size=(n, 4)).astype(np.float32),
        opacity=rng.uniform(-1, 2, n).astype(np.float32),
        diffuse=rng.uniform(0, 1, (n, 3)).astype(np.float32),
        normal=rng.normal(size=(n, 3)).astype(np.float32),
        f0=rng.uniform(0, 1, (n, 3)).astype(np.float32),
        roughness=rng.uniform(0, 1, n).astype(np.float32),
        pad_multiple=32,
    )


@pytest.mark.parametrize("secondary", [0.0, 1.0])
def test_pallas_trace_matches_xla(secondary):
    scene = make_scene()
    frames, attrs = build_frames(scene, 0.005, 3.0)
    gpack = pack_frames(frames, attrs)
    R = 16
    rng = np.random.default_rng(1)
    o = jnp.asarray(rng.uniform(-0.2, 0.2, (R, 3)).astype(np.float32))
    d_np = rng.normal(size=(R, 3))
    d_np[:, 2] = np.abs(d_np[:, 2]) + 0.7
    d = jnp.asarray(
        (d_np / np.linalg.norm(d_np, axis=1, keepdims=True)).astype(np.float32))
    near, far = jnp.float32(0.1), jnp.float32(60.0)

    hp, slot_attrs = trace_rays_pallas(
        o, d, frames, gpack, 3.0, near, far, jnp.float32(secondary),
        max_hits=8, chunk=32, tile=16, interpret=True, extract_attrs=True,
    )
    hx = trace_rays(
        o, d, frames, 3.0, near, far, max_hits=8, chunk=32,
        secondary=bool(secondary),
    )
    vp, vx = np.asarray(hp.valid), np.asarray(hx.valid)
    np.testing.assert_array_equal(vp.sum(1), vx.sum(1))
    np.testing.assert_allclose(
        np.where(vp, np.asarray(hp.t), 0), np.where(vx, np.asarray(hx.t), 0),
        rtol=1e-4, atol=1e-5,
    )
    np.testing.assert_array_equal(
        np.where(vp, np.asarray(hp.ids), -1),
        np.where(vx, np.asarray(hx.ids), -1),
    )
    np.testing.assert_allclose(
        np.asarray(hp.full_T), np.asarray(hx.full_T), rtol=2e-3,
    )
    np.testing.assert_allclose(
        np.where(vp, np.asarray(hp.alpha), 0),
        np.where(vx, np.asarray(hx.alpha), 0), rtol=1e-3, atol=1e-6,
    )
    # in-kernel extracted shading attrs must equal the gathered ones
    ga = np.asarray(attrs.rgb)[np.asarray(hp.ids)]
    np.testing.assert_allclose(
        np.where(vp[..., None], np.asarray(slot_attrs["rgb"]), 0),
        np.where(vp[..., None], ga, 0), rtol=1e-6,
    )
    gr = np.asarray(attrs.roughness)[np.asarray(hp.ids)]
    np.testing.assert_allclose(
        np.where(vp, np.asarray(slot_attrs["roughness"]), 0),
        np.where(vp, gr, 0), rtol=1e-6,
    )
