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


def _rays(R=16, seed=1):
    rng = np.random.default_rng(seed)
    o = jnp.asarray(rng.uniform(-0.2, 0.2, (R, 3)).astype(np.float32))
    d_np = rng.normal(size=(R, 3))
    d_np[:, 2] = np.abs(d_np[:, 2]) + 0.7
    d = jnp.asarray(
        (d_np / np.linalg.norm(d_np, axis=1, keepdims=True)).astype(np.float32))
    return o, d


def _assert_hits_match(hp, hx, check_full_t=True):
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
        np.where(vp, np.asarray(hp.alpha), 0),
        np.where(vx, np.asarray(hx.alpha), 0), rtol=1e-3, atol=1e-6,
    )
    if check_full_t:
        np.testing.assert_allclose(
            np.asarray(hp.full_T), np.asarray(hx.full_T), rtol=2e-3,
        )


@pytest.mark.parametrize("secondary", [0.0, 1.0])
def test_culled_trace_matches_xla(secondary):
    """pallas_trace_culled_fused through the real select_candidates path ==
    the XLA tracer (the path production training/rendering actually runs)."""
    from editable_gaussian_reflections_tpu.ops.culling import (
        cluster_bounds,
        morton_order,
        select_candidates,
    )
    from editable_gaussian_reflections_tpu.ops.trace import trace_rays_culled

    scene = make_scene()
    frames, attrs = build_frames(scene, 0.005, 3.0)
    perm = morton_order(frames)
    frames = __import__("jax").tree_util.tree_map(lambda a: a[perm], frames)
    attrs = __import__("jax").tree_util.tree_map(lambda a: a[perm], attrs)
    gpack = pack_frames(frames, attrs)
    o, d = _rays()
    near, far = jnp.float32(0.1), jnp.float32(60.0)

    cluster = 32
    bounds = cluster_bounds(frames, cluster)
    cands, cnear, num, ovf, _td = select_candidates(
        o, d, bounds, near, far, tile=16, max_clusters=8,
    )
    assert not bool(np.asarray(ovf).any())
    hp, _ = trace_rays_culled(
        o, d, frames, gpack, cands, cnear, 3.0, near, far,
        jnp.float32(secondary), transmittance_threshold=1e-9,
        max_hits=8, cluster=cluster, tile=16, interpret=True,
    )
    hx = trace_rays(o, d, frames, 3.0, near, far, max_hits=8, chunk=32,
                    secondary=bool(secondary))
    _assert_hits_match(hp, hx)


def test_culled_trace_adversarial_cluster_order():
    """Correctness must not depend on candidates arriving near-first when
    early termination cannot trigger (threshold ~0, K = all hits)."""
    from editable_gaussian_reflections_tpu.ops.pallas.trace_kernel import (
        pallas_trace_culled_fused,
    )

    scene = make_scene(n=96, seed=3)
    frames, attrs = build_frames(scene, 0.005, 3.0)
    gpack = pack_frames(frames, attrs)
    o, d = _rays(seed=4)
    near, far = jnp.float32(0.1), jnp.float32(60.0)
    cluster = 32
    nc = gpack.shape[1] // cluster

    rng = np.random.default_rng(0)
    order = rng.permutation(nc).astype(np.int32)
    cands = jnp.asarray(np.tile(order, (1, 1)))              # [T=1, NC]
    cnear = jnp.zeros((1, nc), jnp.float32)                  # no 'behind' skips

    t_s, ids, alpha, gv, lh, _attrs, logt, trav = pallas_trace_culled_fused(
        o, d, gpack, cands, cnear, near, far, 3.0, 0.0, 0.1, 0.9,
        transmittance_threshold=1e-30, max_hits=32, cluster=cluster,
        tile=16, interpret=True,
    )
    hx = trace_rays(o, d, frames, 3.0, near, far, max_hits=32, chunk=32)
    valid = np.asarray(t_s) < 1e37
    vx = np.asarray(hx.valid)
    np.testing.assert_array_equal(valid.sum(1), vx.sum(1))
    np.testing.assert_allclose(
        np.where(valid, np.asarray(t_s), 0),
        np.where(vx, np.asarray(hx.t), 0), rtol=1e-4, atol=1e-5,
    )
    np.testing.assert_array_equal(
        np.where(valid, np.asarray(ids), -1),
        np.where(vx, np.asarray(hx.ids), -1),
    )
    np.testing.assert_allclose(np.exp(np.asarray(logt)),
                               np.asarray(hx.full_T), rtol=2e-3)


def test_culled_trace_early_termination_skips_saturated():
    """An opaque near cluster + high transmittance threshold must trigger the
    in-kernel cluster skip (fewer traversals), while the near hits still
    match the oracle (the skipped tail is what the truncated-tail correction
    absorbs, forward_pass.cu:131-134 semantics)."""
    from editable_gaussian_reflections_tpu.ops.pallas.trace_kernel import (
        pallas_trace_culled_fused,
    )

    n = 64
    rng = np.random.default_rng(5)
    # cluster 0: opaque wall right in front; cluster 1: stuff far behind
    xyz = np.concatenate([
        rng.uniform(-2, 2, (32, 3)) + np.array([0, 0, 3.0]),
        rng.uniform(-2, 2, (32, 3)) + np.array([0, 0, 30.0]),
    ]).astype(np.float32)
    scene = from_arrays(
        xyz=xyz,
        scaling=np.full((n, 3), 0.5, np.float32),      # huge -> all rays hit
        rotation=np.tile(np.array([1, 0, 0, 0], np.float32), (n, 1)),
        opacity=np.full((n,), 12.0, np.float32),       # sigmoid ~ 1
        diffuse=rng.uniform(0, 1, (n, 3)).astype(np.float32),
        normal=rng.normal(size=(n, 3)).astype(np.float32),
        f0=rng.uniform(0, 1, (n, 3)).astype(np.float32),
        roughness=rng.uniform(0, 1, n).astype(np.float32),
        pad_multiple=32,
    )
    frames, attrs = build_frames(scene, 0.005, 3.0)
    gpack = pack_frames(frames, attrs)
    o, d = _rays(seed=6)
    near, far = jnp.float32(0.1), jnp.float32(100.0)
    cands = jnp.asarray([[0, 1]], jnp.int32)
    cnear = jnp.asarray([[0.0, 20.0]], jnp.float32)

    def run(thr):
        # max_hits=64 > cluster size so the slots never fill: the 'behind'
        # skip cannot trigger and only SATURATION can cause the skip
        return pallas_trace_culled_fused(
            o, d, gpack, cands, cnear, near, far, 3.0, 0.0, 0.1, 0.9,
            transmittance_threshold=thr, max_hits=64, cluster=32,
            tile=16, interpret=True,
        )

    t_hi, ids_hi, a_hi, _, _, _, _, trav_hi = run(0.5)
    t_lo, ids_lo, a_lo, _, _, _, _, trav_lo = run(1e-30)
    # skipping happened: fewer candidates traversed at the high threshold
    assert int(np.asarray(trav_hi).sum()) < int(np.asarray(trav_lo).sum())
    # the near (composited-prefix) hits are identical: cluster-0 slots agree
    near_mask = (np.asarray(ids_lo) < 32) & (np.asarray(t_lo) < 1e37)
    k_front = int(near_mask.sum(1).min())
    assert k_front >= 1
    np.testing.assert_allclose(
        np.asarray(t_hi)[:, :k_front], np.asarray(t_lo)[:, :k_front],
        rtol=1e-6,
    )
    np.testing.assert_array_equal(
        np.asarray(ids_hi)[:, :k_front], np.asarray(ids_lo)[:, :k_front],
    )


def test_sort_slots_orders_by_depth_with_aux():
    """_sort_slots: rank-based in-kernel selection sort must order slots by
    (t, slot index) and move every aux block consistently, including ties
    and INF-empty slots."""
    import jax
    from jax.experimental import pallas as pl
    from editable_gaussian_reflections_tpu.ops.pallas.trace_kernel import (
        AUX_GEO,
        _sort_slots,
    )

    R, K = 8, 16
    rng = np.random.default_rng(7)
    t = rng.uniform(0, 10, (R, K)).astype(np.float32)
    t[:, 3] = t[:, 5]          # exact ties
    t[0, :4] = 3.0e38          # empty slots mixed in front
    t[1, ::2] = 3.0e38
    ids = rng.integers(0, 1000, (R, K)).astype(np.float32)
    aux = rng.normal(size=(R, AUX_GEO * K)).astype(np.float32)

    def kernel(t_ref, id_ref, aux_ref, to_ref, ido_ref, auxo_ref):
        to_ref[:] = t_ref[:]
        ido_ref[:] = id_ref[:]
        auxo_ref[:] = aux_ref[:]
        _sort_slots(to_ref, ido_ref, auxo_ref, K, A=AUX_GEO)

    to, ido, auxo = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((R, K), jnp.float32),
            jax.ShapeDtypeStruct((R, K), jnp.float32),
            jax.ShapeDtypeStruct((R, AUX_GEO * K), jnp.float32),
        ),
        interpret=True,
    )(jnp.asarray(t), jnp.asarray(ids), jnp.asarray(aux))

    order = np.argsort(t, axis=1, kind="stable")
    np.testing.assert_allclose(np.asarray(to), np.take_along_axis(t, order, 1))
    np.testing.assert_allclose(
        np.asarray(ido), np.take_along_axis(ids, order, 1))
    for a in range(AUX_GEO):
        blk = aux[:, a * K:(a + 1) * K]
        np.testing.assert_allclose(
            np.asarray(auxo)[:, a * K:(a + 1) * K],
            np.take_along_axis(blk, order, 1),
            err_msg=f"aux block {a}",
        )
