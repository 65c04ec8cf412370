"""Culling tests: Morton ordering, cluster bounds, cone-sphere visibility -
the candidates must be a superset of the actually-hit Gaussians."""

import jax.numpy as jnp
import numpy as np

from editable_gaussian_reflections_tpu.ops.culling import (
    cluster_bounds,
    cone_sphere_visible,
    cull_clusters,
    morton_order,
    tile_cones,
)
from editable_gaussian_reflections_tpu.ops.trace import trace_rays
from editable_gaussian_reflections_tpu.scene.gaussian_scene import (
    build_frames,
    from_arrays,
)


def make_scene(n=64, seed=0, spread=3.0):
    rng = np.random.default_rng(seed)
    return from_arrays(
        xyz=(rng.uniform(-spread, spread, (n, 3)) + np.array([0, 0, 6])).astype(np.float32),
        scaling=rng.uniform(-2.5, -1.5, (n, 3)).astype(np.float32),
        rotation=rng.normal(size=(n, 4)).astype(np.float32),
        opacity=rng.uniform(-1, 2, n).astype(np.float32),
        diffuse=rng.uniform(0, 1, (n, 3)).astype(np.float32),
        normal=rng.normal(size=(n, 3)).astype(np.float32),
        f0=rng.uniform(0, 1, (n, 3)).astype(np.float32),
        roughness=rng.uniform(0, 1, n).astype(np.float32),
        pad_multiple=16,
    )


def rays(r=32, seed=1):
    rng = np.random.default_rng(seed)
    o = np.zeros((r, 3), np.float32)
    d = np.stack([rng.uniform(-0.3, 0.3, r), rng.uniform(-0.3, 0.3, r),
                  np.ones(r)], -1)
    return jnp.asarray(o), jnp.asarray(
        (d / np.linalg.norm(d, axis=1, keepdims=True)).astype(np.float32))


def test_morton_order_groups_neighbors():
    scene = make_scene(n=256, pad_multiple=16) if False else make_scene(n=256)
    frames, _ = build_frames(scene, 0.005, 3.0)
    perm = np.asarray(morton_order(frames))
    pts = np.asarray(frames.mean)[perm]
    live = np.asarray(frames.valid)[perm]
    pts = pts[live]
    # sorted neighbors should be much closer on average than random pairs
    d_sorted = np.linalg.norm(np.diff(pts, axis=0), axis=1).mean()
    rng = np.random.default_rng(0)
    ridx = rng.permutation(len(pts))
    d_rand = np.linalg.norm(pts[ridx] - pts, axis=1).mean()
    assert d_sorted < 0.6 * d_rand


def test_cull_candidates_superset_of_hits():
    scene = make_scene(n=240, seed=3)
    frames, _ = build_frames(scene, 0.005, 3.0)
    o, d = rays(r=16, seed=4)
    near, far = jnp.float32(0.1), jnp.float32(100.0)

    cluster = 16
    tile = 16
    cands, num, overflow = cull_clusters(
        o, d, frames, near, far, tile=tile, cluster=cluster,
        max_clusters=frames.mean.shape[0] // cluster,
    )
    cand_set = set(int(c) for c in np.asarray(cands[0]) if c >= 0)

    hits = trace_rays(o, d, frames, 3.0, near, far, max_hits=64, chunk=16)
    hit_ids = np.asarray(hits.ids)[np.asarray(hits.valid)]
    hit_clusters = set(int(i) // cluster for i in hit_ids)
    missing = hit_clusters - cand_set
    assert not missing, f"culling dropped hit clusters: {missing}"
    assert not bool(np.asarray(overflow).any())


def test_tile_cone_contains_rays():
    o, d = rays(r=32, seed=5)
    cones = tile_cones(o, d, tile=32)
    cos_to_axis = np.asarray(jnp.sum(d * cones.axis[0][None], axis=-1))
    assert np.all(cos_to_axis >= np.asarray(cones.cos_half)[0] - 1e-6)


def test_candidates_sorted_by_near_distance():
    """The kernel's 'behind' early-exit (render_kernel_v3 group check)
    assumes each tile's candidate list is non-decreasing in conservative
    near distance - empty slots carry +inf so the property must hold
    through the padding too."""
    from editable_gaussian_reflections_tpu.ops.culling import (
        cluster_bounds,
        select_candidates,
    )

    scene = make_scene(n=240, seed=7)
    frames, _ = build_frames(scene, 0.005, 3.0)
    o, d = rays(r=32, seed=8)
    bounds = cluster_bounds(frames, 16)
    _, cand_near, _, _, _ = select_candidates(
        o, d, bounds, jnp.float32(0.1), jnp.float32(100.0),
        tile=16, max_clusters=8)
    cn = np.asarray(cand_near)
    assert np.all(np.diff(cn, axis=1) >= 0.0)


def test_per_tile_depth_windows_match_scalar():
    """select_candidates accepts per-tile [T] near/far arrays (the split-far
    passes bound each tile's depth window by the rays' split distances);
    constant arrays must reproduce the scalar-window result exactly, and a
    tighter far bound must select a subset."""
    from editable_gaussian_reflections_tpu.ops.culling import (
        cluster_bounds,
        select_candidates,
    )

    scene = make_scene(n=240, seed=9)
    frames, _ = build_frames(scene, 0.005, 3.0)
    o, d = rays(r=32, seed=10)
    bounds = cluster_bounds(frames, 16)
    T = 32 // 16
    c0, n0, num0, ovf0, td0 = select_candidates(
        o, d, bounds, jnp.float32(0.1), jnp.float32(100.0),
        tile=16, max_clusters=8)
    c1, n1, num1, ovf1, td1 = select_candidates(
        o, d, bounds, jnp.full((T,), 0.1, jnp.float32),
        jnp.full((T,), 100.0, jnp.float32), tile=16, max_clusters=8)
    np.testing.assert_array_equal(np.asarray(c0), np.asarray(c1))
    np.testing.assert_array_equal(np.asarray(num0), np.asarray(num1))

    c2, _, num2, _, _ = select_candidates(
        o, d, bounds, jnp.float32(0.1), jnp.full((T,), 2.0, jnp.float32),
        tile=16, max_clusters=8)
    assert np.all(np.asarray(num2) <= np.asarray(num0))
    for t in range(T):
        got = set(np.asarray(c2[t])) - {-1}
        allc = set(np.asarray(c0[t])) - {-1}
        assert got <= allc


def test_starved_flags_only_unsaturated_alive_reaching_rays():
    from editable_gaussian_reflections_tpu.renderer.raytracer import _starved

    # t_drop = near distance of the first dropped cluster (+inf: no drop)
    tdrop = jnp.asarray([1.0, 1.0, 1.0, jnp.inf, 1.0])
    tlim = jnp.asarray([5.0, 5.0, 5.0, 5.0, 0.5])  # ray window end
    full_T = jnp.asarray([0.5, 0.001, 0.5, 0.5, 0.5])   # thr = 0.01
    alive = jnp.asarray([True, True, False, True, True])
    out = np.asarray(_starved(tdrop, tlim, full_T, alive, 0.01))
    # only ray 0: dropped cluster inside its window AND unsaturated AND
    # alive; ray 4's own window (split exit 0.5) ends before the drop
    assert out.tolist() == [1.0, 0.0, 0.0, 0.0, 0.0]


def test_select_candidates_t_drop():
    """t_drop is the (mc+1)-th nearest visible cluster's near distance and
    +inf when nothing overflowed; shrinking mc by one makes the last kept
    candidate's distance the new t_drop."""
    from editable_gaussian_reflections_tpu.ops.culling import (
        cluster_bounds,
        select_candidates,
    )

    scene = make_scene(n=240, seed=11)
    frames, _ = build_frames(scene, 0.005, 3.0)
    o, d = rays(r=32, seed=12)
    bounds = cluster_bounds(frames, 16)
    cA, nA, numA, ovfA, tdA = select_candidates(
        o, d, bounds, jnp.float32(0.1), jnp.float32(100.0),
        tile=16, max_clusters=4)
    cB, nB, numB, ovfB, tdB = select_candidates(
        o, d, bounds, jnp.float32(0.1), jnp.float32(100.0),
        tile=16, max_clusters=3)
    tdA, tdB = np.asarray(tdA), np.asarray(tdB)
    ovfA, ovfB = np.asarray(ovfA), np.asarray(ovfB)
    nA = np.asarray(nA)
    for t in range(tdA.shape[0]):
        assert np.isfinite(tdA[t]) == ovfA[t]
        if ovfA[t]:
            # A's drop comes at or after A's last kept candidate
            assert tdA[t] >= nA[t, 3]
        if ovfB[t] and numB[t] == 3 and np.asarray(numA)[t] >= 4:
            # B dropped exactly what A kept 4th
            np.testing.assert_allclose(tdB[t], nA[t, 3], rtol=1e-6)
