"""v6 scan-composite kernel vs the exact sorted-composite reference.

v6 composites in streaming (cluster-near, table-index) order rather than
exact per-ray t order, so unlike v4/v5 it is NOT bit-equal to the k-buffer
kernels.  The exact reference here is v4 with max_hits=64 (>= every hit in
these scenes) and the saturation threshold defused - a true sorted
composite over all hits.  What the tests pin down:

* order-INDEPENDENT outputs must be EXACT: full_T (a plain product over
  all valid hits), T_final (with truncation defused), and - because
  sum_i T_before(i)*alpha_i telescopes to 1-T in ANY order - the whole
  composite when all gaussians share the same attributes;
* order-DEPENDENT outputs (rgb/normal/depth weighted sums) are bounded on
  the ADVERSARIAL scene (the synthetic room assigns every gaussian an
  independent random color, the worst case for misordering - real trained
  surfaces have locally-coherent attributes);
* the within-cluster depth presort (sort_within_clusters) strictly
  reduces the misordering error;
* liveness masks and split-far t-windows behave identically.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from editable_gaussian_reflections_tpu.ops.pallas.render_kernel_v3 import (
    pallas_render_culled_v4,
)
from editable_gaussian_reflections_tpu.ops.pallas.render_kernel_v6 import (
    pallas_render_culled_v6,
)
from tests.test_render_kernel import _rays, _room
from tests.test_render_kernel_v5 import _run


def _exact(frames, attrs, rays_o, rays_d, **kw):
    """v4 with K=64 covers every hit -> exact per-ray sorted composite."""
    return _run(pallas_render_culled_v4, frames, attrs, rays_o, rays_d,
                cluster=128, tile=256, exhaustive=True, thr=1e-8,
                max_hits=64, **kw)


def _rgb_err(out, ref):
    return np.abs(np.asarray(out["rgb"]) - np.asarray(ref["rgb"])).max(-1)


@pytest.mark.parametrize("secondary", [0.0, 1.0])
def test_v6_order_independent_outputs_exact(secondary):
    scene, frames, attrs = _room(1024)
    rays_o, rays_d = _rays()
    if secondary:
        key = jax.random.PRNGKey(3)
        rays_d = jax.random.normal(key, rays_d.shape)
        rays_d = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
    ref = _exact(frames, attrs, rays_o, rays_d, secondary=secondary,
                 secondary_static=int(secondary))
    out = _run(pallas_render_culled_v6, frames, attrs, rays_o, rays_d,
               cluster=64, tile=128, exhaustive=True, thr=1e-8,
               secondary=secondary, secondary_static=int(secondary))
    np.testing.assert_allclose(np.asarray(out["full_T"]),
                               np.asarray(ref["full_T"]),
                               atol=1e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(out["T_final"]),
                               np.asarray(ref["T_final"]),
                               atol=1e-4, rtol=1e-3)


def test_v6_constant_attrs_composite_exact():
    """With every gaussian sharing one attribute vector the composite is
    order-free (sum of T_before*alpha telescopes), so v6 must match the
    exact kernel to float tolerance."""
    scene, frames, attrs = _room(1024)
    attrs = attrs._replace(
        rgb=jnp.full_like(attrs.rgb, 0.7),
        normal=jnp.full_like(attrs.normal, 0.3),
        f0=jnp.full_like(attrs.f0, 0.04),
        roughness=jnp.full_like(attrs.roughness, 0.5),
    )
    # the composited normal stripe reads the FRAME normal (gpack rows 17-19)
    frames = frames._replace(normal=jnp.full_like(frames.normal, 0.3))
    rays_o, rays_d = _rays()
    ref = _exact(frames, attrs, rays_o, rays_d, secondary_static=0)
    out = _run(pallas_render_culled_v6, frames, attrs, rays_o, rays_d,
               cluster=64, tile=128, exhaustive=True, thr=1e-8,
               secondary_static=0)
    for k in ("rgb", "normal", "f0", "roughness", "T_final", "full_T"):
        np.testing.assert_allclose(np.asarray(out[k]), np.asarray(ref[k]),
                                   atol=5e-5, rtol=1e-4, err_msg=k)


def test_v6_misordering_bounded_adversarial():
    """Random-per-gaussian colors + the real culled path: the documented
    worst case.  The bound here is intentionally loose - it tracks the
    approximation, it does not claim visual equivalence on this scene."""
    scene, frames, attrs = _room(1024)
    rays_o, rays_d = _rays()
    ref = _exact(frames, attrs, rays_o, rays_d, secondary_static=0)
    out = _run(pallas_render_culled_v6, frames, attrs, rays_o, rays_d,
               cluster=32, tile=128, secondary_static=0)
    err = _rgb_err(out, ref)
    assert err.mean() < 0.25, err.mean()
    assert np.median(err) < 0.2, np.median(err)


def test_v6_within_cluster_presort_reduces_error():
    from editable_gaussian_reflections_tpu.ops.culling import (
        sort_within_clusters,
    )
    scene, frames, attrs = _room(1024)
    rays_o, rays_d = _rays()
    view = jnp.mean(rays_d, axis=0)
    view = view / jnp.linalg.norm(view)
    perm = sort_within_clusters(frames, view, 64)
    f2 = jax.tree_util.tree_map(lambda a: a[perm], frames)
    a2 = jax.tree_util.tree_map(lambda a: a[perm], attrs)

    ref = _exact(frames, attrs, rays_o, rays_d, secondary_static=0)
    ref2 = _exact(f2, a2, rays_o, rays_d, secondary_static=0)
    np.testing.assert_allclose(np.asarray(ref2["rgb"]),
                               np.asarray(ref["rgb"]), atol=2e-4, rtol=1e-3)

    base = _run(pallas_render_culled_v6, frames, attrs, rays_o, rays_d,
                cluster=64, tile=128, secondary_static=0)
    sorted_ = _run(pallas_render_culled_v6, f2, a2, rays_o, rays_d,
                   cluster=64, tile=128, secondary_static=0)
    e_base = _rgb_err(base, ref)
    e_sorted = _rgb_err(sorted_, ref)
    assert e_sorted.mean() < e_base.mean(), (e_sorted.mean(), e_base.mean())


def test_v6_dead_rays_and_alive_mask():
    scene, frames, attrs = _room(1024)
    rays_o, rays_d = _rays()
    alive = (jnp.arange(rays_o.shape[0]) % 3 != 0)
    out = _run(pallas_render_culled_v6, frames, attrs, rays_o, rays_d,
               cluster=64, tile=128, exhaustive=True, thr=1e-8, alive=alive)
    dead = ~np.asarray(alive)
    assert np.all(np.asarray(out["rgb"])[dead] == 0.0)
    assert np.allclose(np.asarray(out["T_final"])[dead], 1.0)
    ref = _exact(frames, attrs, rays_o, rays_d, alive=alive)
    np.testing.assert_allclose(np.asarray(out["full_T"]),
                               np.asarray(ref["full_T"]),
                               atol=1e-5, rtol=1e-4)


@pytest.mark.parametrize("window_mode", [1, 2])
def test_v6_split_window(window_mode):
    scene, frames, attrs = _room(1024)
    rays_o, rays_d = _rays()
    t_split = jnp.full((rays_o.shape[0],), 6.0, jnp.float32)
    ref = _exact(frames, attrs, rays_o, rays_d, t_split=t_split,
                 window_mode=window_mode)
    out = _run(pallas_render_culled_v6, frames, attrs, rays_o, rays_d,
               cluster=32, tile=128, exhaustive=True, thr=1e-8,
               t_split=t_split, window_mode=window_mode)
    np.testing.assert_allclose(np.asarray(out["full_T"]),
                               np.asarray(ref["full_T"]),
                               atol=1e-5, rtol=1e-4)
