"""v5 transposed fine-cluster render kernel vs the proven v4 kernel.

Two layers of checks (interpret mode on CPU):

* EXACT equality on the full traversal: with the group early-exits defused
  (cand_near = 0 disables the `behind` test; a tiny transmittance threshold
  disables the saturation test) both kernels see every hit and must agree
  bitwise-ish (forward_pass.cu:49-155 composite semantics are order-free).
* Tolerance equality under real culling: the group early-exit truncates the
  full_T tail at group granularity, and finer clusters mean finer groups -
  the difference is bounded by the transmittance threshold (the exit only
  fires once every ray's remaining contribution is below it), so outputs
  agree to ~threshold.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from editable_gaussian_reflections_tpu.ops.culling import (
    cluster_bounds,
    select_candidates,
)
from editable_gaussian_reflections_tpu.ops.pallas.render_kernel import (
    unpack_composite,
)
from editable_gaussian_reflections_tpu.ops.pallas.render_kernel_v3 import (
    pallas_render_culled_v4,
)
from editable_gaussian_reflections_tpu.ops.pallas.render_kernel_v5 import (
    pallas_render_culled_v5,
)
from editable_gaussian_reflections_tpu.ops.pallas.trace_kernel import (
    pack_frames,
)
from tests.test_render_kernel import SETTINGS, _rays, _room


def _run(kern, frames, attrs, rays_o, rays_d, *, cluster, tile,
         exhaustive=False, thr=None, secondary=0.0, alive=None,
         t_split=None, window_mode=0, max_hits=8, **kw):
    gpack = pack_frames(frames, attrs)
    n_c = gpack.shape[1] // cluster
    znear, zfar = jnp.float32(0.05), jnp.float32(50.0)
    if exhaustive:
        n_t = rays_o.shape[0] // tile
        cands = jnp.broadcast_to(jnp.arange(n_c, dtype=jnp.int32),
                                 (n_t, n_c))
        cnear = jnp.zeros((n_t, n_c), jnp.float32)
        num = None
    else:
        bounds = cluster_bounds(frames, cluster)
        cands, cnear, num, _o, _td = select_candidates(
            rays_o, rays_d, bounds, znear, zfar, tile=tile,
            max_clusters=n_c)
    out = kern(
        rays_o, rays_d, gpack, cands, cnear, num, znear, zfar, 3.0,
        jnp.float32(secondary), SETTINGS.backfacing_max_dist,
        SETTINGS.backfacing_invalid_normal_threshold,
        transmittance_threshold=(thr if thr is not None
                                 else SETTINGS.transmittance_threshold),
        max_hits=max_hits, cluster=cluster, tile=tile, interpret=True,
        alive=alive, t_split=t_split, window_mode=window_mode, **kw)
    return unpack_composite(out)


def _assert_close(a, b, atol=2e-5):
    for k in ("rgb", "normal", "f0", "roughness", "depth", "T_final",
              "full_T"):
        np.testing.assert_allclose(np.asarray(a[k]), np.asarray(b[k]),
                                   atol=atol, rtol=1e-4, err_msg=k)


@pytest.mark.parametrize("cluster,span", [(64, 128), (32, 128), (32, 64)])
@pytest.mark.parametrize("secondary", [0.0, 1.0])
def test_v5_exact_vs_v4_full_traversal(cluster, span, secondary):
    scene, frames, attrs = _room(1024)
    rays_o, rays_d = _rays()
    if secondary:
        key = jax.random.PRNGKey(3)
        rays_d = jax.random.normal(key, rays_d.shape)
        rays_d = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
    ref = _run(pallas_render_culled_v4, frames, attrs, rays_o, rays_d,
               cluster=128, tile=256, exhaustive=True, thr=1e-8,
               secondary=secondary, secondary_static=int(secondary))
    out = _run(pallas_render_culled_v5, frames, attrs, rays_o, rays_d,
               cluster=cluster, tile=128, exhaustive=True, thr=1e-8,
               secondary=secondary, span=span,
               secondary_static=int(secondary))
    _assert_close(out, ref)


def test_v5_culled_matches_to_threshold():
    """Real per-tile culling + early exits active.

    The group `behind` exit truncates the full_T tail (exact for the top-K
    selection, approximate for the truncated-tail correction - a v3/v4
    semantic this kernel inherits); finer clusters mean finer exit
    granularity, so a few rays' tail factors shift.  Assert the effect
    stays confined: almost all rays agree tightly and no ray moves more
    than the tail correction can account for."""
    scene, frames, attrs = _room(1024)
    rays_o, rays_d = _rays()
    ref = _run(pallas_render_culled_v4, frames, attrs, rays_o, rays_d,
               cluster=128, tile=256, secondary_static=0)
    out = _run(pallas_render_culled_v5, frames, attrs, rays_o, rays_d,
               cluster=32, tile=128, span=128, secondary_static=0)
    err = np.abs(np.asarray(out["rgb"]) - np.asarray(ref["rgb"])).max(-1)
    assert (err <= 5e-3).mean() >= 0.98, (err > 5e-3).mean()
    assert err.max() < 0.1, err.max()


def test_v5_dead_rays_and_alive_mask():
    scene, frames, attrs = _room(1024)
    rays_o, rays_d = _rays()
    alive = (jnp.arange(rays_o.shape[0]) % 3 != 0)
    ref = _run(pallas_render_culled_v4, frames, attrs, rays_o, rays_d,
               cluster=128, tile=256, exhaustive=True, thr=1e-8, alive=alive)
    out = _run(pallas_render_culled_v5, frames, attrs, rays_o, rays_d,
               cluster=64, tile=128, exhaustive=True, thr=1e-8, alive=alive)
    _assert_close(out, ref)


@pytest.mark.parametrize("window_mode", [1, 2])
def test_v5_split_window_matches_v4(window_mode):
    scene, frames, attrs = _room(1024)
    rays_o, rays_d = _rays()
    t_split = jnp.full((rays_o.shape[0],), 6.0, jnp.float32)
    ref = _run(pallas_render_culled_v4, frames, attrs, rays_o, rays_d,
               cluster=128, tile=256, exhaustive=True, thr=1e-8,
               t_split=t_split, window_mode=window_mode)
    out = _run(pallas_render_culled_v5, frames, attrs, rays_o, rays_d,
               cluster=32, tile=128, exhaustive=True, thr=1e-8,
               t_split=t_split, window_mode=window_mode)
    _assert_close(out, ref)
