"""Pallas MXU gradient scatter vs the XLA scatter-add, interpret mode.

The scatter kernel is the TPU replacement for the reference's atomicAddX
gradient flush (backward_pass.cu:209-220); it must reproduce
render_grads.scatter_grads exactly for cluster-structured hit ids."""

import jax.numpy as jnp
import numpy as np
import pytest

from editable_gaussian_reflections_tpu.ops.pallas.scatter_kernel import (
    scatter_fits,
    scatter_grads_pallas,
)
from editable_gaussian_reflections_tpu.ops.render_grads import (
    _SCATTER_FIELDS,
    scatter_grads,
)


def _random_case(seed, R=512, K=4, N=1024, cluster=128, tile=256, mc=4):
    """Hit ids drawn only from each tile's candidate clusters (the invariant
    the trace kernel guarantees), plus masked-out slots with zero payload."""
    rng = np.random.default_rng(seed)
    n_tiles = R // tile
    n_clusters = N // cluster
    cands = np.full((n_tiles, mc), n_clusters, np.int32)   # dummy-filled
    ids = np.zeros((R, K), np.int32)
    for t in range(n_tiles):
        k = rng.integers(1, mc + 1)
        chosen = rng.choice(n_clusters, size=k, replace=False)
        cands[t, :k] = chosen
        hit_clusters = rng.choice(chosen, size=(tile, K))
        ids[t * tile:(t + 1) * tile] = (
            hit_clusters * cluster + rng.integers(0, cluster, (tile, K)))
    mask = rng.random((R, K)) < 0.8
    ids = np.where(mask, ids, 0)
    per_hit = {}
    for name, n in _SCATTER_FIELDS:
        shape = (R, K, n) if n > 1 else (R, K)
        v = rng.standard_normal(shape).astype(np.float32)
        per_hit[name] = jnp.asarray(v * (mask[..., None] if n > 1 else mask))
    return per_hit, jnp.asarray(ids), jnp.asarray(cands)


@pytest.mark.parametrize("seed", [0, 1])
def test_scatter_matches_xla(seed):
    N, cluster, tile, mc = 1024, 128, 256, 4
    per_hit, ids, cands = _random_case(seed, N=N, cluster=cluster,
                                       tile=tile, mc=mc)
    ref = scatter_grads(per_hit, ids, N)
    got = scatter_grads_pallas(per_hit, ids, cands, N, cluster=cluster,
                               tile=tile, interpret=True)
    for name, r, g in zip(ref._fields, ref, got):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r), rtol=2e-5,
                                   atol=2e-5, err_msg=name)


def test_duplicate_dummy_clusters_accumulate_zero():
    """All-dummy candidate rows (empty tiles) must leave the grads zero."""
    per_hit, ids, cands = _random_case(3)
    z = {k: jnp.zeros_like(v) for k, v in per_hit.items()}
    got = scatter_grads_pallas(z, jnp.zeros_like(ids), cands, 1024,
                               interpret=True)
    for g in got:
        assert float(jnp.abs(g).max()) == 0.0


def test_scatter_multi_matches_per_step_sum():
    """The single-launch multi-bounce scatter must equal the sum of the
    per-step XLA scatters (the train step wires all bounces into one call)."""
    from editable_gaussian_reflections_tpu.ops.pallas.scatter_kernel import (
        scatter_grads_pallas_multi,
    )

    N, cluster, tile, mc = 1024, 128, 256, 4
    cases = [_random_case(s, N=N, cluster=cluster, tile=tile, mc=mc)
             for s in (5, 6, 7)]
    per_hits = [c[0] for c in cases]
    ids_list = [c[1] for c in cases]
    cands_list = [c[2] for c in cases]
    ref = scatter_grads(per_hits[0], ids_list[0], N)
    for ph, ids in zip(per_hits[1:], ids_list[1:]):
        ref = ref + scatter_grads(ph, ids, N)
    got = scatter_grads_pallas_multi(per_hits, ids_list, cands_list, N,
                                     cluster=cluster, tile=tile,
                                     interpret=True)
    for name, r, g in zip(ref._fields, ref, got):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r), rtol=2e-5,
                                   atol=2e-5, err_msg=name)


def test_scatter_fits_budget():
    assert scatter_fits(180_000)
    assert not scatter_fits(1_000_000)
