"""Learned KPN denoiser: structural + training-dynamics tests (CPU).

The real quality gate is tools/denoiser_eval.py on hardware vs a 256-spp
converged reference; these tests pin the properties that make the filter
safe to ship as the default denoise path:
  - convex-combination kernels can never amplify energy,
  - constant images are fixed points,
  - the SPP back-off leaves high-spp input untouched,
  - a few Adam steps actually reduce the denoising loss (the net is
    trainable, not a dead graph).
"""

import jax
import jax.numpy as jnp
import numpy as np

from editable_gaussian_reflections_tpu.renderer import denoise_net as dn


def _fake_inputs(key, H=32, W=32):
    ks = jax.random.split(key, 5)
    spec = jax.random.uniform(ks[0], (H, W, 3)) * 2.0
    normal = jax.random.normal(ks[1], (H, W, 3))
    depth = jax.random.uniform(ks[2], (H, W)) * 5.0
    rough = jax.random.uniform(ks[3], (H, W))
    return spec, normal, depth, rough


def test_apply_shapes_and_convexity():
    params = dn.init_params(jax.random.PRNGKey(0))
    spec, normal, depth, rough = _fake_inputs(jax.random.PRNGKey(1))
    out = dn.denoise_specular_learned(params, spec, normal, depth, rough)
    assert out.shape == spec.shape
    assert np.all(np.isfinite(np.asarray(out)))
    # convex combination of samples: output bounded by the input range
    assert float(jnp.max(out)) <= float(jnp.max(spec)) + 1e-5
    assert float(jnp.min(out)) >= float(jnp.min(spec)) - 1e-5


def test_constant_image_is_fixed_point():
    params = dn.init_params(jax.random.PRNGKey(0))
    _, normal, depth, rough = _fake_inputs(jax.random.PRNGKey(2))
    spec = jnp.full((32, 32, 3), 0.7)
    out = dn.denoise_specular_learned(params, spec, normal, depth, rough)
    np.testing.assert_allclose(np.asarray(out), 0.7, atol=1e-5)


def test_spp_backoff():
    params = dn.init_params(jax.random.PRNGKey(0))
    spec, normal, depth, rough = _fake_inputs(jax.random.PRNGKey(3))
    hi = dn.denoise_specular_learned(params, spec, normal, depth, rough,
                                     spp=jnp.float32(512.0))
    # at 512 spp the filter must be < 0.3% of the way to the filtered image
    delta_hi = float(jnp.max(jnp.abs(hi - spec)))
    lo = dn.denoise_specular_learned(params, spec, normal, depth, rough,
                                     spp=jnp.float32(1.0))
    delta_lo = float(jnp.max(jnp.abs(lo - spec)))
    assert delta_hi <= 0.003 * max(delta_lo, 1e-9) + 1e-7


def test_edge_clamp_not_wraparound():
    """A bright stripe at the top border must not bleed to the bottom row
    (jnp.roll would wrap; the pad+slice gather must not)."""
    params = dn.init_params(jax.random.PRNGKey(0))
    H = W = 32
    spec = jnp.zeros((H, W, 3)).at[0, :, :].set(100.0)
    normal = jnp.tile(jnp.asarray([0.0, 0.0, 1.0]), (H, W, 1))
    depth = jnp.ones((H, W))
    rough = jnp.ones((H, W))
    feat = dn.features(spec, normal, depth, rough)
    logits = jnp.zeros((H, W, dn.KSIZE * dn.KSIZE))  # uniform kernel
    out = dn.apply_kernel(spec, logits)
    assert float(jnp.max(out[-1])) == 0.0  # MAD features see a 3x3 roll
    assert float(jnp.max(out[0])) > 0.0
    del feat


def test_few_steps_reduce_loss():
    import optax

    key = jax.random.PRNGKey(4)
    # synthetic task: noisy = clean + zero-mean speckle; constant G-buffer
    H = W = 32
    clean = jnp.tile(
        jnp.linspace(0.0, 1.0, W)[None, :, None], (H, 1, 3))
    noise = jax.random.normal(key, (H, W, 3)) * 0.3
    noisy = jnp.maximum(clean + noise, 0.0)
    normal = jnp.tile(jnp.asarray([0.0, 0.0, 1.0]), (H, W, 1))
    depth = jnp.ones((H, W))
    rough = jnp.ones((H, W))

    def loss(params):
        feat = dn.features(noisy, normal, depth, rough)
        out = dn.apply_kernel(noisy, dn.apply_net(params, feat))
        return jnp.mean(jnp.abs(out - clean))

    params = dn.init_params(jax.random.PRNGKey(0))
    opt = optax.adam(1e-3)
    state = opt.init(params)
    l0 = float(loss(params))
    for _ in range(30):
        g = jax.grad(loss)(params)
        updates, state = opt.update(g, state)
        params = optax.apply_updates(params, updates)
    l1 = float(loss(params))
    assert l1 < l0 * 0.9, (l0, l1)


def test_load_absent_returns_none(tmp_path, monkeypatch):
    monkeypatch.setenv(dn.WEIGHTS_ENV, str(tmp_path / "nope.npz"))
    assert dn.load_params() is None
    # round-trip
    params = dn.init_params(jax.random.PRNGKey(0))
    path = str(tmp_path / "w.npz")
    dn.save_params(params, path)
    loaded = dn.load_params(path)
    for k in params:
        np.testing.assert_array_equal(np.asarray(params[k]),
                                      np.asarray(loaded[k]))
