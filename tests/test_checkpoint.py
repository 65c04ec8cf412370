"""Full-state checkpoint roundtrip (orbax) - beyond the reference's
PLY-only checkpoints (SURVEY.md section 5.4)."""

import numpy as np

from editable_gaussian_reflections_tpu.checkpoint import (
    load_train_state,
    save_train_state,
)
from editable_gaussian_reflections_tpu.scene.gaussian_scene import from_arrays
from editable_gaussian_reflections_tpu.training import init_train_state


def test_checkpoint_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    n = 16
    scene = from_arrays(
        xyz=rng.normal(size=(n, 3)).astype(np.float32),
        scaling=rng.normal(size=(n, 3)).astype(np.float32),
        rotation=rng.normal(size=(n, 4)).astype(np.float32),
        opacity=rng.normal(size=n).astype(np.float32),
        diffuse=rng.normal(size=(n, 3)).astype(np.float32),
        normal=rng.normal(size=(n, 3)).astype(np.float32),
        f0=rng.normal(size=(n, 3)).astype(np.float32),
        roughness=rng.normal(size=n).astype(np.float32),
        pad_multiple=16,
    )
    state = init_train_state(scene)
    import jax.numpy as jnp
    state = state._replace(
        count=jnp.asarray(42, jnp.int32),
        mu=state.mu._replace(xyz=state.mu.xyz + 0.5),
    )
    path = str(tmp_path / "ckpt" / "step_42")
    save_train_state(path, state)
    restored = load_train_state(path)
    assert int(restored.count) == 42
    np.testing.assert_array_equal(np.asarray(restored.scene.xyz),
                                  np.asarray(scene.xyz))
    np.testing.assert_allclose(np.asarray(restored.mu.xyz),
                               np.asarray(state.mu.xyz))
    np.testing.assert_array_equal(np.asarray(restored.scene.live_mask),
                                  np.asarray(scene.live_mask))
