"""Checkpoint / resume.

The reference's primary checkpoint is the PLY itself (scene.py:123-125);
optimizer state is never persisted (capture()/restore() exist but nothing
calls them - SURVEY.md section 5.4), so mid-training resume is effectively
unsupported there.  Here full-state checkpointing is first-class via orbax:
params + Adam moments + step counter + total_weight, alongside the
PLY export for compatibility.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np

from .training import TrainState, init_train_state
from .scene.gaussian_scene import GaussianScene


def save_train_state(path: str, state: TrainState):
    """Write a full-state checkpoint (capture() equivalent,
    gaussian_model.py:77-99)."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, jax.tree_util.tree_map(np.asarray, state))
    ckptr.wait_until_finished()


def load_train_state(path: str) -> TrainState:
    """restore() equivalent (gaussian_model.py:101-123)."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    raw = ckptr.restore(path)

    def rebuild(d, cls):
        return cls(**{k: jax.numpy.asarray(v) for k, v in d.items()})

    return TrainState(
        scene=rebuild(raw["scene"], GaussianScene),
        mu=rebuild(raw["mu"], GaussianScene),
        nu=rebuild(raw["nu"], GaussianScene),
        count=jax.numpy.asarray(raw["count"]),
        total_weight=jax.numpy.asarray(raw["total_weight"]),
    )


def latest_checkpoint(model_path: str) -> Optional[str]:
    ckpt_dir = os.path.join(model_path, "checkpoints")
    if not os.path.isdir(ckpt_dir):
        return None
    entries = [d for d in os.listdir(ckpt_dir) if d.startswith("step_")]
    if not entries:
        return None
    latest = max(entries, key=lambda d: int(d.split("_")[-1]))
    return os.path.join(ckpt_dir, latest)


def checkpoint_path(model_path: str, iteration: int) -> str:
    return os.path.join(model_path, "checkpoints", f"step_{iteration}")
