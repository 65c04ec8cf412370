"""Editing layer tests: bounding-box selections, material/geometry edits,
duplicate/remove (reference editable_gaussian_model.py semantics)."""

import numpy as np
import pytest

from editable_gaussian_reflections_tpu.scene.editable import (
    Edit,
    EditableGaussianScene,
    compute_bbox_mask,
)
from editable_gaussian_reflections_tpu.scene.gaussian_scene import from_arrays


def make_scene(n=20, seed=0):
    rng = np.random.default_rng(seed)
    return from_arrays(
        xyz=rng.uniform(-2, 2, (n, 3)).astype(np.float32),
        scaling=np.full((n, 3), -1.0, np.float32),
        rotation=np.tile(np.array([1, 0, 0, 0], np.float32), (n, 1)),
        opacity=np.zeros(n, np.float32),
        diffuse=rng.uniform(0.1, 0.9, (n, 3)).astype(np.float32),
        normal=rng.normal(size=(n, 3)).astype(np.float32),
        f0=rng.uniform(0, 1, (n, 3)).astype(np.float32),
        roughness=rng.uniform(0, 1, n).astype(np.float32),
        pad_multiple=8,
    )


def test_bbox_masks():
    xyz = np.array([[0, 0, 0], [2, 0, 0], [0.4, 0.4, 0.5]], np.float32)
    box = {"min": [-1, -1, -1], "max": [1, 1, 1]}
    m = compute_bbox_mask(xyz, box)
    assert m.tolist() == [True, False, True]
    cyl = {"min": [-1, -1, -1], "max": [1, 1, 1], "cyl": True}
    m2 = compute_bbox_mask(xyz, cyl)
    # (0.4, 0.4) inside unit ellipse; (2, 0) outside
    assert m2.tolist() == [True, False, True]
    m3 = compute_bbox_mask(np.array([[0.9, 0.9, 0.0]], np.float32), cyl)
    assert m3.tolist() == [False]  # corner outside ellipse but inside box


def test_edit_translate_and_remove():
    scene = make_scene()
    es = EditableGaussianScene(scene)
    boxes = {"obj": {"min": [-3, -3, -3], "max": [3, 3, 3]}}
    es.make_editable({"obj": Edit(translate_x=1.0)}, boxes)
    edited = es.edited_scene()
    live = np.asarray(scene.live_mask)
    d = np.asarray(edited.xyz)[live] - np.asarray(scene.xyz)[live]
    np.testing.assert_allclose(d[:, 0], 1.0, atol=1e-6)
    np.testing.assert_allclose(d[:, 1:], 0.0, atol=1e-6)

    es.remove_object("obj")
    assert np.all(np.asarray(es.base.opacity)[es.selections["obj"]] < -1e7)


def test_edit_roughness_override_and_dirty_tracking():
    scene = make_scene()
    es = EditableGaussianScene(scene)
    boxes = {"obj": {"min": [-3, -3, -3], "max": [3, 3, 3]}}
    edits = {"obj": Edit(use_roughness_override=True, roughness_override=0.5)}
    es.make_editable(edits, boxes)
    assert es.dirty_check(1.0) is True
    e1 = es.edited_scene()
    live = np.asarray(scene.live_mask)
    np.testing.assert_allclose(np.asarray(e1.roughness)[live], 0.25, atol=1e-6)
    assert es.dirty_check(1.0) is False  # unchanged edits -> clean
    edits["obj"].roughness_mult = 2.0
    assert es.dirty_check(1.0) is True
    e2 = es.edited_scene()
    np.testing.assert_allclose(np.asarray(e2.roughness)[live], 0.5, atol=1e-6)


def test_duplicate_object_grows_selections():
    scene = make_scene()
    es = EditableGaussianScene(scene)
    boxes = {"obj": {"min": [0, -3, -3], "max": [3, 3, 3]}}
    es.make_editable({"obj": Edit()}, boxes)
    n_sel = int(es.selections["obj"].sum())
    cap0 = es.base.capacity
    es.duplicate_object("obj")
    assert es.base.capacity == cap0 + n_sel
    assert "obj_copy" in es.selections
    assert int(es.selections["obj_copy"].sum()) == n_sel
    assert int(es.selections["everything"].sum()) == int(
        np.asarray(scene.live_mask).sum()) + n_sel
    # original selection must NOT include the copies
    assert int(es.selections["obj"].sum()) == n_sel


def test_hue_shift_changes_diffuse():
    scene = make_scene()
    es = EditableGaussianScene(scene)
    boxes = {"obj": {"min": [-3, -3, -3], "max": [3, 3, 3]}}
    es.make_editable({"obj": Edit(diffuse_hue_shift=1.0)}, boxes)
    edited = es.edited_scene()
    live = np.asarray(scene.live_mask)
    base = np.maximum(np.asarray(scene.diffuse)[live], 0)
    got = np.asarray(edited.diffuse)[live]
    assert np.abs(got - base).max() > 0.01  # hue rotated
    # value (max channel) preserved under pure hue shift
    np.testing.assert_allclose(got.max(-1), base.max(-1), atol=1e-4)
