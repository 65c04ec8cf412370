"""Prior-prediction dataset pipelines on synthetic fixtures.

Exercises BlenderPriorDataset and ColmapPriorDataset end-to-end (reference
dataset/blender_prior_dataset.py:100-165, colmap_prior_dataset.py:86-170):
COLMAP parsing, buffer loading + untonemap, normals camera->world, the RANSAC
monocular-depth rescale (fixtures are built so the fit MUST recover a known
(a, b) = (8, -0.8) for the distances to come out right), depth->distance via
the position image, metalness->f0, the llffhold split, the get_dataset
dispatch, and a short training run through each pipeline.
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))

from make_prior_fixtures import (
    DEPTH_A,
    DEPTH_B,
    make_blender_prior_dataset,
    make_colmap_prior_dataset,
    true_depth,
)

SIZE = 32
FOV = 0.9


@pytest.fixture(scope="module")
def blender_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("blender_prior")
    return make_blender_prior_dataset(str(d), size=SIZE, n_train=3, n_test=1,
                                      fov=FOV)


@pytest.fixture(scope="module")
def colmap_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("colmap_prior")
    return make_colmap_prior_dataset(str(d), size=SIZE, n_frames=9, fov=FOV)


def expected_distance(size=SIZE, fov=FOV):
    """Distance image implied by the fixture's known z-depth ramp."""
    from editable_gaussian_reflections_tpu.utils.depth import (
        transform_depth_to_position_image,
    )
    pos = transform_depth_to_position_image(true_depth(size), fov, fov)
    return np.linalg.norm(pos, axis=-1)


# ---------------------------------------------------------------- blender

def test_blender_prior_depth_rescale(blender_dir):
    """The RANSAC fit must invert mono=(z-b)/a; distance = |unprojection|."""
    from editable_gaussian_reflections_tpu.dataset.blender_prior import (
        BlenderPriorDataset,
    )
    ds = BlenderPriorDataset(blender_dir, split="train")
    assert len(ds) == 3
    info = ds[0]
    dist = info.depth_image[..., 0]
    # 16-bit quantization of mono -> depth error <= DEPTH_A/65535 ~ 1.2e-4
    np.testing.assert_allclose(dist, expected_distance(), atol=2e-3)
    # a sanity anchor: had the rescale NOT run, depth would be ~0.5 not ~4
    assert dist.mean() > 3.0


def test_blender_prior_buffers_and_pose(blender_dir):
    from editable_gaussian_reflections_tpu.dataset.blender_prior import (
        BlenderPriorDataset,
    )
    from editable_gaussian_reflections_tpu.ops.tonemap import untonemap
    import jax.numpy as jnp

    ds = BlenderPriorDataset(blender_dir, split="train")
    info = ds[1]
    # fixture poses: COLMAP R=I, center=(0.15*i, 0, 0) -> w2c T = -center
    np.testing.assert_allclose(info.R, np.eye(3), atol=1e-12)
    np.testing.assert_allclose(info.T, [-0.15, 0.0, 0.0], atol=1e-12)
    assert info.width == SIZE and info.height == SIZE
    np.testing.assert_allclose(info.FovX, FOV)

    # metalness 0.3 -> f0 = 0.04*0.7 + 0.3 = 0.328 on all 3 channels
    assert info.f0_image.shape == (SIZE, SIZE, 3)
    np.testing.assert_allclose(info.f0_image, 0.328, atol=1e-3)
    np.testing.assert_allclose(info.roughness_image, 0.5, atol=1e-3)

    # camera normal (0,0,1) -> flipped + rotated by R=I -> world (0,0,-1)
    np.testing.assert_allclose(
        info.normal_image, np.broadcast_to([0.0, 0.0, -1.0], (SIZE, SIZE, 3)),
        atol=1e-2)

    # render/diffuse/specular are untonemapped from the stored 8-bit values
    from PIL import Image
    stored = np.asarray(
        Image.open(os.path.join(blender_dir, "train", "render",
                                "render_001.png")), np.float32) / 255.0
    expect = np.asarray(untonemap(jnp.asarray(stored)))
    np.testing.assert_allclose(info.image, expect, atol=1e-6)
    assert info.diffuse_image.shape == (SIZE, SIZE, 3)
    assert info.specular_image.shape == (SIZE, SIZE, 3)


def test_blender_prior_test_split(blender_dir):
    from editable_gaussian_reflections_tpu.dataset.blender_prior import (
        BlenderPriorDataset,
    )
    ds = BlenderPriorDataset(blender_dir, split="test")
    assert len(ds) == 1
    info = ds[0]
    # test frame index 3 -> center x = 0.45
    np.testing.assert_allclose(info.T, [-0.45, 0.0, 0.0], atol=1e-12)
    np.testing.assert_allclose(info.depth_image[..., 0], expected_distance(),
                               atol=2e-3)


def test_blender_prior_resolution_downsample(blender_dir):
    from editable_gaussian_reflections_tpu.dataset.blender_prior import (
        BlenderPriorDataset,
    )
    ds = BlenderPriorDataset(blender_dir, split="train", resolution=SIZE // 2)
    info = ds[0]
    assert info.image.shape == (SIZE // 2, SIZE // 2, 3)
    assert info.depth_image.shape == (SIZE // 2, SIZE // 2, 1)
    # the ramp survives area-downsampling; RANSAC still fits on the coarse map
    d = info.depth_image[..., 0]
    assert 2.5 < d.min() < d.max() < 6.5


# ----------------------------------------------------------------- colmap

def test_colmap_prior_llffhold_split(colmap_dir):
    from editable_gaussian_reflections_tpu.dataset.colmap_prior import (
        ColmapPriorDataset,
    )
    train = ColmapPriorDataset(colmap_dir, split="train")
    test = ColmapPriorDataset(colmap_dir, split="test")
    # 9 frames, llffhold=8: test = indices {0, 8}, train = the other 7
    assert len(train) == 7 and len(test) == 2
    no_eval = ColmapPriorDataset(colmap_dir, split="test", do_eval=False)
    assert len(no_eval) == 0


def test_colmap_prior_item(colmap_dir):
    from editable_gaussian_reflections_tpu.dataset.colmap_prior import (
        ColmapPriorDataset,
    )
    ds = ColmapPriorDataset(colmap_dir, split="test")
    info = ds[0]  # frame 0
    np.testing.assert_allclose(info.R, np.eye(3), atol=1e-9)
    np.testing.assert_allclose(info.T, [0.0, 0.0, 0.0], atol=1e-12)
    # PINHOLE intrinsics -> fov from fx, fy
    np.testing.assert_allclose(info.FovX, FOV, atol=1e-12)
    np.testing.assert_allclose(info.FovY, FOV, atol=1e-12)
    np.testing.assert_allclose(info.depth_image[..., 0], expected_distance(),
                               atol=2e-3)
    np.testing.assert_allclose(info.f0_image, 0.328, atol=1e-3)
    assert info.image_name == "f_000.jpg"


def test_colmap_prior_clamp_max(colmap_dir):
    from editable_gaussian_reflections_tpu.dataset.colmap_prior import (
        ColmapPriorDataset,
    )
    ds = ColmapPriorDataset(colmap_dir, split="train", clamp_max=0.2)
    info = ds[0]
    assert float(info.image.max()) <= 0.2 + 1e-6
    assert float(info.diffuse_image.max()) <= 0.2 + 1e-6


# --------------------------------------------------------------- dispatch

def test_get_dataset_dispatch(blender_dir, colmap_dir, tmp_path):
    from editable_gaussian_reflections_tpu.config import Config
    from editable_gaussian_reflections_tpu.dataset.blender_prior import (
        BlenderPriorDataset,
    )
    from editable_gaussian_reflections_tpu.dataset.colmap_prior import (
        ColmapPriorDataset,
    )
    from editable_gaussian_reflections_tpu.scene.dataset_readers import (
        get_dataset,
    )
    cfg = Config(source_path="x", model_path=str(tmp_path / "m"))
    assert isinstance(get_dataset(cfg, colmap_dir, "train"),
                      ColmapPriorDataset)
    assert isinstance(get_dataset(cfg, blender_dir, "train"),
                      BlenderPriorDataset)


# ------------------------------------------------------------ e2e training

@pytest.mark.parametrize("which", ["blender", "colmap"])
def test_train_few_iters_on_priors(which, blender_dir, colmap_dir, tmp_path):
    """5 iterations of the real training loop through each prior pipeline."""
    os.environ["NO_WORKERS"] = "1"
    from editable_gaussian_reflections_tpu.config import Config
    import train as train_cli

    src = blender_dir if which == "blender" else colmap_dir
    model_path = str(tmp_path / f"model_{which}")
    cfg = Config(
        source_path=src, model_path=model_path, resolution=SIZE,
        iterations=5, no_bounces_until_iter=2,
        test_iterations=[5], save_iterations=[5],
        trace_chunk=64, max_hits=8, ray_tile=SIZE * SIZE,
        init_num_pts_farfield=64,
        pruning_interval=4, pruning_start_iter=3, val_view=0,
    )
    train_cli.main(cfg)
    assert os.path.exists(os.path.join(model_path, "point_cloud",
                                       "iteration_5", "point_cloud.ply"))
