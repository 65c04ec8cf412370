"""End-to-end dryrun: dataset -> Scene -> a few training iterations -> PLY
checkpoint (the scripts/dryrun.sh equivalent, SURVEY.md section 4)."""

import json
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))

from make_synth_dataset import make_dataset


@pytest.fixture(scope="module")
def synth_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("synth_scene")
    return make_dataset(str(d), size=24, n_train=3, n_test=1, n_points=64)


def test_dataset_and_scene(synth_dir, tmp_path):
    from editable_gaussian_reflections_tpu.config import Config
    from editable_gaussian_reflections_tpu.scene.scene import Scene

    cfg = Config(source_path=synth_dir, model_path=str(tmp_path / "model"),
                 resolution=24, trace_chunk=64)
    scene = Scene(cfg, shuffle=False)
    assert len(scene.getTrainCameras()) == 3
    assert len(scene.getTestCameras()) == 1
    cam = scene.getTrainCameras()[0]
    assert cam.image_width == 24 and cam.image_height == 24
    assert cam.znear > 0 and cam.zfar > cam.znear
    assert scene.gaussians.capacity % 64 == 0
    # diffuse untonemapped from uint8 -> HDR floats
    assert cam.diffuse_image.dtype == np.float32


def test_train_few_iters(synth_dir, tmp_path):
    os.environ["NO_WORKERS"] = "1"
    from editable_gaussian_reflections_tpu.config import Config
    import train as train_cli

    model_path = str(tmp_path / "model")
    cfg = Config(
        source_path=synth_dir, model_path=model_path, resolution=24,
        iterations=6, no_bounces_until_iter=2,
        test_iterations=[6], save_iterations=[6],
        trace_chunk=64, max_hits=8, ray_tile=24 * 24,
        init_num_pts_farfield=128,
        pruning_interval=4, pruning_start_iter=3, val_view=0,
    )
    state = train_cli.main(cfg)
    # artifacts in the reference layout
    assert os.path.exists(os.path.join(model_path, "cfg.json"))
    ply = os.path.join(model_path, "point_cloud", "iteration_6",
                       "point_cloud.ply")
    assert os.path.exists(ply)
    assert os.path.exists(os.path.join(model_path, "time.txt"))
    assert os.path.exists(os.path.join(model_path, "num_gaussians.txt"))
    csv = os.path.join(model_path, "test_validation_scores.csv")
    assert os.path.exists(csv)
    # params must stay finite
    for f in ("xyz", "scaling", "rotation", "opacity", "diffuse"):
        arr = np.asarray(getattr(state.scene, f))
        assert np.isfinite(arr).all(), f"non-finite {f}"
    with open(os.path.join(model_path, "cfg.json")) as fh:
        assert json.load(fh)["iterations"] == 6

    # checkpoint roundtrip
    from editable_gaussian_reflections_tpu.scene.scene import load_scene_ply
    from editable_gaussian_reflections_tpu.utils.ply import load_gaussian_ply
    d = load_gaussian_ply(ply)
    assert d["xyz"].shape[1] == 3 and d["rotation"].shape[1] == 4
    reloaded = load_scene_ply(ply, pad_multiple=64)
    assert reloaded.capacity >= d["xyz"].shape[0]
