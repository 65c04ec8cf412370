"""Viewer tests: ViewerState render modes, edits round-trip, and the
RenderService tick protocol (driven directly, no sockets)."""

import json
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))

from editable_gaussian_reflections_tpu.config import Config
from editable_gaussian_reflections_tpu.scene.editable import (
    Edit,
    EditableGaussianScene,
)
from editable_gaussian_reflections_tpu.scene.gaussian_scene import from_arrays
from editable_gaussian_reflections_tpu.viewer.service import RenderService
from editable_gaussian_reflections_tpu.viewer.state import (
    RENDER_MODES,
    ViewerState,
)


@pytest.fixture(scope="module")
def state():
    rng = np.random.default_rng(0)
    n = 24
    base = from_arrays(
        xyz=np.stack([rng.uniform(-1, 1, n), rng.uniform(-1, 1, n),
                      np.full(n, 4.0)], -1).astype(np.float32),
        scaling=np.full((n, 3), np.log(0.4), np.float32),
        rotation=np.tile(np.array([1, 0, 0, 0], np.float32), (n, 1)),
        opacity=np.full(n, 2.0, np.float32),
        diffuse=rng.uniform(0.2, 1.0, (n, 3)).astype(np.float32),
        normal=np.tile(np.array([0, 0, -1], np.float32), (n, 1)),
        f0=np.full((n, 3), 0.04, np.float32),
        roughness=np.full(n, 0.5, np.float32),
        pad_multiple=32,
    )
    scene = EditableGaussianScene(base)
    scene.make_editable(
        {"blob": Edit()},
        {"blob": {"min": [-2, -2, 2], "max": [2, 2, 6]}},
    )
    cfg = Config(trace_chunk=32, max_hits=8, ray_tile=1024)
    return ViewerState(scene, cfg, width=32, height=32, fovy=0.9)


def test_render_modes_produce_images(state):
    svc = RenderService(state)
    for mode in range(len(RENDER_MODES)):
        meta, frame = svc.tick({"viewer": {"render_mode": mode,
                                           "num_bounces": 0}})
        h, w, c = meta["frame_shape"]
        img = np.frombuffer(frame, np.uint8).reshape(h, w, c)
        assert img.shape == (32, 32, 3)
        if RENDER_MODES[mode] in ("RGB", "Ellipsoids"):
            assert img.max() > 0, f"mode {RENDER_MODES[mode]} rendered black"


def test_tick_reports_perf_history(state):
    """Each tick carries render-time perf metadata for the client's
    perf-monitor plot (the reference viewer's implot FPS panel analog)."""
    svc = RenderService(state)
    for _ in range(3):
        meta, _ = svc.tick({"viewer": {"num_bounces": 0}})
    perf = meta["perf"]
    assert perf["render_ms"] > 0 and perf["fps"] > 0
    assert len(perf["history_ms"]) == 3
    assert perf["history_ms"][-1] == perf["render_ms"]


def test_inspect_pixel_reports_gbuffer(state):
    """The PixelInspector analog: an inspect request returns the last
    frame's G-buffer values (rgb/depth/normal/f0/roughness) at the pixel."""
    svc = RenderService(state)
    meta, _ = svc.tick({"viewer": {"num_bounces": 0}, "inspect": [16, 16]})
    ins = meta["inspect"]
    # raster modes additionally expose the hit Gaussian id ("gid" - the
    # fragment shader's commented-out out_id, ellipsoid_viewer.py:219)
    assert {"rgb", "normal", "depth", "f0", "roughness"} <= set(ins)
    assert len(ins["rgb"]) == 3 and len(ins["depth"]) == 1
    assert svc.tick({"viewer": {}, "inspect": [9999, 0]})[0]["inspect"] is None


def test_goto_dataset_camera(state):
    """CameraSelect analog: names ride the metadata; a goto_camera request
    answers with the stored pose."""
    state.dataset_cameras = [dict(name="train_000", R=np.eye(3).tolist(),
                                  camera_center=[0.0, 0.0, -2.0])]
    svc = RenderService(state)
    meta, _ = svc.tick({"viewer": {"num_bounces": 0}, "goto_camera": 0})
    assert meta["dataset_camera_names"] == ["train_000"]
    assert meta["camera_jump"]["name"] == "train_000"
    assert meta["camera_jump"]["camera_center"] == [0.0, 0.0, -2.0]
    meta2, _ = svc.tick({"viewer": {}, "goto_camera": 5})
    assert "camera_jump" not in meta2


def test_edit_applies_through_service(state):
    svc = RenderService(state)
    req = {"viewer": {"render_mode": 4, "num_bounces": 0}}  # roughness mode
    _, frame0 = svc.tick(req)
    img0 = np.frombuffer(frame0, np.uint8).astype(np.float32)
    req["viewer"]["edits"] = {
        "blob": {"use_roughness_override": True, "roughness_override": 1.0}
    }
    meta, frame1 = svc.tick(req)
    img1 = np.frombuffer(frame1, np.uint8).astype(np.float32)
    assert img1.mean() > img0.mean() + 5  # roughness 0.5 -> 1.0
    assert meta["edits"]["blob"]["roughness_override"] == 1.0


def test_raster_mode_gid_pick(state):
    """In Ellipsoids/Points modes a click resolves instantly from the
    rasterizer's hit-id G-buffer (no per-object mask renders)."""
    from editable_gaussian_reflections_tpu.viewer.state import RENDER_MODES

    svc = RenderService(state)
    mode = RENDER_MODES.index("Ellipsoids")
    meta, frame = svc.tick({"viewer": {"render_mode": mode}})
    img = np.frombuffer(frame, np.uint8).reshape(
        *meta["frame_shape"]).max(-1)
    ys, xs = np.nonzero(img)
    assert len(ys), "ellipsoid view rendered black"
    y, x = int(ys[len(ys) // 2]), int(xs[len(ys) // 2])
    meta, _ = svc.tick({"viewer": {"render_mode": mode}, "pick": [x, y]})
    assert meta["picked_object"] == "blob"
    # background pixel picks nothing
    bg = np.argwhere(img == 0)
    if len(bg):
        meta, _ = svc.tick({"viewer": {"render_mode": mode},
                            "pick": [int(bg[0][1]), int(bg[0][0])]})
        assert meta["picked_object"] is None


def test_accumulation_resets_on_edit(state):
    svc = RenderService(state)
    req = {"viewer": {"render_mode": 0, "num_bounces": 0,
                      "accumulate_samples": True}}
    svc.tick(req)
    svc.tick(req)
    assert state._accum_count == 2
    req["viewer"]["edits"] = {"blob": {"translate_x": 0.3}}
    svc.tick(req)
    assert state._accum_count == 1  # dirty -> reset


def test_pipelined_handler_overlaps_and_replies_in_order(state):
    """The websocket handler submits request N before awaiting N-1
    (VERDICT r1 item 9); every request gets a reply and frames arrive in
    submission order (with the first frame primed twice)."""
    import asyncio

    svc = RenderService(state)

    sent = []

    class FakeSocket:
        def __init__(self, requests):
            self.requests = list(requests)

        async def recv(self):
            if not self.requests:
                raise ConnectionError("client done")
            return json.dumps(self.requests.pop(0))

        async def send(self, payload):
            sent.append(payload)

        async def close(self):
            pass

    reqs = [{"viewer": {"render_mode": 0}} for _ in range(4)]
    asyncio.run(svc._handle(FakeSocket(reqs)))
    # 3 messages per tick (metadata json, binary map json, frame bytes);
    # 4 requests -> 4 replies
    assert len(sent) == 12
    frames = [p for p in sent if isinstance(p, (bytes, bytearray))]
    assert len(frames) == 4
    h, w = state.height, state.width
    for f in frames:
        assert len(f) == h * w * 3


def test_object_centers_follow_translation(state):
    """The gizmo anchor (object_centers in the tick metadata) tracks the
    object's translate edit (gaussian_viewer.py:620-789 places imguizmo at
    the same world point)."""
    svc = RenderService(state)
    meta, _ = svc.tick({"viewer": {"render_mode": 0, "num_bounces": 0,
                                   "edits": {"blob": {"translate_x": 0.0}}}})
    c0 = np.array(meta["object_centers"]["blob"])
    meta, _ = svc.tick({"viewer": {"render_mode": 0, "num_bounces": 0,
                                   "edits": {"blob": {"translate_x": 0.5}}}})
    c1 = np.array(meta["object_centers"]["blob"])
    np.testing.assert_allclose(c1 - c0, [0.5, 0.0, 0.0], atol=1e-6)


def test_local_orbit_camera_convention(state):
    """LOCAL mode's OrbitCamera emits the same pose convention the web
    client does (viewer/local.py OrbitCamera vs client.html camPose): an
    orbit aimed at the blob cluster must actually render it."""
    from editable_gaussian_reflections_tpu.viewer.local import OrbitCamera

    cam = OrbitCamera(target=np.array([0.0, 0.0, 4.0]), dist=4.0,
                      yaw=0.0, pitch=0.0, fovy=0.9)
    d = cam.camera_dict()
    R = np.asarray(d["R"])
    np.testing.assert_allclose(R.T @ R, np.eye(3), atol=1e-12)  # orthonormal
    np.testing.assert_allclose(d["camera_center"], [0, 0, 0], atol=1e-12)
    np.testing.assert_allclose(R[:, 2], [0, 0, 1], atol=1e-12)  # fwd +z

    svc = RenderService(state)
    meta, frame = svc.tick({"viewer": {"render_mode": 0, "num_bounces": 0},
                            "camera": d})
    img = np.frombuffer(frame, np.uint8)
    assert img.max() > 0, "orbit camera aimed at the scene rendered black"

    # yawing 180 degrees looks away from the blobs -> black frame
    cam2 = OrbitCamera(target=np.array([0.0, 0.0, -4.0]), dist=4.0,
                       yaw=np.pi, pitch=0.0, fovy=0.9)
    _, frame2 = svc.tick({"viewer": {"render_mode": 0, "num_bounces": 0},
                          "camera": cam2.camera_dict()})
    assert np.frombuffer(frame2, np.uint8).max() == 0


def test_preview_scale_keeps_protocol_shape(state):
    """Drag-time preview downscale (client fast-drag): the server renders at
    width/s x height/s but nearest-upscales back, so frame_shape, pick and
    inspect coordinates, and the accumulation buffers never change."""
    svc = RenderService(state)
    meta, frame = svc.tick({"viewer": {"render_mode": 0, "num_bounces": 0,
                                       "preview_scale": 2,
                                       "accumulate_samples": False}})
    assert meta["frame_shape"] == [32, 32, 3]
    assert meta["preview_scale"] == 2
    img = np.frombuffer(frame, np.uint8).reshape(32, 32, 3)
    # nearest-upscaled from 16x16: every 2x2 block is constant
    assert np.array_equal(img[0::2, 0::2], img[1::2, 1::2])
    assert img.max() > 0

    # invalid scale (16*4 does not divide 32) falls back to full res
    meta4, frame4 = svc.tick({"viewer": {"preview_scale": 4}})
    img4 = np.frombuffer(frame4, np.uint8).reshape(32, 32, 3)
    assert img4.max() > 0

    # restore module-scoped fixture state
    svc.tick({"viewer": {"preview_scale": 1, "accumulate_samples": True}})
