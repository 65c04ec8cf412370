"""IO codec tests: PLY roundtrips (21-field checkpoint schema + xyzrgb) and
the pure-python COLMAP binary/text readers."""

import os
import struct

import numpy as np

from editable_gaussian_reflections_tpu.utils.ply import (
    GAUSSIAN_FIELDS,
    load_gaussian_ply,
    load_xyzrgb_ply,
    read_ply,
    save_gaussian_ply,
    save_xyzrgb_ply,
)
from editable_gaussian_reflections_tpu.dataset.colmap_loader import (
    qvec2rotmat,
    read_cameras_binary,
    read_images_binary,
    read_points3D_binary,
)


def test_gaussian_ply_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    n = 37
    data = dict(
        xyz=rng.normal(size=(n, 3)).astype(np.float32),
        diffuse=rng.normal(size=(n, 3)).astype(np.float32),
        opacity=rng.normal(size=n).astype(np.float32),
        scaling=rng.normal(size=(n, 3)).astype(np.float32),
        rotation=rng.normal(size=(n, 4)).astype(np.float32),
        normal=rng.normal(size=(n, 3)).astype(np.float32),
        roughness=rng.normal(size=n).astype(np.float32),
        f0=rng.normal(size=(n, 3)).astype(np.float32),
    )
    path = str(tmp_path / "pc.ply")
    save_gaussian_ply(path, **data)

    # byte-level: header must declare exactly the reference's 21 fields
    with open(path, "rb") as f:
        header = f.read(2000).split(b"end_header")[0].decode()
    for field in GAUSSIAN_FIELDS:
        assert f"property float {field}" in header
    assert f"element vertex {n}" in header

    out = load_gaussian_ply(path)
    for k in data:
        np.testing.assert_array_equal(out[k].reshape(data[k].shape), data[k])


def test_xyzrgb_ply_roundtrip(tmp_path):
    xyz = np.random.randn(11, 3).astype(np.float32)
    rgb = np.random.rand(11, 3).astype(np.float32)
    path = str(tmp_path / "points.ply")
    save_xyzrgb_ply(path, xyz, rgb)
    x2, c2 = load_xyzrgb_ply(path)
    np.testing.assert_array_equal(x2, xyz)
    np.testing.assert_allclose(c2, rgb, atol=1e-6)


def test_ascii_ply(tmp_path):
    path = str(tmp_path / "a.ply")
    with open(path, "w") as f:
        f.write("ply\nformat ascii 1.0\nelement vertex 2\n"
                "property float x\nproperty float y\nproperty float z\n"
                "end_header\n1 2 3\n4 5 6\n")
    cols = read_ply(path)
    np.testing.assert_allclose(cols["x"], [1, 4])
    np.testing.assert_allclose(cols["z"], [3, 6])


def _write_colmap_binary(d):
    # cameras.bin: 1 PINHOLE camera
    with open(os.path.join(d, "cameras.bin"), "wb") as f:
        f.write(struct.pack("<Q", 1))
        f.write(struct.pack("<iiQQ", 1, 1, 640, 480))
        f.write(struct.pack("<4d", 500.0, 500.0, 320.0, 240.0))
    # images.bin: 1 image with 2 observed points
    with open(os.path.join(d, "images.bin"), "wb") as f:
        f.write(struct.pack("<Q", 1))
        f.write(struct.pack("<i", 7))
        f.write(struct.pack("<4d", 1.0, 0.0, 0.0, 0.0))
        f.write(struct.pack("<3d", 0.1, 0.2, 0.3))
        f.write(struct.pack("<i", 1))
        f.write(b"img0.png\x00")
        f.write(struct.pack("<Q", 2))
        f.write(struct.pack("<ddq", 10.0, 20.0, 100))
        f.write(struct.pack("<ddq", 30.0, 40.0, -1))
    # points3D.bin: 1 point with a 2-entry track
    with open(os.path.join(d, "points3D.bin"), "wb") as f:
        f.write(struct.pack("<Q", 1))
        f.write(struct.pack("<Q", 100))
        f.write(struct.pack("<3d", 1.0, 2.0, 3.0))
        f.write(struct.pack("<3B", 255, 128, 0))
        f.write(struct.pack("<d", 0.5))
        f.write(struct.pack("<Q", 2))
        f.write(struct.pack("<ii", 7, 0))
        f.write(struct.pack("<ii", 7, 1))


def test_colmap_binary_readers(tmp_path):
    d = str(tmp_path)
    _write_colmap_binary(d)
    cams = read_cameras_binary(os.path.join(d, "cameras.bin"))
    assert cams[1].model == "PINHOLE"
    assert cams[1].width == 640
    np.testing.assert_allclose(cams[1].params, [500, 500, 320, 240])

    imgs = read_images_binary(os.path.join(d, "images.bin"))
    img = imgs[7]
    assert img.name == "img0.png"
    np.testing.assert_allclose(img.tvec, [0.1, 0.2, 0.3])
    np.testing.assert_allclose(img.xys, [[10, 20], [30, 40]])
    assert img.point3D_ids.tolist() == [100, -1]

    xyz, rgb, err, ids = read_points3D_binary(os.path.join(d, "points3D.bin"))
    np.testing.assert_allclose(xyz, [[1, 2, 3]])
    assert rgb.tolist() == [[255, 128, 0]]
    assert ids.tolist() == [100]

    R = qvec2rotmat([1.0, 0.0, 0.0, 0.0])
    np.testing.assert_allclose(R, np.eye(3))


def test_colmap_parser_point_indices(tmp_path):
    d = str(tmp_path / "scene" / "sparse" / "0")
    os.makedirs(d)
    _write_colmap_binary(d)
    from editable_gaussian_reflections_tpu.dataset.colmap_parser import ColmapParser
    parser = ColmapParser(str(tmp_path / "scene"))
    assert parser.points.shape == (1, 3)
    assert parser.point_indices["img0.png"].tolist() == [0]
