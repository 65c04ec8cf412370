"""tools/compress_dataset.py: quantized copy loads identically.

The compressed output must ride the same BlenderDataset fallback chain
(dataset/blender.py:84-94) and reproduce every buffer within f16
quantization error (reference analog: scripts/compress_renders.sh +
README.md:182-184 data-quantization note).
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(__file__))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
from make_synth_dataset import make_dataset


def test_compress_roundtrip(tmp_path):
    src = make_dataset(str(tmp_path / "src"), size=16, n_train=2, n_test=1,
                       n_points=32)
    import compress_dataset

    dst = str(tmp_path / "dst")
    n = compress_dataset.compress_scene(src, dst)
    # the synth dataset stores depth as float TIFF -> quantized count = frames
    assert n == 3

    from editable_gaussian_reflections_tpu.dataset.blender import BlenderDataset

    a = BlenderDataset(src, "train", resolution=16)
    b = BlenderDataset(dst, "train", resolution=16)
    assert len(a) == len(b)
    ia, ib = a[0], b[0]
    for k in ("image", "diffuse_image", "depth_image", "normal_image",
              "roughness_image", "f0_image"):
        va, vb = np.asarray(getattr(ia, k)), np.asarray(getattr(ib, k))
        assert va.shape == vb.shape, k
        np.testing.assert_allclose(va, vb, rtol=1e-3, atol=1e-3)
