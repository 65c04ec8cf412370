"""ColmapParser - twin of reference dataset/colmap_parser.py:6-43.

The reference wraps pycolmap's SceneManager; here the pure-python readers in
colmap_loader provide the same surface: points3D + per-image visible point
indices.
"""

from __future__ import annotations

import os

import numpy as np

from .colmap_loader import read_model


class ColmapParser:
    def __init__(self, data_dir: str, sparse_subdir: str = "sparse/0"):
        sparse = os.path.join(data_dir, sparse_subdir)
        if not os.path.isdir(sparse):
            sparse = os.path.join(data_dir, "sparse")
        assert os.path.exists(sparse), f"COLMAP directory {sparse} does not exist."
        self.cameras, self.images, pts = read_model(sparse)
        xyz, rgb, err, ids = pts
        self.points = xyz.astype(np.float32)
        self.points_rgb = rgb.astype(np.float32)
        self.points_err = err.astype(np.float32)
        self._pid_to_idx = {int(pid): i for i, pid in enumerate(ids)}

        # {image_name -> [point_idx]} like the reference's pycolmap wrapper
        point_indices = {}
        for img in self.images.values():
            idxs = [self._pid_to_idx[int(pid)] for pid in img.point3D_ids
                    if int(pid) >= 0 and int(pid) in self._pid_to_idx]
            point_indices[img.name] = np.asarray(idxs, np.int32)
        self.point_indices = point_indices

    def image_by_name(self, name: str):
        for img in self.images.values():
            if img.name == name:
                return img
        return None

    def visible_point_indices(self, image) -> np.ndarray:
        """Indices into self.points of the 3D points observed by `image`."""
        valid = image.point3D_ids >= 0
        return np.array(
            [self._pid_to_idx[int(pid)] for pid in image.point3D_ids[valid]
             if int(pid) in self._pid_to_idx],
            np.int64,
        )
