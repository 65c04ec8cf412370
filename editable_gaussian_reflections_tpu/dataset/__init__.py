"""Dataset package - mirrors reference dataset/__init__.py exports."""

from .blender import BlenderDataset
from .blender_prior import BlenderPriorDataset
from .camera_info import CameraInfo
from .colmap_prior import ColmapPriorDataset

__all__ = [
    "BlenderDataset",
    "BlenderPriorDataset",
    "ColmapPriorDataset",
    "CameraInfo",
]
