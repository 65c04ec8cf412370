from .raytracer import (
    CameraParams,
    RenderSettings,
    StepOutputs,
    RayTargets,
    render_accumulated,
    render_frame,
    render_tile,
    render_tile_with_grads,
)
from .render import camera_params, render

__all__ = [
    "CameraParams", "RenderSettings", "StepOutputs", "RayTargets",
    "render_accumulated", "render_frame", "render_tile",
    "render_tile_with_grads", "camera_params", "render",
]
