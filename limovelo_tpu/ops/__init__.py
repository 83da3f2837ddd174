from .planes import PlaneFit, fit_planes, point_plane_distance
from .voxel import Downsampled, voxel_downsample

__all__ = [
    "PlaneFit",
    "fit_planes",
    "point_plane_distance",
    "Downsampled",
    "voxel_downsample",
]
