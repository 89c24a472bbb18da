from azurekinect3dreconstruction_tpu.core.camera import (
    CameraCalibration,
    Distortion,
    Intrinsics,
    pixel_rays,
)
from azurekinect3dreconstruction_tpu.core.types import (
    PointCloud,
    PointCloudHost,
    RGBDFrame,
    TriangleMesh,
    TriangleMeshHost,
)
from azurekinect3dreconstruction_tpu.core import se3

__all__ = [
    "CameraCalibration",
    "Distortion",
    "Intrinsics",
    "PointCloud",
    "PointCloudHost",
    "RGBDFrame",
    "TriangleMesh",
    "TriangleMeshHost",
    "pixel_rays",
    "se3",
]
