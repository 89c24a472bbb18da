"""azurekinect3dreconstruction_tpu — a TPU-native RGB-D 3D reconstruction framework.

A ground-up JAX/XLA/Pallas re-design of the capabilities of the
mishn-0/AzureKinect3DReconstruction reference stack (pyk4a + Open3D + OpenCV):

- k4a camera models (intrinsics, Brown–Conrady distortion, depth→color registration)
- depth→point-cloud backprojection, voxel downsampling, normal estimation
- hybrid photometric+geometric RGB-D odometry (Gauss–Newton, image pyramids)
- point-to-plane / colored ICP with projective data association
- FPFH features + massively-parallel RANSAC global registration
- block-hashed scalable TSDF volume resident in HBM, fused integrate kernels
- marching-cubes mesh extraction with generated (not hand-typed) case tables
- pose-graph optimization with loop closure (offline "BundleFusion-style" mode)
- two-camera extrinsic auto-calibration and fusion
- npz/framelog record & replay, PLY/OBJ persistence, optional Open3D viewers

The public API mirrors the reference's de-facto layer map (SURVEY.md §1) but is
organized as a real package. Heavy math runs on TPU via jnp/XLA with Pallas
kernels for hot paths; host-side runtime (IO, ring buffers, mesh serialization)
has native C++ implementations with pure-Python fallbacks.
"""

__version__ = "0.1.0"

from azurekinect3dreconstruction_tpu.config import (
    CameraConfig,
    OdometryConfig,
    PipelineConfig,
    RegistrationConfig,
    TSDFConfig,
)

__all__ = [
    "CameraConfig",
    "OdometryConfig",
    "PipelineConfig",
    "RegistrationConfig",
    "TSDFConfig",
    "__version__",
]
