from azurekinect3dreconstruction_tpu.io.replay import (
    FrameRecorder,
    FrameSource,
    NpzReplaySource,
    SyntheticSource,
)
from azurekinect3dreconstruction_tpu.io.streams import (
    CaptureThread,
    DeviceFeeder,
    MultiCameraRig,
)
from azurekinect3dreconstruction_tpu.io.synthetic import (
    Plane,
    Scene,
    Sphere,
    SyntheticCamera,
    orbit_trajectory,
)

__all__ = [
    "CaptureThread",
    "DeviceFeeder",
    "FrameRecorder",
    "MultiCameraRig",
    "FrameSource",
    "NpzReplaySource",
    "Plane",
    "Scene",
    "Sphere",
    "SyntheticCamera",
    "SyntheticSource",
    "orbit_trajectory",
]
