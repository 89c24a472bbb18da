"""Reconstruction pipelines — the framework's "model families".

Each mirrors one reference entry-point family (SURVEY.md §2.1):

- :class:`MonoOdometryTSDF` — 1camera-detectsSceneChanges.py (odometry+TSDF
  streamer with scene-change reset)
- :class:`Recorder` — GoodColorReconstruction.py (colored-ICP recording
  reconstructor with fallback registration ladder)
- :class:`DualCameraFusion` — CreateMesh.py / BetterVisualizer2Cam* family
  (two-camera auto-calibrated fusion)
- :class:`OfflineBundle` — bundlefusion_reconstruction.py (pose graph + loop
  closure + reintegration; frame log as checkpoint)
- :class:`FragmentPipeline` — 3Dreconstruction.py (staged fragment system)
- :class:`CloudAccumulator` — Reconstruction.py (global-cloud growth, no TSDF)
"""

from azurekinect3dreconstruction_tpu.pipelines.cloud_accumulator import CloudAccumulator
from azurekinect3dreconstruction_tpu.pipelines.dual_fusion import DualCameraFusion
from azurekinect3dreconstruction_tpu.pipelines.fragments import FragmentPipeline
from azurekinect3dreconstruction_tpu.pipelines.mono_odometry_tsdf import MonoOdometryTSDF
from azurekinect3dreconstruction_tpu.pipelines.offline_bundle import OfflineBundle
from azurekinect3dreconstruction_tpu.pipelines.recorder import Recorder

__all__ = [
    "CloudAccumulator",
    "DualCameraFusion",
    "FragmentPipeline",
    "MonoOdometryTSDF",
    "OfflineBundle",
    "Recorder",
]
