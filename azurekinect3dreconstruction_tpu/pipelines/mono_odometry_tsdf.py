"""Single-camera streaming odometry + TSDF pipeline.

Pipeline parity: reference CodeThatWorks/1camera-detectsSceneChanges.py
(== BetterVisualizerD2PC_Mesh.py): per-frame hybrid RGB-D odometry gives the
camera motion ("scene change" detection), frames fuse into a scalable TSDF,
the surface re-extracts every N frames, and 'C' resets the volume
(:202-212). The odometry-failure -> identity-motion fallback (:258-260) is
preserved.

The TPU design runs odometry + allocate + integrate as jitted device work per
frame; extraction happens on the caller's cadence (``vis_update_interval``,
reference GoodColorReconstruction.py:84 uses 5 — the reference's own mono
streamer extracts EVERY frame, its main slowness).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from azurekinect3dreconstruction_tpu.config import PipelineConfig
from azurekinect3dreconstruction_tpu.core.camera import Intrinsics, pixel_rays
from azurekinect3dreconstruction_tpu.core.types import RGBDFrame
from azurekinect3dreconstruction_tpu.tracking.odometry import compute_odometry
from azurekinect3dreconstruction_tpu.tsdf import marching_cubes as mc
from azurekinect3dreconstruction_tpu.tsdf import volume as tsdf
from azurekinect3dreconstruction_tpu.utils.telemetry import Telemetry, log_warning


class MonoOdometryTSDF:
    """Feed raw (depth_u16, color_u8) frames; poses accumulate from odometry."""

    def __init__(self, intrinsics: Intrinsics, config: Optional[PipelineConfig] = None,
                 backend: str = "auto"):
        self.intr = intrinsics
        self.cfg = config or PipelineConfig()
        self.backend = backend
        self.rays = pixel_rays(intrinsics)
        self.volume = tsdf.create(self.cfg.tsdf)
        self.T_world_cam = np.eye(4)
        self.trajectory = [np.eye(4)]
        self.prev: Optional[RGBDFrame] = None
        self.telemetry = Telemetry()
        self.odometry_failures = 0
        self.frame_index = 0

    def reset(self) -> None:
        """The reference's 'C'-key volume reset (scene change)."""
        self.volume = tsdf.reset(self.cfg.tsdf)
        self.T_world_cam = np.eye(4)
        self.trajectory = [np.eye(4)]
        self.prev = None
        self.frame_index = 0

    def process_frame(self, depth_raw, color_raw) -> np.ndarray:
        """Track + fuse one frame; returns the camera-to-world pose used."""
        cam = self.cfg.camera
        frame = RGBDFrame.from_raw(depth_raw, color_raw, cam.depth_scale,
                                   cam.depth_trunc, cam.depth_min)
        if self.prev is not None:
            with self.telemetry.time_block("odometry"):
                res = compute_odometry(
                    self.prev.intensity, self.prev.depth,
                    frame.intensity, frame.depth,
                    self.intr, self.cfg.odometry,
                )
                fitness = float(res.fitness)
            if fitness > 0.3 and np.isfinite(np.asarray(res.T_target_source)).all():
                # odometry gives T_curr_prev (prev-camera points in curr frame);
                # camera motion in world: T_w_curr = T_w_prev @ T_prev_curr
                T_rel = np.linalg.inv(np.asarray(res.T_target_source, np.float64))
                self.T_world_cam = self.T_world_cam @ T_rel
                self.telemetry.count("odo_ok")
            else:
                # identity-motion fallback (reference :258-260)
                self.odometry_failures += 1
                self.telemetry.count("odo_fail")
                log_warning(f"odometry failed (fitness {fitness:.2f}); keeping pose")

        with self.telemetry.time_block("integrate"):
            self.volume = tsdf.integrate_frame(
                self.volume, frame.depth, frame.color, self.rays,
                jnp.asarray(self.T_world_cam, jnp.float32), self.intr,
                self.cfg.tsdf, backend=self.backend,
            )
        self.prev = frame
        self.trajectory.append(self.T_world_cam.copy())
        self.frame_index += 1
        self.telemetry.tick_frame()
        self.telemetry.maybe_report()
        return self.T_world_cam

    def extract_mesh(self, **kw):
        with self.telemetry.time_block("extract"):
            return mc.extract_mesh(self.volume, self.cfg.tsdf, **kw)

    def extract_point_cloud(self, **kw):
        return tsdf.extract_point_cloud(self.volume, self.cfg.tsdf, **kw)
