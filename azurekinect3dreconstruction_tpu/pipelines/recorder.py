"""Colored-ICP recording reconstructor (single camera).

Pipeline parity: reference CodeThatWorks/GoodColorReconstruction.py (and its
clones Initial*Reconstruction-CUDA*): keyframe-interval colored-ICP
frame-to-frame tracking seeded by motion prediction (:220-262, prediction
:238-244), fallback to FPFH+RANSAC global registration + point-to-plane ICP
on low fitness (:161-204), EVERY frame integrated into the TSDF (:264-272),
trajectory recorded, model saved as mesh + volume point cloud + trajectory
(:528-566). Acceptance gates: colored-ICP fitness >= 0.6, ICP >= 0.5,
global >= 0.3 (:183,200,256).

Recording toggles on/off like the reference's 'R' key (:411).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from azurekinect3dreconstruction_tpu.config import PipelineConfig
from azurekinect3dreconstruction_tpu.core.camera import Intrinsics, pixel_rays
from azurekinect3dreconstruction_tpu.core.types import RGBDFrame, PointCloudHost
from azurekinect3dreconstruction_tpu.core import se3
from azurekinect3dreconstruction_tpu.ops.backproject import backproject_depth
from azurekinect3dreconstruction_tpu.ops.neighbors import (
    estimate_normals_knn,
    voxel_downsample_arrays,
)
from azurekinect3dreconstruction_tpu.tracking.features import compute_fpfh
from azurekinect3dreconstruction_tpu.tracking.icp import TargetMaps, colored_icp, icp_point_to_plane
from azurekinect3dreconstruction_tpu.tracking.motion import MotionModel
from azurekinect3dreconstruction_tpu.tracking.ransac import global_registration
from azurekinect3dreconstruction_tpu.tsdf import marching_cubes as mc
from azurekinect3dreconstruction_tpu.tsdf import volume as tsdf
from azurekinect3dreconstruction_tpu.utils.telemetry import Telemetry, log_info, log_warning
from azurekinect3dreconstruction_tpu.viz.savers import ResultSaver


class Recorder:
    def __init__(self, intrinsics: Intrinsics, config: Optional[PipelineConfig] = None,
                 backend: str = "auto", output_dir: str = "results"):
        self.intr = intrinsics
        self.cfg = config or PipelineConfig()
        self.backend = backend
        self.rays = pixel_rays(intrinsics)
        self.volume = tsdf.create(self.cfg.tsdf)
        self.T_world_cam = np.eye(4)
        self.trajectory = [np.eye(4)]
        self.motion = MotionModel()
        self.prev: Optional[RGBDFrame] = None
        self.prev_maps: Optional[TargetMaps] = None
        self.is_recording = False
        self.telemetry = Telemetry()
        self.saver = ResultSaver(output_dir)
        self.frame_index = 0
        self._key = jax.random.PRNGKey(0)

    def toggle_recording(self) -> bool:
        self.is_recording = not self.is_recording
        log_info(("started" if self.is_recording else "stopped") + " recording")
        return self.is_recording

    # -- registration ladder -------------------------------------------------
    def _register(self, frame: RGBDFrame) -> Optional[np.ndarray]:
        """Estimate T (curr-cam -> prev-cam) with the reference's fallback
        ladder. Returns None if everything failed."""
        reg = self.cfg.registration
        # source: current frame's (downsampled) cloud; target: prev frame maps
        pts = backproject_depth(frame.depth, self.rays)
        stride = 4
        src = pts[::stride, ::stride].reshape(-1, 3)
        s_int = frame.intensity[::stride, ::stride].reshape(-1)
        s_mask = src[:, 2] > 0

        # seed with the motion prediction (T maps curr -> prev coords)
        T_pred = np.linalg.inv(self.motion.predict_relative())
        res = colored_icp(src, s_int, s_mask, self.prev_maps, self.intr,
                          init=jnp.asarray(T_pred, jnp.float32), cfg=reg)
        if float(res.fitness) >= reg.min_fitness_colored and se3.is_valid_transform(
            np.asarray(res.T)
        ):
            self.telemetry.count("colored_icp_ok")
            return np.asarray(res.T, np.float64)

        # fallback: FPFH + RANSAC global registration, then point-to-plane ICP
        self.telemetry.count("colored_icp_reject")
        ds, dm, _, _ = voxel_downsample_arrays(src, s_mask, 0.02, 8192)
        tgt_pts = self.prev_maps.points.reshape(-1, 3)[:: stride * stride]
        tm = tgt_pts[:, 2] > 0
        dt, dtm, _, _ = voxel_downsample_arrays(tgt_pts, tm, 0.02, 8192)
        n_s = estimate_normals_knn(ds, dm, radius=0.04, k=12, orient_to=np.zeros(3))
        n_t = estimate_normals_knn(dt, dtm, radius=0.04, k=12, orient_to=np.zeros(3))
        f_s = compute_fpfh(ds, n_s, dm, radius=0.06, k=16)
        f_t = compute_fpfh(dt, n_t, dtm, radius=0.06, k=16)
        self._key, sub = jax.random.split(self._key)
        g = global_registration(ds, f_s, dm, dt, f_t, dtm, sub, reg)
        if float(g.fitness) < reg.min_fitness_global:
            self.telemetry.count("global_reject")
            return None
        res2 = icp_point_to_plane(src, s_mask, self.prev_maps, self.intr,
                                  init=g.T, cfg=reg)
        if float(res2.fitness) >= reg.min_fitness_icp and se3.is_valid_transform(
            np.asarray(res2.T)
        ):
            self.telemetry.count("fallback_icp_ok")
            return np.asarray(res2.T, np.float64)
        self.telemetry.count("fallback_reject")
        return None

    def process_frame(self, depth_raw, color_raw) -> np.ndarray:
        cam = self.cfg.camera
        frame = RGBDFrame.from_raw(depth_raw, color_raw, cam.depth_scale,
                                   cam.depth_trunc, cam.depth_min)
        if self.is_recording:
            if self.prev is not None and (
                self.frame_index % self.cfg.keyframe_interval == 0
            ):
                with self.telemetry.time_block("registration"):
                    T_cp = self._register(frame)  # curr -> prev camera coords
                if T_cp is not None:
                    self.T_world_cam = self.T_world_cam @ T_cp
                    self.motion.update(self.T_world_cam)
                else:
                    log_warning("registration failed; keeping previous pose")
            with self.telemetry.time_block("integrate"):
                self.volume = tsdf.integrate_frame(
                    self.volume, frame.depth, frame.color, self.rays,
                    jnp.asarray(self.T_world_cam, jnp.float32), self.intr,
                    self.cfg.tsdf, backend=self.backend,
                )
            self.trajectory.append(self.T_world_cam.copy())
        # keep prev frame + target maps for the next registration
        if self.prev is None or self.frame_index % self.cfg.keyframe_interval == 0:
            self.prev = frame
            self.prev_maps = TargetMaps.from_depth(frame.depth, self.intr,
                                                   intensity=frame.intensity,
                                                   rays=self.rays)
        self.frame_index += 1
        self.telemetry.tick_frame()
        self.telemetry.maybe_report(
            extra=f"mode {'REC' if self.is_recording else 'view'}")
        return self.T_world_cam

    # -- persistence (reference save_model :528-566) --------------------------
    def save_model(self, weld: bool = True) -> dict:
        mesh = mc.extract_mesh(self.volume, self.cfg.tsdf).compact()
        if weld:
            mesh = mc.weld_vertices(mesh)
        mesh.compute_vertex_normals()
        paths = {"mesh": self.saver.save_mesh(mesh, kind="mesh")}
        pts, cols = tsdf.extract_point_cloud(self.volume, self.cfg.tsdf)
        paths["pointcloud"] = self.saver.save_point_cloud(
            PointCloudHost(points=pts, colors=cols), kind="volume_pcd")
        paths["trajectory"] = self.saver.save_trajectory(self.trajectory)
        log_info(f"saved model: {paths}")
        return paths
