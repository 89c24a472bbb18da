"""Point-cloud accumulation pipeline (no TSDF).

Pipeline parity: reference azure-kinect-DK/Reconstruction/Reconstruction.py
(~= ReconstructionVisualization.py, Reconstruction-ResourceEfficient.py):
keyframe-interval frame-to-frame registration (FPFH+RANSAC bootstrap then
point-to-plane ICP :97-135), the global model grown by ``+=`` with periodic
re-downsampling (:137-176), and a Poisson mesh + color transfer on save
(:227-267; here: optional host Poisson via meshing.poisson, with
grid-normal-estimated cloud export always available).
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np

from azurekinect3dreconstruction_tpu.config import PipelineConfig
from azurekinect3dreconstruction_tpu.core.camera import Intrinsics, pixel_rays
from azurekinect3dreconstruction_tpu.core.types import PointCloudHost, RGBDFrame
from azurekinect3dreconstruction_tpu.core import se3
from azurekinect3dreconstruction_tpu.ops.backproject import backproject_depth
from azurekinect3dreconstruction_tpu.ops.neighbors import (
    estimate_normals_knn,
    voxel_downsample_arrays,
)
from azurekinect3dreconstruction_tpu.tracking.icp import TargetMaps, icp_point_to_plane
from azurekinect3dreconstruction_tpu.utils.telemetry import Telemetry, log_warning
from azurekinect3dreconstruction_tpu.viz.savers import ResultSaver


class CloudAccumulator:
    def __init__(self, intrinsics: Intrinsics, config: Optional[PipelineConfig] = None,
                 model_capacity: int = 262144, output_dir: str = "results"):
        self.intr = intrinsics
        self.cfg = config or PipelineConfig()
        self.rays = pixel_rays(intrinsics)
        self.capacity = model_capacity
        self.model_points = np.zeros((0, 3), np.float32)
        self.model_colors = np.zeros((0, 3), np.float32)
        self.T_world_cam = np.eye(4)
        self._cam_centers = [np.zeros(3)]  # trajectory, for normal orientation
        self.prev_maps: Optional[TargetMaps] = None
        self.telemetry = Telemetry()
        self.saver = ResultSaver(output_dir)
        self.frame_index = 0

    def process_frame(self, depth_raw, color_raw) -> None:
        cam = self.cfg.camera
        frame = RGBDFrame.from_raw(depth_raw, color_raw, cam.depth_scale,
                                   cam.depth_trunc, cam.depth_min)
        if self.frame_index % self.cfg.keyframe_interval != 0:
            self.frame_index += 1
            return
        pts = backproject_depth(frame.depth, self.rays)
        flat = pts[::4, ::4].reshape(-1, 3)
        mask = flat[:, 2] > 0
        if self.prev_maps is not None:
            res = icp_point_to_plane(flat, mask, self.prev_maps, self.intr,
                                     cfg=self.cfg.registration)
            if float(res.fitness) >= self.cfg.registration.min_fitness_icp:
                self.T_world_cam = self.T_world_cam @ np.linalg.inv(
                    np.asarray(res.T, np.float64))
            else:
                log_warning("frame registration rejected; pose kept")
                self.telemetry.count("reg_fail")
        self.prev_maps = TargetMaps.from_depth(frame.depth, self.intr,
                                               rays=self.rays)
        # grow the model: += world-frame points, periodic re-downsample
        w = np.asarray(se3.transform_points(
            jnp.asarray(self.T_world_cam, jnp.float32), flat))
        self._cam_centers.append(self.T_world_cam[:3, 3].copy())
        c = np.asarray(frame.color[::4, ::4].reshape(-1, 3))
        m = np.asarray(mask)
        self.model_points = np.concatenate([self.model_points, w[m]])
        self.model_colors = np.concatenate([self.model_colors, c[m]])
        if self.model_points.shape[0] > self.capacity:
            self._redownsample()
        self.frame_index += 1
        self.telemetry.tick_frame()
        self.telemetry.maybe_report(extra=f"model {len(self.model_points)} pts")

    def _redownsample(self) -> None:
        n = self.model_points.shape[0]
        dp, dm, dc, _ = voxel_downsample_arrays(
            jnp.asarray(self.model_points), jnp.ones((n,), bool),
            self.cfg.voxel_downsample, self.capacity,
            colors=jnp.asarray(self.model_colors))
        m = np.asarray(dm)
        self.model_points = np.asarray(dp)[m]
        self.model_colors = np.asarray(dc)[m]

    def save_model(self, poisson: bool = False) -> dict:
        n = self.model_points.shape[0]
        normals = None
        if n:
            from azurekinect3dreconstruction_tpu.ops.neighbors import (
                auto_capacity,
            )
            from azurekinect3dreconstruction_tpu.ops.normals import (
                orient_normals_consistent,
            )

            mask = jnp.ones((n,), bool)
            nr = estimate_normals_knn(
                jnp.asarray(self.model_points), mask,
                radius=3 * self.cfg.voxel_downsample, k=16,
                capacity=auto_capacity(n))
            # orient each point toward the NEAREST trajectory viewpoint —
            # a multi-view model has no single valid orientation center
            # (orienting toward only the last camera flips everything it
            # did not see), then the consistent-tangent-plane pass repairs
            # residual flips (Reconstruction-ResourceEfficient.py:169)
            nr = np.asarray(nr)
            centers = np.asarray(self._cam_centers, np.float32)
            if len(centers) > 256:  # bound the P x C distance matrix
                centers = centers[:: len(centers) // 256 + 1]
            # |p - c|^2 via the matmul form (the (P, C, 3) broadcast would
            # allocate ~3x the already-large (P, C) matrix)
            d2 = ((centers ** 2).sum(1)[None, :]
                  - 2.0 * self.model_points @ centers.T)
            nearest = centers[np.argmin(d2, axis=1)]
            flip = np.einsum("ij,ij->i", nr, nearest - self.model_points) < 0
            nr = np.where(flip[:, None], -nr, nr).astype(np.float32)
            nr = orient_normals_consistent(
                jnp.asarray(self.model_points), jnp.asarray(nr), mask,
                radius=3 * self.cfg.voxel_downsample)
            normals = np.asarray(nr)
        cloud = PointCloudHost(points=self.model_points, colors=self.model_colors,
                               normals=normals)
        paths = {"pointcloud": self.saver.save_point_cloud(cloud, kind="model")}
        if poisson:
            from azurekinect3dreconstruction_tpu.meshing.poisson import (
                poisson_mesh_from_cloud,
            )
            from azurekinect3dreconstruction_tpu.meshing.sampling import (
                transfer_colors,
            )

            mesh = poisson_mesh_from_cloud(cloud)
            if mesh is not None:
                if mesh.vertex_colors is None:
                    # reference save_model paints the Poisson mesh from the
                    # model cloud (Reconstruction.py:227-267)
                    mesh = transfer_colors(mesh, cloud,
                                           radius=self.cfg.voxel_downsample)
                paths["mesh"] = self.saver.save_mesh(mesh, kind="poisson_mesh")
        return paths
