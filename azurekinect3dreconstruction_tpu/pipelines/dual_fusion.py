"""Two-camera fusion with one-shot extrinsic auto-calibration.

Pipeline parity: reference BetterVisualizer2CamWorksROTATEsave2.py
(== CreateMesh.py) and the whole BetterVisualizer2Cam* family: per-camera
capture threads feed latest-wins frames (io.streams here), the first good
frame pair auto-calibrates camera-1's extrinsic by FPFH+RANSAC with an ICP
refinement on recalibration ('R' key) (:221-284, :609-665, overlap gate
>= 0.2 at :640), clouds merge + voxel-downsample for display (:766-829),
depth-gradient color modes (:685-721), and 'S' saves PLY + meshes (:414-462).

TPU-first differences: both frames' geometry math is batched device work; the
merged cloud is produced by fixed-capacity voxel downsampling; meshing on
save uses the TSDF+marching-cubes path (what the reference's "works"
pipelines actually render) with host Poisson as an optional export
(meshing.poisson, gated on Open3D).
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from azurekinect3dreconstruction_tpu.config import PipelineConfig
from azurekinect3dreconstruction_tpu.core.camera import Intrinsics, pixel_rays
from azurekinect3dreconstruction_tpu.core.types import PointCloudHost, RGBDFrame
from azurekinect3dreconstruction_tpu.core import se3
from azurekinect3dreconstruction_tpu.ops.backproject import backproject_depth
from azurekinect3dreconstruction_tpu.ops.image import depth_gradient_colors
from azurekinect3dreconstruction_tpu.ops.neighbors import (
    estimate_normals_knn,
    remove_statistical_outliers,
    voxel_downsample_arrays,
)
from azurekinect3dreconstruction_tpu.tracking.features import compute_fpfh
from azurekinect3dreconstruction_tpu.tracking.icp import (
    TargetMaps,
    evaluate_registration,
    icp_point_to_plane,
)
from azurekinect3dreconstruction_tpu.tracking.ransac import global_registration
from azurekinect3dreconstruction_tpu.tsdf import marching_cubes as mc
from azurekinect3dreconstruction_tpu.tsdf import volume as tsdf
from azurekinect3dreconstruction_tpu.utils.telemetry import Telemetry, log_info, log_warning
from azurekinect3dreconstruction_tpu.viz.savers import ResultSaver


class DualCameraFusion:
    """Feed synchronized (depth_u16, color_u8) pairs from two cameras."""

    COLOR_MODES = ("rgb", "depth_gradient", "uniform")

    def __init__(self, intrinsics: Tuple[Intrinsics, Intrinsics],
                 config: Optional[PipelineConfig] = None,
                 backend: str = "auto", output_dir: str = "results",
                 sharded: bool = False):
        self.intr = list(intrinsics)
        self.cfg = config or PipelineConfig()
        self.backend = backend
        self.rays = [pixel_rays(i) for i in self.intr]
        # camera 0 defines the world frame; extrinsics[i] = T_world_cam_i
        self.extrinsics = [np.eye(4), None]
        self.calibrated = False
        self.color_mode = "rgb"
        self.telemetry = Telemetry()
        self.saver = ResultSaver(output_dir)
        self._key = jax.random.PRNGKey(7)
        self.frame_index = 0
        self._last_frames: List[Optional[RGBDFrame]] = [None, None]

        # sharded execution mode (SURVEY.md §2.3's prescribed design):
        # camera-per-mesh-row, volume block-sharded over the remaining
        # devices; collectives ride ICI inside one jitted step
        self.sharded = False
        if sharded:
            from azurekinect3dreconstruction_tpu.parallel import sharded_volume as sv

            n_dev = len(jax.devices())
            if n_dev < 2:
                log_warning(f"sharded dual fusion needs >= 2 devices, "
                            f"have {n_dev}; falling back to single-device")
            elif self.intr[0] != self.intr[1]:
                log_warning("sharded dual fusion requires identical camera "
                            "intrinsics; falling back to single-device")
            else:
                self._sv = sv
                self.mesh = sv.make_mesh(2, n_dev // 2)
                self.volume = sv.create_sharded(self.cfg.tsdf, self.mesh)
                self._sharded_step = sv.make_sharded_step(
                    self.mesh, self.intr[0], self.cfg.tsdf, stride=2,
                    backend=self.backend)
                self.sharded = True
                log_info(f"sharded dual fusion: mesh cam=2 x blk={n_dev // 2}")
        if not self.sharded:
            self.volume = tsdf.create(self.cfg.tsdf)

    # -- calibration (reference calibrate_cameras :609-665) -------------------
    def calibrate(self, frames: Tuple[RGBDFrame, RGBDFrame],
                  refine_only: bool = False) -> bool:
        reg = self.cfg.registration
        clouds = []
        for i, f in enumerate(frames):
            pts = backproject_depth(f.depth, self.rays[i])[::4, ::4].reshape(-1, 3)
            mask = pts[:, 2] > 0
            ds, dm, _, _ = voxel_downsample_arrays(pts, mask, 0.02, 8192)
            dm = remove_statistical_outliers(ds, dm, k=12, radius=0.06)
            clouds.append((ds, dm))
        (p0, m0), (p1, m1) = clouds

        if refine_only and self.extrinsics[1] is not None:
            # 'R'-key recalibration: ICP seeded by the current extrinsic
            # (reference :258-262)
            tgt = TargetMaps.from_depth(frames[0].depth, self.intr[0],
                                        rays=self.rays[0])
            init = np.linalg.inv(self.extrinsics[0]) @ self.extrinsics[1]
            res = icp_point_to_plane(p1, m1, tgt, self.intr[0],
                                     init=jnp.asarray(init, jnp.float32), cfg=reg)
            T01 = np.asarray(res.T, np.float64)
            fit = float(res.fitness)
        else:
            n0 = estimate_normals_knn(p0, m0, radius=0.04, k=12, orient_to=np.zeros(3))
            n1 = estimate_normals_knn(p1, m1, radius=0.04, k=12, orient_to=np.zeros(3))
            f0 = compute_fpfh(p0, n0, m0, radius=0.06, k=16)
            f1 = compute_fpfh(p1, n1, m1, radius=0.06, k=16)
            self._key, sub = jax.random.split(self._key)
            g = global_registration(p1, f1, m1, p0, f0, m0, sub, reg)
            # refine with projective ICP against camera 0's maps
            tgt = TargetMaps.from_depth(frames[0].depth, self.intr[0],
                                        rays=self.rays[0])
            res = icp_point_to_plane(p1, m1, tgt, self.intr[0], init=g.T, cfg=reg)
            T01 = np.asarray(res.T, np.float64)
            fit, _ = evaluate_registration(p1, m1, p0, m0,
                                           jnp.asarray(T01, jnp.float32),
                                           dist_thr=0.03)
            fit = float(fit)

        if fit < reg.min_overlap_extrinsic or not se3.is_valid_transform(T01):
            log_warning(f"calibration rejected (overlap {fit:.2f})")
            self.telemetry.count("calib_reject")
            return False
        # reject the reference's trace==4 identity degenerate case
        if abs(np.trace(T01) - 4.0) < 1e-6:
            log_warning("calibration returned identity; rejected")
            return False
        self.extrinsics[1] = self.extrinsics[0] @ T01
        self.calibrated = True
        r, p_, y = se3.rpy_from_matrix(T01[:3, :3])
        log_info(
            f"calibrated: overlap {fit:.2f}, t = {T01[:3, 3]}, "
            f"rpy = ({np.degrees(r):.1f}, {np.degrees(p_):.1f}, {np.degrees(y):.1f}) deg"
        )
        self.telemetry.count("calib_ok")
        return True

    def recalibrate(self) -> bool:
        """'R' key: ICP refinement from the current extrinsic."""
        if None in self._last_frames:
            return False
        return self.calibrate(tuple(self._last_frames), refine_only=True)

    # -- streaming -------------------------------------------------------------
    def process_frames(self, pair) -> None:
        """pair: ((depth0, color0), (depth1, color1)) raw arrays."""
        cam = self.cfg.camera
        frames = [
            RGBDFrame.from_raw(d, c, cam.depth_scale, cam.depth_trunc, cam.depth_min)
            for d, c in pair
        ]
        self._last_frames = frames
        if not self.calibrated:
            self.calibrate(tuple(frames))
        poses = [self.extrinsics[0],
                 self.extrinsics[1] if self.calibrated else None]
        if self.sharded:
            # one collective step fuses both cameras; until calibrated,
            # camera 1 contributes nothing (zeroed depth = no valid pixels)
            d1 = frames[1].depth if poses[1] is not None else jnp.zeros_like(
                frames[1].depth)
            p1 = poses[1] if poses[1] is not None else np.eye(4)
            self.volume = self._sharded_step(
                self.volume,
                jnp.stack([frames[0].depth, d1]),
                jnp.stack([frames[0].color, frames[1].color]),
                jnp.stack([jnp.asarray(poses[0], jnp.float32),
                           jnp.asarray(p1, jnp.float32)]),
                self.rays[0])
        else:
            for i, f in enumerate(frames):
                if poses[i] is None:
                    continue
                self.volume = tsdf.integrate_frame(
                    self.volume, f.depth, f.color, self.rays[i],
                    jnp.asarray(poses[i], jnp.float32), self.intr[i],
                    self.cfg.tsdf, backend=self.backend,
                )
        self.frame_index += 1
        self.telemetry.tick_frame()
        self.telemetry.maybe_report(
            extra=f"calibrated {self.calibrated} mode {self.color_mode}")

    def merged_cloud(self, max_points: int = 200000) -> PointCloudHost:
        """Merged + downsampled display cloud with the active color mode
        (reference update_visualization :723-833 + apply_depth_colors)."""
        pts_all, col_all, msk_all = [], [], []
        for i, f in enumerate(self._last_frames):
            pose = self.extrinsics[i]
            if f is None or pose is None:
                continue
            pts = backproject_depth(f.depth, self.rays[i])
            if self.color_mode == "depth_gradient":
                cols = depth_gradient_colors(f.depth, far=self.cfg.camera.depth_trunc)
            elif self.color_mode == "uniform":
                base = np.array([[0.9, 0.4, 0.2], [0.2, 0.5, 0.9]][i % 2], np.float32)
                cols = jnp.broadcast_to(base, pts.shape)
            else:
                cols = f.color
            flat = pts.reshape(-1, 3)
            w = se3.transform_points(jnp.asarray(pose, jnp.float32), flat)
            pts_all.append(w)
            col_all.append(cols.reshape(-1, 3))
            # validity from CAMERA-frame depth, before the transform —
            # invalid pixels backproject to the camera center in world
            # coordinates, which is far from the origin for camera 1
            msk_all.append(flat[:, 2] > 0)
        if not pts_all:
            return PointCloudHost(points=np.zeros((0, 3), np.float32))
        allp = jnp.concatenate(pts_all)
        allc = jnp.concatenate(col_all)
        mask = jnp.concatenate(msk_all)
        dp, dm, dc, _ = voxel_downsample_arrays(
            allp, mask, self.cfg.voxel_downsample, max_points, colors=allc)
        m = np.asarray(dm)
        return PointCloudHost(points=np.asarray(dp)[m], colors=np.asarray(dc)[m])

    def cycle_color_mode(self) -> str:
        i = self.COLOR_MODES.index(self.color_mode)
        self.color_mode = self.COLOR_MODES[(i + 1) % len(self.COLOR_MODES)]
        return self.color_mode

    def extraction_volume(self):
        """The volume extraction should run on: in sharded mode, the shard
        pools combined so boundary cells see their cross-shard neighbors
        (seam-free — parallel.sharded_volume.combine_shards)."""
        if self.sharded:
            return self._sv.combine_shards(self.volume, self.cfg.tsdf,
                                           self.mesh.shape["blk"])
        return self.volume

    # -- save ('S' key; reference save_current_state :414-462) -----------------
    def save_current_state(self, poisson: bool = False) -> dict:
        paths = {}
        cloud = self.merged_cloud()
        if len(cloud):
            paths["pointcloud"] = self.saver.save_point_cloud(cloud, kind="merged")
        mesh = mc.extract_mesh(self.extraction_volume(), self.cfg.tsdf).compact()
        mesh = mc.weld_vertices(mesh)
        mesh.compute_vertex_normals()
        paths["mesh"] = self.saver.save_mesh(mesh, kind="mesh", obj=True)
        paths["preview"] = self.saver.save_preview(mesh)
        if poisson:
            from azurekinect3dreconstruction_tpu.meshing.poisson import (
                poisson_mesh_from_cloud,
            )

            pmesh = poisson_mesh_from_cloud(cloud)
            if pmesh is not None:
                paths["poisson"] = self.saver.save_mesh(pmesh, kind="poisson_mesh",
                                                        obj=True)
        log_info(f"saved: {paths}")
        return paths
