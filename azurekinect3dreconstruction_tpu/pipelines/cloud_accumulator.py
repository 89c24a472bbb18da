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

import jax
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
from azurekinect3dreconstruction_tpu.tracking.features import compute_fpfh
from azurekinect3dreconstruction_tpu.tracking.icp import (
    TargetMaps,
    evaluate_registration,
    icp_point_to_plane,
)
from azurekinect3dreconstruction_tpu.tracking.ransac import global_registration
from azurekinect3dreconstruction_tpu.utils.telemetry import Telemetry, log_warning
from azurekinect3dreconstruction_tpu.viz.savers import ResultSaver


class CloudAccumulator:
    def __init__(self, intrinsics: Intrinsics, config: Optional[PipelineConfig] = None,
                 model_capacity: int = 262144, output_dir: str = "results",
                 coarse: bool = True):
        """``coarse``: run the reference's FPFH + RANSAC bootstrap before
        the point-to-plane refinement (Reconstruction.py:100-135 runs the
        coarse stage on EVERY registration — it is what recovers tracking
        when consecutive keyframes are far apart). Here it is skipped when
        the un-seeded fine ICP already reports fitness >=
        ``coarse_skip_fitness`` (the seeded result is gated by that same
        fitness, so it cannot change the answer there). Disable entirely for
        dense smooth streams where projective ICP alone suffices."""
        self.intr = intrinsics
        self.cfg = config or PipelineConfig()
        self.rays = pixel_rays(intrinsics)
        self.capacity = model_capacity
        self.coarse = coarse
        self.model_points = np.zeros((0, 3), np.float32)
        self.model_colors = np.zeros((0, 3), np.float32)
        self.T_world_cam = np.eye(4)
        self._cam_centers = [np.zeros(3)]  # trajectory, for normal orientation
        self.prev_maps: Optional[TargetMaps] = None
        # un-seeded fine-ICP fitness at/above this skips the coarse stage:
        # when projective ICP already reports near-total overlap the seeded
        # result essentially never wins (it is gated by the same fine-ICP
        # fitness), so the FPFH+RANSAC cost would be pure waste. Set to 1.1
        # to force the reference's run-it-every-time behavior.
        self.coarse_skip_fitness = 0.8
        # (ds, dm, n_s, f_s) of the last frame's coarse source — byte-for-
        # byte the next frame's coarse TARGET features (prev_maps is the
        # same backprojected cloud), so they are cached instead of recomputed
        self._feat_cache = None
        self._feat_next = None
        self.telemetry = Telemetry()
        self.saver = ResultSaver(output_dir)
        self.frame_index = 0
        self._key = jax.random.PRNGKey(3)

    def _coarse_seed(self, src, s_mask) -> Optional[jnp.ndarray]:
        """FPFH + RANSAC seed for the ICP refinement, matching the
        reference's register_frames coarse stage (Reconstruction.py:100-135:
        downsample -> normals -> FPFH -> RANSAC with the global fitness
        gate). The gate uses the Open3D fitness SEMANTICS — overlap ratio of
        the aligned clouds via evaluate_registration — not the RANSAC
        correspondence-inlier share, which is pessimistic on smooth surfaces
        where most FPFH mutual matches are wrong even at the true pose.
        Returns T (curr -> prev camera coords) or None."""
        import dataclasses

        # recovery is the whole point of this stage: give RANSAC a full
        # hypothesis pool even when the config trims it for the ICP-heavy
        # paths (the reference budget is 4M sequential iterations,
        # Reconstruction.py:113)
        reg = dataclasses.replace(self.cfg.registration,
                                  ransac_hypotheses=max(
                                      8192, self.cfg.registration.ransac_hypotheses))
        vox = 0.015
        ds, dm, _, _ = voxel_downsample_arrays(src, s_mask, vox, 8192)
        n_s = estimate_normals_knn(ds, dm, radius=2 * vox, k=12,
                                   orient_to=np.zeros(3))
        f_s = compute_fpfh(ds, n_s, dm, radius=4 * vox, k=16)
        if self._feat_cache is not None:
            # last frame's source cloud IS this frame's target (prev_maps
            # backprojects the same depth) — reuse its features verbatim
            dt, dtm, n_t, f_t = self._feat_cache
        else:
            dt, dtm, n_t, f_t = self._target_features(vox)
        self._feat_next = (ds, dm, n_s, f_s)
        # multi-restart RANSAC (features reused, only the cheap hypothesis
        # scoring re-runs), candidates ranked by cloud-overlap fitness
        # (evaluate_registration = the reference's fitness semantics) — a
        # single draw is high-variance on smooth geometry where most FPFH
        # mutual matches are wrong
        best, best_fit = None, -1.0
        for _ in range(4):
            self._key, sub = jax.random.split(self._key)
            g = global_registration(ds, f_s, dm, dt, f_t, dtm, sub, reg,
                                    distance_threshold=0.04)
            T = np.asarray(g.T)
            if not (se3.is_valid_transform(T) and np.isfinite(T).all()):
                continue
            fit, _ = evaluate_registration(ds, dm, dt, dtm, g.T, dist_thr=0.05)
            if float(fit) > best_fit:
                best, best_fit = g.T, float(fit)
        if best is None:
            self.telemetry.count("coarse_reject")
        return best

    def _target_features(self, vox: float = 0.015):
        """Coarse-stage target features from ``prev_maps``: 1/16-density
        pixel subsample before the grid (identical 1.5 cm coverage —
        organized depth is far denser than the voxel grid — at 16x less
        downsample input), then normals + FPFH. Must mirror the SOURCE
        feature computation in ``_coarse_seed`` exactly: the feature cache
        hands last frame's source tuple over as this frame's target
        (``test_cloud_accumulator_feature_cache_is_exact`` pins the
        byte-identity)."""
        tgt = self.prev_maps.points[::4, ::4].reshape(-1, 3)
        dt, dtm, _, _ = voxel_downsample_arrays(tgt, tgt[:, 2] > 0, vox, 8192)
        n_t = estimate_normals_knn(dt, dtm, radius=2 * vox, k=12,
                                   orient_to=np.zeros(3))
        f_t = compute_fpfh(dt, n_t, dtm, radius=4 * vox, k=16)
        return dt, dtm, n_t, f_t

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
            reg = self.cfg.registration
            res = icp_point_to_plane(flat, mask, self.prev_maps, self.intr,
                                     cfg=reg)
            self._feat_next = None
            if self.coarse and float(res.fitness) < self.coarse_skip_fitness:
                # the reference's coarse stage: FPFH + RANSAC seed, refined
                # coarse-to-fine (a RANSAC seed can sit several cm off, so
                # the first ICP pass runs at 3x the correspondence radius).
                # The two results self-gate by fine-ICP fitness: smooth
                # motion keeps the un-seeded answer, far-apart keyframes —
                # where un-seeded projective ICP falls into the wrong
                # minimum with visibly lower overlap — take the seeded one.
                with self.telemetry.time_block("coarse"):
                    # the 1/16 subsample the fine ICP already uses is far
                    # denser than the 1.5 cm seed grid — full-res input only
                    # inflates the voxel-downsample cost 16x
                    seed = self._coarse_seed(flat, mask)
                if seed is not None:
                    import dataclasses

                    wide = dataclasses.replace(
                        reg,
                        icp_distance_threshold=3 * reg.icp_distance_threshold)
                    r1 = icp_point_to_plane(flat, mask, self.prev_maps,
                                            self.intr, init=seed, cfg=wide)
                    r2 = icp_point_to_plane(flat, mask, self.prev_maps,
                                            self.intr, init=r1.T, cfg=reg)
                    if float(r2.fitness) > float(res.fitness):
                        self.telemetry.count("coarse_won")
                        res = r2
            if float(res.fitness) >= self.cfg.registration.min_fitness_icp:
                # res.T maps CURR-frame points into the PREV frame
                # (= T_prev_curr), so the camera chain composes directly:
                # T_w_curr = T_w_prev @ T_prev_curr (same as Recorder)
                self.T_world_cam = self.T_world_cam @ np.asarray(
                    res.T, np.float64)
            else:
                log_warning("frame registration rejected; pose kept")
                self.telemetry.count("reg_fail")
        self.prev_maps = TargetMaps.from_depth(frame.depth, self.intr,
                                               rays=self.rays)
        # valid only if the coarse stage ran this frame (else None, and the
        # next coarse call rebuilds target features from prev_maps)
        self._feat_cache, self._feat_next = self._feat_next, None
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
