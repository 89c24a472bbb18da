"""End-to-end pipeline tests on synthetic scenes (headless, CPU)."""

import numpy as np
import pytest

from azurekinect3dreconstruction_tpu.config import (
    OdometryConfig,
    PipelineConfig,
    RegistrationConfig,
    TSDFConfig,
)
from azurekinect3dreconstruction_tpu.core import se3
from azurekinect3dreconstruction_tpu.core.camera import Intrinsics
from azurekinect3dreconstruction_tpu.io.synthetic import (
    Scene,
    Sphere,
    SyntheticCamera,
    orbit_trajectory,
)

SMALL_CFG = PipelineConfig(
    tsdf=TSDFConfig(voxel_size=0.02, sdf_trunc=0.08, block_resolution=8,
                    block_capacity=2048, hash_capacity=8192),
    odometry=OdometryConfig(pyramid_iters=(8, 8, 8)),
    registration=RegistrationConfig(ransac_hypotheses=1024, icp_max_iters=20,
                                    colored_icp_max_iters=30),
    keyframe_interval=1,
    vis_update_interval=2,
)


@pytest.fixture(scope="module")
def cam():
    return SyntheticCamera(intrinsics=Intrinsics.azure_kinect_depth_nfov().scaled(0.25))


def test_mono_odometry_tsdf_tracks_and_reconstructs(cam):
    from azurekinect3dreconstruction_tpu.pipelines import MonoOdometryTSDF

    pipe = MonoOdometryTSDF(cam.intrinsics, SMALL_CFG, backend="xla")
    poses = orbit_trajectory(6, radius=0.25, angle_span=0.5)
    for T in poses:
        d, c = cam.capture(T)
        pipe.process_frame(d, c)
    # estimated relative trajectory should track the true one
    T_est = pipe.trajectory[-1]
    # align: both trajectories start at their own identity; compare relative
    T_true_rel = np.linalg.inv(poses[0]) @ poses[-1]
    err = np.asarray(se3.se3_log(
        np.linalg.inv(T_true_rel) @ T_est)).astype(float)
    assert np.linalg.norm(err[:3]) < 0.03
    assert np.linalg.norm(err[3:]) < 0.05
    mesh = pipe.extract_mesh(max_cells=65536, max_tris=131072)
    assert int(mesh.num_triangles) > 500
    # reset clears everything
    pipe.reset()
    assert int(pipe.volume.n_blocks) == 0


def test_mono_mesh_accuracy_on_sphere():
    from azurekinect3dreconstruction_tpu.pipelines import MonoOdometryTSDF

    scene = Scene(spheres=(Sphere((0.0, 0.0, 1.2), 0.3, (0.9, 0.3, 0.2)),))
    cam = SyntheticCamera(scene=scene,
                          intrinsics=Intrinsics.azure_kinect_depth_nfov().scaled(0.25))
    pipe = MonoOdometryTSDF(cam.intrinsics, SMALL_CFG, backend="xla")
    for T in orbit_trajectory(6, radius=0.3, center=(0, 0, 1.2), angle_span=0.8):
        d, c = cam.capture(T)
        pipe.process_frame(d, c)
    # world frame == first camera frame; the sphere sits at its true place
    mesh = pipe.extract_mesh(max_cells=65536, max_tris=131072)
    nt = int(mesh.num_triangles)
    v = np.asarray(mesh.vertices)[: 3 * nt]
    # restrict to vertices near the analytic sphere (the scene has no floor)
    c0 = np.linalg.inv(pipe.trajectory[0])  # identity
    d_sphere = np.linalg.norm(v - np.array([0, 0, 1.2]), axis=1) - 0.3
    rmse = float(np.sqrt((d_sphere**2).mean()))
    assert rmse < 2 * SMALL_CFG.tsdf.voxel_size, f"tracked-mesh RMSE {rmse}"


def test_recorder_pipeline(cam, tmp_path):
    from azurekinect3dreconstruction_tpu.pipelines import Recorder

    pipe = Recorder(cam.intrinsics, SMALL_CFG, backend="xla",
                    output_dir=str(tmp_path))
    pipe.toggle_recording()
    poses = orbit_trajectory(4, radius=0.2, angle_span=0.3)
    for T in poses:
        d, c = cam.capture(T)
        pipe.process_frame(d, c)
    assert int(pipe.volume.n_blocks) > 50
    T_true_rel = np.linalg.inv(poses[0]) @ poses[-1]
    err = np.asarray(se3.se3_log(np.linalg.inv(T_true_rel) @ pipe.T_world_cam))
    assert np.linalg.norm(err[:3]) < 0.05
    paths = pipe.save_model()
    import os

    for p in paths.values():
        assert os.path.exists(p)


def test_dual_fusion_autocalibration(cam, tmp_path):
    from azurekinect3dreconstruction_tpu.pipelines import DualCameraFusion

    # camera 1 offset from camera 0 by a known baseline
    xi = np.array([0.12, 0.03, -0.02, 0.05, -0.12, 0.04])
    T1 = np.asarray(se3.se3_exp(xi))
    pipe = DualCameraFusion((cam.intrinsics, cam.intrinsics), SMALL_CFG,
                            backend="xla", output_dir=str(tmp_path))
    d0, c0 = cam.capture(np.eye(4))
    d1, c1 = cam.capture(T1)
    pipe.process_frames(((d0, c0), (d1, c1)))
    assert pipe.calibrated, "auto-calibration must succeed on overlapping views"
    err = np.asarray(se3.se3_log(np.linalg.inv(T1) @ pipe.extrinsics[1]))
    assert np.linalg.norm(err[:3]) < 0.02, f"extrinsic terr {err[:3]}"
    assert np.linalg.norm(err[3:]) < 0.03
    cloud = pipe.merged_cloud()
    assert len(cloud) > 1000
    # color modes cycle
    assert pipe.cycle_color_mode() == "depth_gradient"
    cloud2 = pipe.merged_cloud()
    assert len(cloud2) > 1000
    paths = pipe.save_current_state()
    assert "mesh" in paths


def test_dual_fusion_colored_calibration_locks_textured_plane(tmp_path):
    """BASELINE config 4's named combination: two-camera extrinsic
    refinement with COLORED ICP. On a flat textured wall — exactly where
    two-camera rigs get calibrated — point-to-plane leaves the two in-plane
    translations + in-plane rotation unconstrained (every residual is zero
    while the estimate slides along the wall), so a slid seed SURVIVES p2p
    refinement; the photometric term locks it to the checker texture
    (reference Works2CamerasCOLORVisualizer.py:189-279)."""
    from azurekinect3dreconstruction_tpu.core.types import RGBDFrame
    from azurekinect3dreconstruction_tpu.io.synthetic import (
        Plane,
        Scene,
        SyntheticCamera,
    )
    from azurekinect3dreconstruction_tpu.pipelines import DualCameraFusion

    wall = Scene(planes=(Plane((0.0, 0.0, 1.0), (0.0, 0.0, -1.0),
                               (0.85, 0.7, 0.3), checker=0.08),))
    c = SyntheticCamera(scene=wall,
                        intrinsics=Intrinsics.azure_kinect_depth_nfov()
                        .scaled(0.25))
    T1 = np.eye(4)
    T1[0, 3] = 0.10  # true rig baseline: pure in-plane offset
    ccfg = SMALL_CFG.camera
    frames = []
    for T in (np.eye(4), T1):
        d, col = c.capture(T)
        frames.append(RGBDFrame.from_raw(d, col, ccfg.depth_scale,
                                         ccfg.depth_trunc, ccfg.depth_min))
    seed = T1.copy()
    seed[0, 3] += 0.03  # slid 3 cm along the wall

    def refine_err(colored):
        pipe = DualCameraFusion((c.intrinsics, c.intrinsics), SMALL_CFG,
                                backend="xla", output_dir=str(tmp_path))
        pipe.extrinsics = [np.eye(4), seed.copy()]
        pipe.calibrated = True
        ok = pipe.calibrate(tuple(frames), refine_only=True, colored=colored)
        err = np.asarray(se3.se3_log(
            np.linalg.inv(T1) @ pipe.extrinsics[1]))
        return ok, float(np.linalg.norm(err[:3]))

    ok_c, err_c = refine_err(colored=True)
    assert ok_c and err_c < 0.01, f"colored ICP did not lock: {err_c}"
    ok_g, err_g = refine_err(colored=False)
    # the geometric gate HAPPILY accepts the slid pose — that is the trap
    assert err_g > 0.02, (
        f"p2p unexpectedly locked the in-plane DoF ({err_g}) — "
        "scene no longer degenerate; fix the fixture")


def test_recorder_deferred_fallback_rebases_pose(cam, tmp_path):
    """A keyframe jump too large for colored ICP must be caught by the
    DEFERRED host check (one stacked fitness pull) and recovered through
    the FPFH+RANSAC+ICP ladder, rebasing the device pose chain."""
    from azurekinect3dreconstruction_tpu.pipelines import Recorder

    pipe = Recorder(cam.intrinsics, SMALL_CFG, backend="xla",
                    output_dir=str(tmp_path))
    pipe.toggle_recording()
    # an orbit skip: frames 0-2 track smoothly, then the camera jumps
    # straight to the far end of the arc — far beyond the projective-ICP
    # basin, but the view stays on the scene so global registration has
    # the overlap it needs (the same shape of motion
    # test_cloud_accumulator_coarse_recovers_large_motion proves out)
    orbit = orbit_trajectory(8, radius=0.45, angle_span=1.3,
                             height_wobble=0.0)
    poses = orbit[:3] + [orbit[7]]
    for T in poses:
        d, c = cam.capture(T)
        pipe.process_frame(d, c)
    # the rejection is pending (deferred check); save forces the pull
    pipe.save_model()
    snap = dict(pipe.telemetry._counters)
    assert snap.get("colored_icp_reject", 0) >= 1, snap
    assert snap.get("fallback_rebase", 0) >= 1, snap
    T_true_rel = np.linalg.inv(poses[0]) @ poses[-1]
    err = np.asarray(se3.se3_log(np.linalg.inv(T_true_rel) @ pipe.T_world_cam))
    assert np.linalg.norm(err[:3]) < 0.06, f"terr {err[:3]}"
    assert np.linalg.norm(err[3:]) < 0.08, f"rerr {err[3:]}"


def test_raw_dual_step_matches_per_camera_integration(cam):
    """The fused pair step (decode+allocate+integrate x2 in one dispatch)
    must produce the same volume as two separate integrate_frame calls on
    eagerly-decoded frames, and cam1_on=0 must reduce it to camera 0 only."""
    import jax.numpy as jnp

    from azurekinect3dreconstruction_tpu.core.camera import pixel_rays
    from azurekinect3dreconstruction_tpu.core.types import RGBDFrame
    from azurekinect3dreconstruction_tpu.pipelines.dual_fusion import (
        make_raw_dual_step,
    )
    from azurekinect3dreconstruction_tpu.tsdf import volume as tsdf

    ccfg = SMALL_CFG.camera
    tcfg = SMALL_CFG.tsdf
    intr = cam.intrinsics
    rays = pixel_rays(intr)
    xi = np.array([0.1, 0.02, -0.02, 0.04, -0.1, 0.03])
    T1 = np.asarray(se3.se3_exp(xi))
    d0, c0 = cam.capture(np.eye(4))
    d1, c1 = cam.capture(T1)

    step = make_raw_dual_step(intr, intr, tcfg, backend="xla")
    args = (jnp.asarray(d0), jnp.asarray(c0), jnp.asarray(d1),
            jnp.asarray(c1), rays, rays,
            jnp.eye(4, dtype=jnp.float32), jnp.asarray(T1, jnp.float32),
            1.0 / ccfg.depth_scale, ccfg.depth_min, ccfg.depth_trunc)
    vol = step(tsdf.create(tcfg), *args, jnp.float32(1.0))

    ref = tsdf.create(tcfg)
    for (d, c), T in (((d0, c0), np.eye(4)), ((d1, c1), T1)):
        f = RGBDFrame.from_raw(d, c, ccfg.depth_scale, ccfg.depth_trunc,
                               ccfg.depth_min)
        ref = tsdf.integrate_frame(ref, f.depth, f.color, rays,
                                   jnp.asarray(T, jnp.float32), intr, tcfg,
                                   backend="xla")
    assert int(vol.n_blocks) == int(ref.n_blocks)
    assert np.isclose(float(vol.weight.sum()), float(ref.weight.sum()))
    assert np.isclose(float(vol.tsdf.sum()), float(ref.tsdf.sum()), atol=1e-3)

    # cam1_on = 0: camera 1 must contribute nothing
    vol0 = step(tsdf.create(tcfg), *args, jnp.float32(0.0))
    f0 = RGBDFrame.from_raw(d0, c0, ccfg.depth_scale, ccfg.depth_trunc,
                            ccfg.depth_min)
    ref0 = tsdf.integrate_frame(tsdf.create(tcfg), f0.depth, f0.color, rays,
                                jnp.eye(4, dtype=jnp.float32), intr, tcfg,
                                backend="xla")
    assert int(vol0.n_blocks) == int(ref0.n_blocks)
    assert np.isclose(float(vol0.weight.sum()), float(ref0.weight.sum()))


def test_dual_fusion_hot_loop_skips_eager_decode(cam, tmp_path):
    """Once calibrated, process_frames must not decode eagerly (the fused
    step owns decode); display decodes lazily at its own cadence."""
    from azurekinect3dreconstruction_tpu.pipelines import DualCameraFusion

    T1 = np.asarray(se3.se3_exp(
        np.array([0.12, 0.03, -0.02, 0.05, -0.12, 0.04])))
    pipe = DualCameraFusion((cam.intrinsics, cam.intrinsics), SMALL_CFG,
                            backend="xla", output_dir=str(tmp_path))
    pair = ((cam.capture(np.eye(4))), (cam.capture(T1)))
    pipe.process_frames(pair)
    assert pipe.calibrated
    pipe.process_frames(pair)
    assert pipe._frames_stale, "calibrated path must defer decoding"
    cloud = pipe.merged_cloud()
    assert not pipe._frames_stale and len(cloud) > 1000
    assert pipe.recalibrate(), "recalibration from lazy frames"


def test_offline_bundle_loop_and_reintegrate(cam, tmp_path):
    from azurekinect3dreconstruction_tpu.pipelines import OfflineBundle

    pipe = OfflineBundle(cam.intrinsics, SMALL_CFG, output_dir=str(tmp_path),
                         backend="xla", loop_min_gap=4, loop_radius=1.0,
                         loop_check_interval=4, checkpoint_interval=4)
    # out-and-back trajectory so a loop closure exists
    fwd = orbit_trajectory(4, radius=0.2, angle_span=0.4)
    poses = fwd + fwd[::-1]
    for T in poses:
        d, c = cam.capture(T)
        pipe.process_frame(d, c)
    assert pipe.n_frames == len(poses)
    mesh = pipe.finalize()
    assert mesh is not None and mesh.triangles.shape[0] > 200
    # the optimized end pose must sit near the start (returned trajectory)
    p_end = pipe.graph.nodes[-1][:3, 3]
    p_start = pipe.graph.nodes[0][:3, 3]
    true_gap = np.linalg.norm(fwd[0][:3, 3] - fwd[0][:3, 3])
    assert np.linalg.norm(p_end - p_start) < 0.05
    # resume from the frame log reproduces the node count
    resumed = OfflineBundle.resume(cam.intrinsics, str(tmp_path), SMALL_CFG,
                                   backend="xla", loop_min_gap=4,
                                   loop_radius=1.0, loop_check_interval=4)
    assert resumed.n_frames == len(poses)


def test_raw_batch_reintegration_matches_per_frame(cam):
    """The offline finalize's chunked raw-batch scan (make_raw_batch_fn)
    must reproduce the per-frame decode+integrate it replaced, and
    zero-depth PAD frames must integrate nothing (the last chunk of a log
    is padded with them)."""
    import jax.numpy as jnp

    from azurekinect3dreconstruction_tpu.core.camera import pixel_rays
    from azurekinect3dreconstruction_tpu.core.types import RGBDFrame
    from azurekinect3dreconstruction_tpu.pipelines.mono_odometry_tsdf import (
        make_raw_batch_fn,
    )
    from azurekinect3dreconstruction_tpu.tsdf import volume as tsdf

    cfg = SMALL_CFG.tsdf
    camcfg = SMALL_CFG.camera
    rays = pixel_rays(cam.intrinsics)
    poses = orbit_trajectory(5, radius=0.25, angle_span=0.5)
    frames = [cam.capture(T) for T in poses]

    ref = tsdf.create(cfg)
    for (d, c), T in zip(frames, poses):
        f = RGBDFrame.from_raw(d, c, camcfg.depth_scale, camcfg.depth_trunc,
                               camcfg.depth_min)
        ref = tsdf.integrate_frame(ref, f.depth, f.color, rays,
                                   jnp.asarray(T, jnp.float32),
                                   cam.intrinsics, cfg, backend="xla")

    batch = make_raw_batch_fn(cam.intrinsics, cfg, backend="xla")
    pad = 3
    ds = np.stack([f[0] for f in frames]
                  + [np.zeros_like(frames[0][0])] * pad)
    cs = np.stack([f[1] for f in frames]
                  + [np.zeros_like(frames[0][1])] * pad)
    Ts = np.stack([np.asarray(T, np.float32) for T in poses]
                  + [np.eye(4, dtype=np.float32)] * pad)
    got = batch(tsdf.create(cfg), ds, cs, Ts, rays,
                np.float32(1.0 / camcfg.depth_scale),
                np.float32(camcfg.depth_min), np.float32(camcfg.depth_trunc))
    assert int(got.n_blocks) == int(ref.n_blocks)
    np.testing.assert_array_equal(np.asarray(got.weight),
                                  np.asarray(ref.weight))
    np.testing.assert_allclose(np.asarray(got.tsdf), np.asarray(ref.tsdf),
                               rtol=0, atol=1e-6)


@pytest.mark.slow
def test_fragment_pipeline(cam):
    from azurekinect3dreconstruction_tpu.pipelines import FragmentPipeline

    pipe = FragmentPipeline(cam.intrinsics, SMALL_CFG, backend="xla")
    poses = orbit_trajectory(3, radius=0.15, angle_span=0.25)
    for T in poses:
        d, c = cam.capture(T)
        pipe.capture(d, c)
    mesh = pipe.run()
    assert mesh.triangles.shape[0] > 200
    # fragment poses should match the true relative motions
    for i, frag in enumerate(pipe.fragments):
        T_true = np.linalg.inv(poses[0]) @ poses[i]
        err = np.asarray(se3.se3_log(np.linalg.inv(T_true) @ frag.pose))
        assert np.linalg.norm(err[:3]) < 0.03


def test_cloud_accumulator(cam, tmp_path):
    from azurekinect3dreconstruction_tpu.pipelines import CloudAccumulator

    pipe = CloudAccumulator(cam.intrinsics, SMALL_CFG, output_dir=str(tmp_path))
    for T in orbit_trajectory(4, radius=0.2, angle_span=0.3):
        d, c = cam.capture(T)
        pipe.process_frame(d, c)
    assert pipe.model_points.shape[0] > 2000
    paths = pipe.save_model()
    import os

    assert os.path.exists(paths["pointcloud"])


@pytest.mark.slow
def test_cloud_accumulator_coarse_recovers_large_motion(cam, tmp_path):
    """VERDICT r2 weak #5: the reference runs FPFH + RANSAC before EVERY
    point-to-plane refinement (Reconstruction.py:100-135) precisely so that
    far-apart keyframes still register. Un-seeded projective ICP must fail
    on a large orbit step; the coarse-seeded ladder must recover it."""
    import jax.numpy as jnp

    from azurekinect3dreconstruction_tpu.pipelines import CloudAccumulator

    poses = orbit_trajectory(2, radius=0.45, angle_span=1.3, height_wobble=0.0)
    frames = [cam.capture(T) for T in poses]
    T_true_rel = np.linalg.inv(poses[0]) @ poses[1]

    def run(coarse):
        pipe = CloudAccumulator(cam.intrinsics, SMALL_CFG, coarse=coarse,
                                output_dir=str(tmp_path))
        for d, c in frames:
            pipe.process_frame(d, c)
        return np.asarray(se3.se3_log(jnp.asarray(
            np.linalg.inv(T_true_rel) @ pipe.T_world_cam, jnp.float32)))

    err_icp = run(False)
    err_coarse = run(True)
    assert np.linalg.norm(err_coarse[:3]) < 0.06, err_coarse
    assert np.linalg.norm(err_coarse[3:]) < 0.10, err_coarse
    # the un-seeded path must actually be the failure case being fixed
    assert np.linalg.norm(err_icp) > 3 * np.linalg.norm(err_coarse), (
        err_icp, err_coarse)


def test_mono_streaming_mode_matches_plain(cam):
    """MonoOdometryTSDF(streaming=...) must track and reconstruct exactly
    like the plain pipeline on a scene that fits the pool (ticks run, no
    eviction triggers) — the wiring may not perturb the zero-sync hot path.
    Actual eviction/reload exactness is test_streaming.py's job."""
    from azurekinect3dreconstruction_tpu.pipelines import MonoOdometryTSDF
    from azurekinect3dreconstruction_tpu.tsdf.streaming import StreamingTSDF

    poses = orbit_trajectory(6, radius=0.25, angle_span=0.5)
    raw = [cam.capture(T) for T in poses]

    def run(streaming):
        pipe = MonoOdometryTSDF(cam.intrinsics, SMALL_CFG, backend="xla",
                                streaming=streaming)
        for d, c in raw:
            pipe.process_frame(d, c)
        m = pipe.extract_mesh().compact()
        tri = m.vertices.reshape(-1, 9)
        return tri[np.lexsort(tri.T[::-1])], pipe.T_world_cam

    sv = StreamingTSDF(SMALL_CFG.tsdf, evict_dist=9.0, reload_dist=7.0,
                       check_interval=2)
    soup_s, T_s = run(sv)
    soup_p, T_p = run(None)
    np.testing.assert_array_equal(T_s, T_p)
    np.testing.assert_array_equal(soup_s, soup_p)


def test_cloud_accumulator_feature_cache_is_exact(cam, tmp_path):
    """The coarse stage hands last frame's SOURCE feature tuple over as
    this frame's TARGET (prev_maps backprojects the same depth through the
    same rays, so downsample/normals/FPFH are recomputations of identical
    inputs). Pin the byte-identity so the cache and `_target_features` can
    never silently drift apart."""
    from azurekinect3dreconstruction_tpu.pipelines import CloudAccumulator

    pipe = CloudAccumulator(cam.intrinsics, SMALL_CFG, coarse=True,
                            output_dir=str(tmp_path))
    pipe.coarse_skip_fitness = 1.1  # force the coarse stage every keyframe
    for T in orbit_trajectory(2, radius=0.2, angle_span=0.3):
        d, c = cam.capture(T)
        pipe.process_frame(d, c)
    assert pipe._feat_cache is not None  # coarse ran on the 2nd keyframe
    fresh = pipe._target_features()
    for got, want in zip(pipe._feat_cache, fresh):
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_mono_frame_to_model_tracking(cam):
    """frame_to_model mode: odometry predicts, projective ICP against the
    device-extracted model surface refines (reference
    InitialReconstruction-CUDA-2cam:653-674). Trajectory must stay at least
    as accurate as frame-to-frame on the same sequence."""
    from azurekinect3dreconstruction_tpu.pipelines import MonoOdometryTSDF

    poses = orbit_trajectory(8, radius=0.2, angle_span=0.5)

    import jax.numpy as jnp

    def run(tracking):
        pipe = MonoOdometryTSDF(cam.intrinsics, SMALL_CFG, backend="xla",
                                tracking=tracking, model_refine_interval=2,
                                model_min_inliers=500)
        for T in poses:
            d, c = cam.capture(T)
            pipe.process_frame(d, c)
        errs = []
        for i, T in enumerate(poses):
            T_true = np.linalg.inv(poses[0]) @ T
            d6 = np.asarray(se3.se3_log(jnp.asarray(
                np.linalg.inv(T_true) @ pipe.trajectory[i + 1], jnp.float32)))
            errs.append(np.linalg.norm(d6))
        return pipe, float(np.max(errs))

    pipe_m, err_m = run("frame_to_model")
    assert pipe_m.telemetry._counters.get("model_icp_ok", 0) > 0, \
        "model refinement never engaged"
    _, err_f = run("frame_to_frame")
    # the mode's contract: at least as accurate (small epsilon for fp noise)
    assert err_m <= err_f + 5e-4, (err_m, err_f)
    assert err_m < 0.02, err_m


def test_frame_to_model_integrates_refined_pose(cam):
    """frame_to_model ordering contract, fused-step era: the step must fuse
    the frame at the pose its refinement gate CHOSE — not at the raw odometry
    prediction (the reference registers against the model and only then adds
    the cloud, InitialReconstruction-CUDA-2cam:625-674). Proven by
    equivalence: shift the model by a recognizable 5 mm so the refinement
    must move the pose, then show the fused step's output volume is
    identical to integrating the frame at the step's RETURNED pose."""
    import jax
    import jax.numpy as jnp

    from azurekinect3dreconstruction_tpu.core.camera import pixel_rays
    from azurekinect3dreconstruction_tpu.core.types import RGBDFrame
    from azurekinect3dreconstruction_tpu.pipelines.mono_odometry_tsdf import (
        apply_odometry_gate,
        make_raw_f2m_step,
    )
    from azurekinect3dreconstruction_tpu.tracking.odometry import compute_odometry
    from azurekinect3dreconstruction_tpu.tsdf import marching_cubes as mc
    from azurekinect3dreconstruction_tpu.tsdf import volume as tsdf

    ccfg = SMALL_CFG.camera
    rays = pixel_rays(cam.intrinsics)
    poses = orbit_trajectory(2, radius=0.2, angle_span=0.3)

    # seed the volume + model surface with frame 0 at the origin
    d0, c0 = cam.capture(poses[0])
    f0 = RGBDFrame.from_raw(d0, c0, ccfg.depth_scale, ccfg.depth_trunc,
                            ccfg.depth_min)
    vol = tsdf.create(SMALL_CFG.tsdf)
    vol = tsdf.integrate_frame(vol, f0.depth, f0.color, rays,
                               jnp.eye(4, dtype=jnp.float32), cam.intrinsics,
                               SMALL_CFG.tsdf, backend="xla")
    mp, mm, _ = mc.extract_surface_samples(vol, SMALL_CFG.tsdf, 32768)
    # the recognizable correction: a model shifted +5 mm in x pulls the
    # refined pose away from pure odometry by about that much (< max_jump)
    mp = mp + jnp.asarray([0.005, 0.0, 0.0], jnp.float32)

    step = make_raw_f2m_step(cam.intrinsics, SMALL_CFG, backend="xla",
                             min_inliers=500)
    d1, c1 = cam.capture(poses[1])
    T_prev = jnp.eye(4, dtype=jnp.float32)
    vol_in = jax.tree_util.tree_map(jnp.array, vol)  # the step donates arg 0
    vol_out, T, fit, inten, depth_m, n_in, ok = step(
        vol_in, T_prev, f0.intensity, f0.depth, d1, c1, rays, mp, mm,
        1.0 / ccfg.depth_scale, ccfg.depth_min, ccfg.depth_trunc)
    assert bool(ok), "refinement gate must accept on this easy scene"

    # the refined pose must differ from the pure-odometry chain by roughly
    # the injected model shift (refinement actually engaged)
    f1 = RGBDFrame.from_raw(d1, c1, ccfg.depth_scale, ccfg.depth_trunc,
                            ccfg.depth_min)
    res = compute_odometry(f0.intensity, f0.depth, f1.intensity, f1.depth,
                           cam.intrinsics, SMALL_CFG.odometry)
    T_odo, _ = apply_odometry_gate(T_prev, res, 0.3)
    dx = float(jnp.abs(T - T_odo).max())
    assert 2e-3 < dx < 0.02, dx

    # THE contract: the volume was fused at exactly the returned pose
    want = tsdf.integrate_frame(jax.tree_util.tree_map(jnp.array, vol),
                                f1.depth, f1.color, rays, T, cam.intrinsics,
                                SMALL_CFG.tsdf, backend="xla")
    for a, b in zip(jax.tree_util.tree_leaves(vol_out),
                    jax.tree_util.tree_leaves(want)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-6, rtol=1e-6)


def test_frame_to_model_refresh_is_view_local(cam):
    """On a map larger than the camera's integration reach, the model
    refresh must sample only view-local blocks — a full-pool sample wastes
    budget on geometry that can never project into the frame and biases
    toward the oldest-scanned region once budgets bind (the place the
    camera LEFT). Two frames fused 8 m apart, then the PIPELINE's own
    refresh path (extract_sampled_surface_model at the pipeline's reach):
    the sampled surface stays within reach of the pose."""
    import jax.numpy as jnp

    from azurekinect3dreconstruction_tpu.core.camera import pixel_rays
    from azurekinect3dreconstruction_tpu.core.types import RGBDFrame
    from azurekinect3dreconstruction_tpu.pipelines.mono_odometry_tsdf import (
        MonoOdometryTSDF,
    )
    from azurekinect3dreconstruction_tpu.tsdf import marching_cubes as mc
    from azurekinect3dreconstruction_tpu.tsdf import volume as tsdf

    ccfg = SMALL_CFG.camera
    rays = pixel_rays(cam.intrinsics)
    vol = tsdf.create(SMALL_CFG.tsdf)
    T_far = np.eye(4)
    T_far[0, 3] = 8.0  # beyond reach (~5 m for SMALL_CFG)
    for T in (np.eye(4), T_far):
        d, c = cam.capture(T)
        f = RGBDFrame.from_raw(d, c, ccfg.depth_scale, ccfg.depth_trunc,
                               ccfg.depth_min)
        vol = tsdf.integrate_frame(vol, f.depth, f.color, rays,
                                   jnp.asarray(T, jnp.float32),
                                   cam.intrinsics, SMALL_CFG.tsdf,
                                   backend="xla")
    nb = int(vol.n_blocks)
    pipe = MonoOdometryTSDF(cam.intrinsics, SMALL_CFG, backend="xla",
                            tracking="frame_to_model", model_points=4096)
    reach = pipe._model_reach()
    pts, mask, _ = mc.extract_sampled_surface_model(
        vol, SMALL_CFG.tsdf, 4096, jnp.eye(4, dtype=jnp.float32), reach,
        sample_blocks=pipe.model_sample_blocks)
    p = np.asarray(pts)[np.asarray(mask)]
    assert len(p) > 100
    assert (np.linalg.norm(p, axis=1) <= reach + SMALL_CFG.tsdf.block_size
            ).all(), "sampled surface leaked outside the view-local radius"
    # the original volume is untouched (selection/extraction do not donate)
    assert int(vol.n_blocks) == nb


def test_odometry_gate_failure_marker():
    """apply_odometry_gate: identity fallback + fitness -1 for BOTH failure
    modes (low fitness, non-finite transform with healthy fitness) so
    odometry_failures counts them all; healthy results pass through."""
    import jax.numpy as jnp

    from azurekinect3dreconstruction_tpu.pipelines.mono_odometry_tsdf import (
        apply_odometry_gate,
    )
    from azurekinect3dreconstruction_tpu.tracking.odometry import OdometryResult

    T_prev = jnp.eye(4, dtype=jnp.float32)
    good_T = jnp.eye(4, dtype=jnp.float32).at[0, 3].set(0.1)

    def res(T, fit):
        return OdometryResult(T_target_source=T, fitness=jnp.float32(fit),
                              rmse=jnp.float32(0.0), inliers=jnp.int32(1000))

    T, fit = apply_odometry_gate(T_prev, res(good_T, 0.9), 0.3)
    assert float(fit) == pytest.approx(0.9)
    assert abs(float(T[0, 3]) + 0.1) < 1e-6  # inverse of the +0.1 shift

    # healthy fitness but NaN transform -> identity motion, fitness -1
    bad_T = good_T.at[1, 1].set(jnp.nan)
    T, fit = apply_odometry_gate(T_prev, res(bad_T, 0.9), 0.3)
    assert float(fit) == -1.0
    np.testing.assert_array_equal(np.asarray(T), np.eye(4))

    # low fitness -> same marker
    T, fit = apply_odometry_gate(T_prev, res(good_T, 0.1), 0.3)
    assert float(fit) == -1.0
    np.testing.assert_array_equal(np.asarray(T), np.eye(4))


def test_raw_slam_step_matches_eager_decode(cam):
    """The fused raw-frame step (u16/u8 decode INSIDE the jitted dispatch)
    must be bit-compatible with decoding via RGBDFrame.from_raw and running
    the plain XLA step — same masking constants, same fitness/pose."""
    import jax.numpy as jnp

    from azurekinect3dreconstruction_tpu.core.types import RGBDFrame
    from azurekinect3dreconstruction_tpu.core.camera import pixel_rays
    from azurekinect3dreconstruction_tpu.pipelines.mono_odometry_tsdf import (
        make_raw_slam_step,
        make_xla_slam_step,
    )
    from azurekinect3dreconstruction_tpu.tsdf import volume as tsdf

    intr = cam.intrinsics
    rays = pixel_rays(intr)
    camc = SMALL_CFG.camera
    d0, c0 = cam.capture(None)
    d1, c1 = cam.capture(orbit_trajectory(3, radius=0.2, angle_span=0.2)[1])
    f0 = RGBDFrame.from_raw(d0, c0, camc.depth_scale, camc.depth_trunc,
                            camc.depth_min)
    f1 = RGBDFrame.from_raw(d1, c1, camc.depth_scale, camc.depth_trunc,
                            camc.depth_min)

    eye = jnp.eye(4, dtype=jnp.float32)
    ref_step = make_xla_slam_step(intr, SMALL_CFG)
    vol_ref, T_ref, fit_ref = ref_step(
        tsdf.create(SMALL_CFG.tsdf), eye, f0.intensity, f0.depth,
        f1.intensity, f1.depth, f1.color, rays)

    raw_step = make_raw_slam_step(intr, SMALL_CFG, backend="xla")
    vol_raw, T_raw, fit_raw, inten, depth_m = raw_step(
        tsdf.create(SMALL_CFG.tsdf), eye, f0.intensity, f0.depth,
        d1, c1, rays, 1.0 / camc.depth_scale, camc.depth_min,
        camc.depth_trunc)

    assert np.array_equal(np.asarray(T_ref), np.asarray(T_raw))
    assert float(fit_ref) == float(fit_raw)
    assert np.array_equal(np.asarray(vol_ref.weight), np.asarray(vol_raw.weight))
    # the returned decoded frame must equal the eager decode (feeds the next step)
    assert np.array_equal(np.asarray(inten), np.asarray(f1.intensity))
    assert np.array_equal(np.asarray(depth_m), np.asarray(f1.depth))


def test_offline_bundle_optimization_reduces_drift(cam, tmp_path):
    """QUANTIFY the point of the bundle pipeline: with deliberately weak
    odometry (2 GN iters/level -> measurable drift), the loop-closed +
    globally-optimized trajectory must beat the raw odometry chain on ATE
    and final drift against synthetic ground truth (utils/evaluation).
    The reference asserts this value only by eyeballing the mesh
    (bundlefusion_reconstruction.py:285-344 re-integrates and hopes)."""
    import dataclasses

    from azurekinect3dreconstruction_tpu.pipelines import OfflineBundle
    from azurekinect3dreconstruction_tpu.utils.evaluation import ate

    cfg = dataclasses.replace(
        SMALL_CFG, odometry=OdometryConfig(pyramid_iters=(2, 2, 2)))
    pipe = OfflineBundle(cam.intrinsics, cfg, output_dir=str(tmp_path),
                         backend="xla", loop_min_gap=4, loop_radius=1.0,
                         loop_check_interval=4, checkpoint_interval=0)
    fwd = orbit_trajectory(6, radius=0.25, angle_span=0.9)
    poses = fwd + fwd[::-1]  # out-and-back: the end revisits the start
    gt = [np.linalg.inv(poses[0]) @ T for T in poses]
    for T in poses:
        d, c = cam.capture(T)
        pipe.process_frame(d, c)
    pipe.finalize(extract=False)

    # raw odometry chain, reconstructed from the consecutive edges (they
    # keep the unoptimized measurements; optimize() moves only the nodes)
    raw = [np.eye(4)]
    for e in pipe.graph.edges:
        if not e.uncertain and e.target == e.source + 1:
            raw.append(raw[-1] @ e.transformation)
    assert len(raw) == len(gt)

    # both trajectories are gauge-fixed at node 0 == the GT anchor, so the
    # UNALIGNED errors are directly comparable (rigid alignment would hide
    # exactly the accumulated-drift signal optimization exists to remove)
    a_raw = ate(raw, gt, align=False)
    a_opt = ate(pipe.graph.nodes, gt, align=False)
    # sanity: the weakened odometry must actually drift, or this test
    # proves nothing
    assert a_raw["final_drift"] > 0.005, a_raw
    assert pipe.telemetry._counters.get("loop_closures", 0) >= 1
    assert a_opt["rmse"] < a_raw["rmse"], (a_opt, a_raw)
    assert a_opt["final_drift"] < 0.3 * a_raw["final_drift"], (a_opt, a_raw)


def test_jit_map_guard_releases_executable_mappings():
    """The vm.max_map_count guard (utils.telemetry.release_jit_maps_if_crowded):
    below the soft limit it must be a no-op; with a forced-low limit it must
    clear jax's executable caches (observable as a fresh compile-cache miss,
    and on CPU as a map-count drop — here we assert the cheap invariants
    that hold on every backend)."""
    from azurekinect3dreconstruction_tpu.utils.telemetry import (
        Telemetry,
        process_map_count,
        release_jit_maps_if_crowded,
    )

    n = process_map_count()
    assert n > 0  # /proc exists on this image
    assert release_jit_maps_if_crowded(soft_limit=n + 10_000) is False
    assert release_jit_maps_if_crowded(soft_limit=1) is True
    # the per-frame hook wires the guard at a 512-frame cadence
    t = Telemetry(report_interval=1e9)
    for _ in range(512):
        t.tick_frame()
    assert t.frame_count == 512
