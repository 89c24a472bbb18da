import jax.numpy as jnp
import numpy as np
import pytest

from azurekinect3dreconstruction_tpu.config import TSDFConfig
from azurekinect3dreconstruction_tpu.core.camera import Intrinsics, pixel_rays
from azurekinect3dreconstruction_tpu.io.synthetic import (
    Scene,
    Sphere,
    SyntheticCamera,
    orbit_trajectory,
)
from azurekinect3dreconstruction_tpu.tsdf import volume as tsdf


CFG = TSDFConfig(
    voxel_size=0.02,
    sdf_trunc=0.08,
    block_resolution=8,
    block_capacity=2048,
    hash_capacity=8192,
)


@pytest.fixture(scope="module")
def sphere_cam():
    scene = Scene(spheres=(Sphere((0.0, 0.0, 1.2), 0.3, (0.9, 0.2, 0.1)),))
    intr = Intrinsics.azure_kinect_depth_nfov().scaled(0.25)
    return SyntheticCamera(scene=scene, intrinsics=intr)


def numpy_tsdf_reference(depth, color, intr, T_wc, voxel, trunc, centers):
    """Independent numpy TSDF fusion at given world voxel centers (weight 1)."""
    T_cw = np.linalg.inv(T_wc)
    pc = centers @ T_cw[:3, :3].T + T_cw[:3, 3]
    z = pc[:, 2]
    with np.errstate(divide="ignore", invalid="ignore"):
        u = np.round(pc[:, 0] / z * intr.fx + intr.cx).astype(np.int64)
        v = np.round(pc[:, 1] / z * intr.fy + intr.cy).astype(np.int64)
    inb = (z > 1e-4) & (u >= 0) & (v >= 0) & (u < intr.width) & (v < intr.height)
    uc, vc = np.clip(u, 0, intr.width - 1), np.clip(v, 0, intr.height - 1)
    d = depth[vc, uc]
    sdf = d - z
    upd = inb & (d > 0) & (sdf > -trunc)
    t = np.minimum(sdf / trunc, 1.0)
    return np.where(upd, t, np.nan)


def test_integrate_matches_numpy_reference(sphere_cam):
    intr = sphere_cam.intrinsics
    z, col = sphere_cam.render()
    depth = np.asarray(z)
    color = np.asarray(col)
    rays = pixel_rays(intr)
    T = np.eye(4, dtype=np.float32)

    vol = tsdf.create(CFG)
    vol = tsdf.integrate_frame(vol, jnp.asarray(depth), jnp.asarray(color), rays, T, intr, CFG,
                               stride=1)
    assert int(vol.n_blocks) > 0
    assert not bool(vol.overflow)

    # compare at voxel centers inside the truncation band around the sphere
    sph_c = np.array([0.0, 0.0, 1.2])
    rng = np.random.RandomState(0)
    dirs = rng.normal(size=(4000, 3))
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    dirs = dirs[dirs[:, 2] < -0.3]  # camera-facing hemisphere
    radii = 0.3 + rng.uniform(-0.5, 0.5, size=dirs.shape[0]) * CFG.sdf_trunc
    pts = sph_c + dirs * radii[:, None]
    # snap to voxel centers so both impls sample identical locations
    pts = (np.floor(pts / CFG.voxel_size) + 0.5) * CFG.voxel_size

    ref = numpy_tsdf_reference(depth, color, intr, T, CFG.voxel_size, CFG.sdf_trunc, pts)
    got_t, got_w = tsdf.sample_tsdf(vol, jnp.asarray(pts, jnp.float32), CFG)
    got_t, got_w = np.asarray(got_t), np.asarray(got_w)

    valid_ref = ~np.isnan(ref)
    fused = valid_ref & (got_w > 0)
    # allocation must cover nearly all band voxels the reference touches
    assert fused.sum() > 0.95 * valid_ref.sum()
    np.testing.assert_allclose(got_t[fused], ref[fused], atol=1e-3)


def test_zero_crossing_near_surface(sphere_cam):
    intr = sphere_cam.intrinsics
    z, col = sphere_cam.render()
    rays = pixel_rays(intr)
    vol = tsdf.create(CFG)
    T = np.eye(4, dtype=np.float32)
    vol = tsdf.integrate_frame(vol, z, col, rays, T, intr, CFG, stride=1)

    sph_c = np.array([0.0, 0.0, 1.2])
    # points exactly on the analytic surface (front hemisphere)
    rng = np.random.RandomState(1)
    dirs = rng.normal(size=(2000, 3))
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    dirs = dirs[dirs[:, 2] < -0.5]
    on = sph_c + 0.3 * dirs
    t, w = tsdf.sample_tsdf(vol, jnp.asarray(on, jnp.float32), CFG)
    t, w = np.asarray(t), np.asarray(w)
    seen = w > 0
    assert seen.mean() > 0.9
    # |tsdf| at the surface < one voxel of normalized distance
    assert np.abs(t[seen]).mean() < CFG.voxel_size / CFG.sdf_trunc
    # in front (toward camera): positive; behind: negative
    front = sph_c + (0.3 + 0.06) * dirs
    back = sph_c + (0.3 - 0.06) * dirs
    tf, wf = tsdf.sample_tsdf(vol, jnp.asarray(front, jnp.float32), CFG)
    tb, wb = tsdf.sample_tsdf(vol, jnp.asarray(back, jnp.float32), CFG)
    tf, wf, tb, wb = map(np.asarray, (tf, wf, tb, wb))
    assert (tf[wf > 0] > 0).mean() > 0.95
    assert (tb[wb > 0] < 0).mean() > 0.95


def test_multi_frame_weight_accumulation(sphere_cam):
    intr = sphere_cam.intrinsics
    rays = pixel_rays(intr)
    vol = tsdf.create(CFG)
    T = np.eye(4, dtype=np.float32)
    z, col = sphere_cam.render()
    for _ in range(3):
        vol = tsdf.integrate_frame(vol, z, col, rays, T, intr, CFG)
    _, w = tsdf.sample_tsdf(vol, jnp.asarray([[0.0, 0.0, 0.9]], jnp.float32), CFG)
    # the surface voxel directly in front of the camera saw all 3 frames
    assert float(w[0]) == 3.0


def test_extract_point_cloud_on_sphere(sphere_cam):
    intr = sphere_cam.intrinsics
    rays = pixel_rays(intr)
    vol = tsdf.create(CFG)
    for T in orbit_trajectory(5, radius=0.3, center=(0.0, 0.0, 1.2)):
        zz, cc = sphere_cam.render(np.asarray(T, np.float32))
        vol = tsdf.integrate_frame(vol, zz, cc, rays, np.asarray(T, np.float32), intr, CFG)
    pts, cols = tsdf.extract_point_cloud(vol, CFG)
    assert pts.shape[0] > 500
    d = np.abs(np.linalg.norm(pts - np.array([0.0, 0.0, 1.2]), axis=1) - 0.3)
    # RMS distance to the analytic sphere < 1 voxel
    assert np.sqrt((d**2).mean()) < CFG.voxel_size
    assert cols.min() >= 0.0 and cols.max() <= 1.0


def test_reset_clears_state(sphere_cam):
    intr = sphere_cam.intrinsics
    rays = pixel_rays(intr)
    vol = tsdf.create(CFG)
    z, col = sphere_cam.render()
    vol = tsdf.integrate_frame(vol, z, col, rays, np.eye(4, dtype=np.float32), intr, CFG)
    assert int(vol.n_blocks) > 0
    vol = tsdf.reset(CFG)
    assert int(vol.n_blocks) == 0
    assert float(jnp.sum(vol.weight)) == 0.0


def test_device_point_extraction_and_frame_to_model_icp():
    """extract_point_cloud_device feeds frame-to-model ICP with no host hop
    (reference InitialReconstruction-CUDA-2cam:653-674 frame-to-model).

    Needs a geometry-rich scene: a lone sphere is rotationally symmetric, so
    point-to-plane ICP is gauge-free on it and slides tangentially.
    """
    import jax.numpy as jnp
    from azurekinect3dreconstruction_tpu.core import se3
    from azurekinect3dreconstruction_tpu.io.synthetic import orbit_trajectory
    from azurekinect3dreconstruction_tpu.tracking.icp import TargetMaps, icp_projective

    cam = SyntheticCamera(intrinsics=Intrinsics.azure_kinect_depth_nfov().scaled(0.25))
    intr = cam.intrinsics
    rays = pixel_rays(intr)
    vol = tsdf.create(CFG)
    poses = orbit_trajectory(4, radius=0.25, angle_span=0.5)
    for T in poses:
        z, c = cam.render(np.asarray(T, np.float32))
        vol = tsdf.integrate_frame(vol, z, c, rays, np.asarray(T, np.float32),
                                   intr, CFG)
    mp, mc_, mm = tsdf.extract_point_cloud_device(vol, CFG, max_points=16384)
    assert int(np.asarray(mm).sum()) > 300

    # a new frame from a slightly moved camera; find its pose from the model
    xi = np.array([0.015, -0.01, 0.01, 0.015, -0.01, 0.01])
    T_new = poses[0] @ np.asarray(se3.se3_exp(jnp.asarray(xi, jnp.float32)), np.float64)
    z, c = cam.render(np.asarray(T_new, np.float32))
    maps = TargetMaps.from_depth(z, intr, rays=rays)
    # model (world) -> frame: init with the previous camera pose inverse
    init = np.linalg.inv(poses[0])
    res = icp_projective(mp, mm, maps, intr, init=jnp.asarray(init, jnp.float32),
                         max_iters=25, dist_thr=0.08)
    T_wc_est = np.linalg.inv(np.asarray(res.T, np.float64))
    err = np.asarray(se3.se3_log(jnp.asarray(
        np.linalg.inv(T_new) @ T_wc_est, jnp.float32)))
    assert np.linalg.norm(err[:3]) < 0.01, f"frame-to-model terr {err[:3]}"
    assert np.linalg.norm(err[3:]) < 0.02
