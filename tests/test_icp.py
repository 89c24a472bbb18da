import jax.numpy as jnp
import numpy as np
import pytest

from azurekinect3dreconstruction_tpu.core import se3
from azurekinect3dreconstruction_tpu.core.camera import Intrinsics, pixel_rays
from azurekinect3dreconstruction_tpu.io.synthetic import SyntheticCamera
from azurekinect3dreconstruction_tpu.ops.backproject import backproject_depth
from azurekinect3dreconstruction_tpu.ops.image import rgb_to_intensity
from azurekinect3dreconstruction_tpu.ops.normals import organized_normals
from azurekinect3dreconstruction_tpu.tracking.icp import (
    TargetMaps,
    colored_icp,
    icp_projective,
)


@pytest.fixture(scope="module")
def cam():
    return SyntheticCamera(intrinsics=Intrinsics.azure_kinect_depth_nfov().scaled(0.25))


def make_cloud(cam, T_pose):
    z, c = cam.render(np.asarray(T_pose, np.float32))
    rays = pixel_rays(cam.intrinsics)
    pts = backproject_depth(z, rays)
    mask = np.asarray(z) > 0
    inten = rgb_to_intensity(c)
    return pts.reshape(-1, 3), jnp.asarray(mask.reshape(-1)), inten.reshape(-1), (z, c)


def pose_error(T_est, T_true):
    d = np.asarray(se3.se3_log(jnp.asarray(
        np.linalg.inv(T_true) @ np.asarray(T_est), jnp.float32)))
    return np.linalg.norm(d[:3]), np.linalg.norm(d[3:])


def test_organized_normals_on_plane():
    intr = Intrinsics.azure_kinect_depth_nfov().scaled(0.25)
    rays = pixel_rays(intr)
    # fronto-parallel plane at z = 1.5
    depth = jnp.full((intr.height, intr.width), 1.5, jnp.float32)
    pts = backproject_depth(depth, rays)
    n = np.asarray(organized_normals(pts))
    interior = n[5:-5, 5:-5]
    # normal must be (0,0,-1): toward the camera
    assert np.allclose(np.abs(interior[..., 2]), 1.0, atol=1e-4)
    assert (interior[..., 2] < 0).all()


def test_organized_normals_on_sphere(cam):
    z, _ = cam.render(np.eye(4, dtype=np.float32))
    rays = pixel_rays(cam.intrinsics)
    pts = backproject_depth(z, rays)
    n = np.asarray(organized_normals(pts))
    p = np.asarray(pts)
    sph = cam.scene.spheres[0]
    on = (np.abs(np.linalg.norm(p - np.asarray(sph.center), axis=-1) - sph.radius) < 1e-3)
    on &= np.sum(n * n, axis=-1) > 0.5
    true_n = (p - np.asarray(sph.center)) / sph.radius
    cosang = np.abs(np.sum(n * true_n, axis=-1))
    assert cosang[on].mean() > 0.98


@pytest.mark.parametrize("seed", range(2))
def test_icp_point_to_plane_recovers_motion(cam, seed):
    rng = np.random.RandomState(seed)
    xi = np.concatenate([rng.uniform(-0.02, 0.02, 3), rng.uniform(-0.02, 0.02, 3)])
    T_motion = np.asarray(se3.se3_exp(jnp.asarray(xi, jnp.float32)))
    src, smask, _, _ = make_cloud(cam, np.eye(4))
    _, _, _, (z1, c1) = make_cloud(cam, T_motion)
    tgt = TargetMaps.from_depth(z1, cam.intrinsics)
    T_true = np.linalg.inv(T_motion)
    res = icp_projective(src, smask, tgt, cam.intrinsics, max_iters=25, dist_thr=0.1)
    terr, rerr = pose_error(np.asarray(res.T), T_true)
    assert terr < 4e-3 and rerr < 3e-3, (terr, rerr)
    assert float(res.fitness) > 0.7
    assert float(res.inlier_rmse) < 0.01


def test_colored_icp_recovers_slide_along_plane():
    """A camera translating parallel to a textured floor: pure point-to-plane
    is ill-constrained along the plane; the color term pins it (the reason
    the reference uses colored ICP, GoodColorReconstruction.py:246-254)."""
    from azurekinect3dreconstruction_tpu.io.synthetic import Plane, Scene

    scene = Scene(planes=(Plane((0.0, 0.4, 0.0), (0.0, -1.0, 0.0),
                                (0.7, 0.7, 0.7), checker=0.2),))
    cam = SyntheticCamera(scene=scene,
                          intrinsics=Intrinsics.azure_kinect_depth_nfov().scaled(0.25))
    # look down at the floor
    look = np.eye(4)
    look[:3, :3] = se3.matrix_from_rpy(-np.pi / 2.5, 0, 0)
    slide = look.copy()
    slide[0, 3] += 0.03  # 3 cm lateral slide
    src, smask, sint, _ = make_cloud(cam, look)
    _, _, _, (z1, c1) = make_cloud(cam, slide)
    inten1 = rgb_to_intensity(c1)
    tgt = TargetMaps.from_depth(z1, cam.intrinsics, intensity=inten1)
    T_true = np.linalg.inv(slide) @ look

    res_geo = icp_projective(src, smask, tgt, cam.intrinsics, max_iters=30, dist_thr=0.1)
    res_col = colored_icp(src, sint, smask, tgt, cam.intrinsics)
    terr_g, _ = pose_error(np.asarray(res_geo.T), T_true)
    terr_c, _ = pose_error(np.asarray(res_col.T), T_true)
    assert terr_c < 5e-3, f"colored ICP failed: {terr_c}"
    # colored must beat geometry-only on this degenerate case
    assert terr_c < terr_g


def test_icp_fitness_low_for_nonoverlapping(cam):
    src, smask, _, _ = make_cloud(cam, np.eye(4))
    # target looking away
    T_away = np.eye(4)
    T_away[:3, :3] = se3.matrix_from_rpy(0, np.pi, 0)
    _, _, _, (z1, _) = make_cloud(cam, T_away)
    tgt = TargetMaps.from_depth(z1, cam.intrinsics)
    res = icp_projective(src, smask, tgt, cam.intrinsics, max_iters=10, dist_thr=0.05)
    assert float(res.fitness) < 0.3  # the reference's reject gate territory
