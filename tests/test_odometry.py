import jax.numpy as jnp
import numpy as np
import pytest

from azurekinect3dreconstruction_tpu.config import OdometryConfig
from azurekinect3dreconstruction_tpu.core import se3
from azurekinect3dreconstruction_tpu.core.camera import Intrinsics
from azurekinect3dreconstruction_tpu.io.synthetic import SyntheticCamera
from azurekinect3dreconstruction_tpu.tracking.odometry import compute_odometry

CFG = OdometryConfig(pyramid_iters=(10, 10, 10))


def render_pair(cam, T0, T1):
    z0, c0 = cam.render(np.asarray(T0, np.float32))
    z1, c1 = cam.render(np.asarray(T1, np.float32))
    inten = lambda c: 0.299 * c[..., 0] + 0.587 * c[..., 1] + 0.114 * c[..., 2]
    return inten(c0), z0, inten(c1), z1


@pytest.fixture(scope="module")
def cam():
    intr = Intrinsics.azure_kinect_depth_nfov().scaled(0.25)
    return SyntheticCamera(intrinsics=intr)


def pose_error(T_est, T_true):
    d = np.asarray(se3.se3_log(jnp.asarray(np.linalg.inv(T_true) @ np.asarray(T_est), jnp.float32)))
    return np.linalg.norm(d[:3]), np.linalg.norm(d[3:])


def test_identity_motion(cam):
    i0, z0, i1, z1 = render_pair(cam, np.eye(4), np.eye(4))
    res = compute_odometry(i0, z0, i1, z1, cam.intrinsics, CFG)
    T = np.asarray(res.T_target_source)
    terr, rerr = pose_error(T, np.eye(4))
    assert terr < 1e-4 and rerr < 1e-4
    assert float(res.fitness) > 0.95


@pytest.mark.parametrize("seed", range(3))
def test_recovers_small_motion(cam, seed):
    rng = np.random.RandomState(seed)
    xi = np.concatenate([rng.uniform(-0.02, 0.02, 3), rng.uniform(-0.02, 0.02, 3)])
    T_motion = np.asarray(se3.se3_exp(jnp.asarray(xi, jnp.float32)))  # cam1 pose in world
    # camera 0 at identity, camera 1 at T_motion (camera-to-world)
    i0, z0, i1, z1 = render_pair(cam, np.eye(4), T_motion)
    # ground truth target<-source: p_t = T_cam1^-1 @ T_cam0 @ p_s (source=frame0, target=frame1)
    T_true = np.linalg.inv(T_motion)
    res = compute_odometry(i0, z0, i1, z1, cam.intrinsics, CFG)
    terr, rerr = pose_error(np.asarray(res.T_target_source), T_true)
    # quarter-resolution floor: ~0.1 px subpixel accuracy = ~1-3 mm at 1.5 m
    assert terr < 5e-3, f"translation error {terr}"
    assert rerr < 3e-3, f"rotation error {rerr}"
    assert float(res.fitness) > 0.7


def test_larger_motion_with_pyramid(cam):
    xi = np.array([0.04, -0.02, 0.03, 0.03, -0.04, 0.02])
    T_motion = np.asarray(se3.se3_exp(jnp.asarray(xi, jnp.float32)))
    i0, z0, i1, z1 = render_pair(cam, np.eye(4), T_motion)
    T_true = np.linalg.inv(T_motion)
    res = compute_odometry(i0, z0, i1, z1, cam.intrinsics,
                           OdometryConfig(pyramid_iters=(10, 10, 15)))
    terr, rerr = pose_error(np.asarray(res.T_target_source), T_true)
    assert terr < 5e-3 and rerr < 5e-3


def test_init_guess_helps():
    intr = Intrinsics.azure_kinect_depth_nfov().scaled(0.125)
    cam = SyntheticCamera(intrinsics=intr)
    xi = np.array([0.08, 0.0, 0.0, 0.0, 0.06, 0.0])
    T_motion = np.asarray(se3.se3_exp(jnp.asarray(xi, jnp.float32)))
    i0, z0, i1, z1 = render_pair(cam, np.eye(4), T_motion)
    T_true = np.linalg.inv(T_motion)
    # seed with 80% of the truth (motion-prediction pattern from the
    # reference's trajectory extrapolation, GoodColorReconstruction.py:238-244)
    init = np.asarray(se3.se3_exp(jnp.asarray(
        se3.se3_log(jnp.asarray(T_true, jnp.float32)) * 0.8, jnp.float32)))
    res = compute_odometry(i0, z0, i1, z1, intr,
                           OdometryConfig(pyramid_iters=(8, 8, 8)), init=init)
    terr, rerr = pose_error(np.asarray(res.T_target_source), T_true)
    assert terr < 5e-3 and rerr < 5e-3


def test_color_and_depth_terms(cam):
    xi = np.array([0.01, 0.01, -0.01, 0.01, -0.01, 0.01])
    T_motion = np.asarray(se3.se3_exp(jnp.asarray(xi, jnp.float32)))
    i0, z0, i1, z1 = render_pair(cam, np.eye(4), T_motion)
    T_true = np.linalg.inv(T_motion)
    for term in ("color", "depth", "hybrid"):
        res = compute_odometry(i0, z0, i1, z1, cam.intrinsics,
                               OdometryConfig(pyramid_iters=(10, 10, 10), term=term))
        terr, rerr = pose_error(np.asarray(res.T_target_source), T_true)
        assert terr < 8e-3 and rerr < 8e-3, f"term={term}: {terr}, {rerr}"
