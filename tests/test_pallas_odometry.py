"""The Pallas warp-and-reduce odometry must converge to the XLA reference's
pose (the source-gradient swap changes the GN path, not the fixed point)."""

import jax.numpy as jnp
import numpy as np
import pytest

from azurekinect3dreconstruction_tpu.config import OdometryConfig
from azurekinect3dreconstruction_tpu.core import se3
from azurekinect3dreconstruction_tpu.core.camera import Intrinsics
from azurekinect3dreconstruction_tpu.io.synthetic import SyntheticCamera
from azurekinect3dreconstruction_tpu.ops.image import rgb_to_intensity
from azurekinect3dreconstruction_tpu.ops.pallas.odometry_kernels import (
    compute_odometry_tpu,
)
from azurekinect3dreconstruction_tpu.tracking.odometry import compute_odometry

CFG = OdometryConfig(pyramid_iters=(8, 8, 8))


@pytest.fixture(scope="module")
def pair():
    intr = Intrinsics.azure_kinect_depth_nfov().scaled(0.25)
    cam = SyntheticCamera(intrinsics=intr)
    rng = np.random.RandomState(3)
    xi = np.concatenate([rng.uniform(-0.02, 0.02, 3), rng.uniform(-0.02, 0.02, 3)])
    T_motion = np.asarray(se3.se3_exp(jnp.asarray(xi, jnp.float32)))
    z0, c0 = cam.render(np.eye(4, dtype=np.float32))
    z1, c1 = cam.render(np.asarray(T_motion, np.float32))
    return (intr, rgb_to_intensity(c0), z0, rgb_to_intensity(c1), z1,
            np.linalg.inv(T_motion))


def _err(T_est, T_true):
    d = np.asarray(se3.se3_log(jnp.asarray(
        np.linalg.inv(T_true) @ np.asarray(T_est), jnp.float32)))
    return np.linalg.norm(d[:3]), np.linalg.norm(d[3:])


def test_pallas_odometry_converges_like_reference(pair):
    intr, i0, z0, i1, z1, T_true = pair
    ref = compute_odometry(i0, z0, i1, z1, intr, CFG)
    res = compute_odometry_tpu(i0, z0, i1, z1, intr, CFG, interpret=True)
    t_ref, r_ref = _err(ref.T_target_source, T_true)
    t_pal, r_pal = _err(res.T_target_source, T_true)
    # both must land at the (resolution-limited) optimum
    assert t_pal < max(2.0 * t_ref, 5e-3), (t_pal, t_ref)
    assert r_pal < max(2.0 * r_ref, 3e-3)
    assert abs(float(res.fitness) - float(ref.fitness)) < 0.1


def test_pallas_odometry_identity(pair):
    intr, i0, z0, _, _, _ = pair
    res = compute_odometry_tpu(i0, z0, i0, z0, intr, CFG, interpret=True)
    t, r = _err(res.T_target_source, np.eye(4))
    assert t < 1e-4 and r < 1e-4
    assert float(res.fitness) > 0.95


def test_pallas_odometry_respects_init(pair):
    intr, i0, z0, i1, z1, T_true = pair
    init = jnp.asarray(np.asarray(se3.se3_exp(jnp.asarray(
        np.asarray(se3.se3_log(jnp.asarray(T_true, jnp.float32))) * 0.7,
        jnp.float32))), jnp.float32)
    res = compute_odometry_tpu(i0, z0, i1, z1, intr,
                               OdometryConfig(pyramid_iters=(6, 4, 2)),
                               init=init, interpret=True)
    t, r = _err(res.T_target_source, T_true)
    assert t < 6e-3 and r < 4e-3


def test_convergence_early_exit_matches_iteration_cap(pair):
    """convergence_delta coverage: a huge tolerance exits after ONE applied
    step per level, which must equal a (1,1,1) iteration schedule with the
    exit disabled — exercising the conv-flag lanes and the
    unwritten-output-retention the skip path relies on."""
    import dataclasses

    intr, i0, z0, i1, z1, _ = pair
    one = dataclasses.replace(CFG, pyramid_iters=(1, 1, 1),
                              convergence_delta=0.0)
    early = dataclasses.replace(CFG, convergence_delta=1e9)
    r_one = compute_odometry_tpu(i0, z0, i1, z1, intr, one, interpret=True)
    r_early = compute_odometry_tpu(i0, z0, i1, z1, intr, early, interpret=True)
    np.testing.assert_allclose(np.asarray(r_early.T_target_source),
                               np.asarray(r_one.T_target_source), atol=1e-6)
    np.testing.assert_allclose(float(r_early.fitness), float(r_one.fitness),
                               atol=1e-6)
