"""The fully-fused device SLAM step (odometry + fusion, one dispatch) must
track and reconstruct like the host-driven pipeline."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from azurekinect3dreconstruction_tpu.config import (
    OdometryConfig,
    PipelineConfig,
    TSDFConfig,
)
from azurekinect3dreconstruction_tpu.core import se3
from azurekinect3dreconstruction_tpu.core.camera import Intrinsics, pixel_rays
from azurekinect3dreconstruction_tpu.io.synthetic import SyntheticCamera, orbit_trajectory
from azurekinect3dreconstruction_tpu.ops.image import rgb_to_intensity
from azurekinect3dreconstruction_tpu.pipelines.mono_odometry_tsdf import (
    make_device_slam_batch,
)
from azurekinect3dreconstruction_tpu.tsdf import volume as tsdf

CFG = PipelineConfig(
    tsdf=TSDFConfig(voxel_size=0.02, sdf_trunc=0.08, block_resolution=16,
                    block_capacity=1024, hash_capacity=4096),
    odometry=OdometryConfig(pyramid_iters=(8, 8, 8)),
)


@pytest.mark.slow
def test_device_slam_batch_tracks_and_fuses():
    cam = SyntheticCamera(intrinsics=Intrinsics.azure_kinect_depth_nfov().scaled(0.25))
    intr = cam.intrinsics
    rays = pixel_rays(intr)
    poses = orbit_trajectory(6, radius=0.25, angle_span=0.5)
    depths, intens, colors = [], [], []
    for T in poses:
        z, c = cam.render(np.asarray(T, np.float32))
        depths.append(z)
        colors.append(c)
        intens.append(rgb_to_intensity(c))
    batch = make_device_slam_batch(intr, CFG, worklist_size=512, stride=2,
                                   interpret=True)
    vol = tsdf.create(CFG.tsdf)
    # world frame = first camera; frame 0 is integrated at identity first
    from azurekinect3dreconstruction_tpu.ops.pallas.tsdf_kernels import integrate_step

    vol = jax.jit(
        lambda v, d, c, r: integrate_step(v, d, c, jnp.eye(4, dtype=jnp.float32),
                                          r, intr, CFG.tsdf, 512, 2, True)
    )(vol, depths[0], colors[0], rays)

    vol, traj, fits = batch(vol, jnp.eye(4, dtype=jnp.float32),
                            jnp.stack(intens), jnp.stack(depths),
                            jnp.stack(colors), rays)
    traj = np.asarray(traj)
    fits = np.asarray(fits)
    assert (fits > 0.5).all(), f"odometry fitness dropped: {fits}"
    # final pose vs ground-truth relative motion
    T_true = np.linalg.inv(poses[0]) @ poses[-1]
    err = np.asarray(se3.se3_log(jnp.asarray(
        np.linalg.inv(T_true) @ traj[-1], jnp.float32)))
    assert np.linalg.norm(err[:3]) < 0.03
    assert np.linalg.norm(err[3:]) < 0.05
    assert int(vol.n_blocks) > 50
