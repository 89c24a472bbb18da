import numpy as np
import jax.numpy as jnp

from azurekinect3dreconstruction_tpu.core.camera import (
    CameraCalibration,
    Intrinsics,
    pixel_rays,
)
from azurekinect3dreconstruction_tpu.io.synthetic import Scene, Sphere, SyntheticCamera
from azurekinect3dreconstruction_tpu.ops.depth_to_color import transformed_depth


def make_calib():
    depth_i = Intrinsics.azure_kinect_depth_nfov().scaled(0.25)
    color_i = Intrinsics.azure_kinect_color_720p().scaled(0.25)
    T = np.eye(4)
    T[0, 3] = -0.032  # 32 mm baseline
    return CameraCalibration(depth=depth_i, color=color_i,
                             T_color_depth=tuple(map(tuple, T.tolist())))


def test_transformed_depth_matches_direct_render():
    """Reprojected depth must match rendering the scene directly from the
    color camera's pose (up to occlusion/splatting at edges)."""
    calib = make_calib()
    scene = Scene(spheres=(Sphere((0.0, 0.0, 1.2), 0.3),))
    cam_d = SyntheticCamera(scene=scene, intrinsics=calib.depth)
    cam_c = SyntheticCamera(scene=scene, intrinsics=calib.color)

    z_d, _ = cam_d.render(np.eye(4, dtype=np.float32))
    # color camera pose in world = T_world_depth @ inv(T_color_depth)... here
    # depth camera is at identity, so color cam pose = inv(T_color_depth)
    T_cd = calib.color_from_depth
    z_c_direct, _ = cam_c.render(np.linalg.inv(T_cd).astype(np.float32))

    rays = pixel_rays(calib.depth)
    z_c = np.asarray(transformed_depth(z_d, rays, calib, fill_holes=1, splat=2))
    direct = np.asarray(z_c_direct)

    both = (z_c > 0) & (direct > 0)
    assert both.sum() > 500
    err = np.abs(z_c[both] - direct[both])
    # median error well under a centimeter; occlusion boundaries may differ
    assert np.median(err) < 0.005, f"median reprojection error {np.median(err)}"
    assert (err < 0.02).mean() > 0.95
    # coverage: most directly-visible pixels that fall inside the depth
    # camera's frustum must be filled
    filled = (z_c > 0)[direct > 0].mean()
    assert filled > 0.6


def test_transformed_depth_empty_input():
    calib = make_calib()
    rays = pixel_rays(calib.depth)
    z = jnp.zeros((calib.depth.height, calib.depth.width), jnp.float32)
    out = np.asarray(transformed_depth(z, rays, calib))
    assert (out == 0).all()
