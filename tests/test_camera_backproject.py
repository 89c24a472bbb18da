import jax.numpy as jnp
import numpy as np

from azurekinect3dreconstruction_tpu.core.camera import (
    CameraCalibration,
    Distortion,
    Intrinsics,
    pixel_rays,
)
from azurekinect3dreconstruction_tpu.ops.backproject import (
    backproject_intrinsics,
    bilinear_sample,
    project_points,
)


def numpy_backproject(depth, intr):
    """Independent numpy reference: the textbook pinhole backprojection used
    by Open3D's create_from_depth_image (reference Depth2PC.py:60-84)."""
    h, w = depth.shape
    v, u = np.mgrid[0:h, 0:w]
    z = depth
    x = (u - intr.cx) / intr.fx * z
    y = (v - intr.cy) / intr.fy * z
    return np.stack([x, y, z], axis=-1)


def test_backproject_matches_numpy():
    intr = Intrinsics.azure_kinect_depth_nfov()
    rng = np.random.RandomState(0)
    depth = rng.uniform(0.5, 3.0, (intr.height, intr.width)).astype(np.float32)
    pts = np.asarray(backproject_intrinsics(jnp.asarray(depth), intr))
    np.testing.assert_allclose(pts, numpy_backproject(depth, intr), rtol=1e-5, atol=1e-5)


def test_project_backproject_roundtrip():
    intr = Intrinsics.primesense_default()
    rng = np.random.RandomState(1)
    depth = rng.uniform(0.5, 3.0, (intr.height, intr.width)).astype(np.float32)
    pts = backproject_intrinsics(jnp.asarray(depth), intr)
    uv, z = project_points(pts, intr)
    v, u = np.mgrid[0 : intr.height, 0 : intr.width]
    np.testing.assert_allclose(np.asarray(uv[..., 0]), u, atol=1e-2)
    np.testing.assert_allclose(np.asarray(uv[..., 1]), v, atol=1e-2)
    np.testing.assert_allclose(np.asarray(z), depth, atol=1e-6)


def test_distortion_roundtrip():
    dist = Distortion(k1=0.1, k2=-0.05, p1=1e-3, p2=-5e-4, k3=0.01)
    rng = np.random.RandomState(2)
    xn = jnp.asarray(rng.uniform(-0.5, 0.5, 200).astype(np.float32))
    yn = jnp.asarray(rng.uniform(-0.5, 0.5, 200).astype(np.float32))
    xd, yd = dist.distort(xn, yn)
    xu, yu = dist.undistort(xd, yd, iters=10)
    np.testing.assert_allclose(np.asarray(xu), np.asarray(xn), atol=1e-5)
    np.testing.assert_allclose(np.asarray(yu), np.asarray(yn), atol=1e-5)


def test_pixel_rays_undistorted_center():
    intr = Intrinsics(64, 48, 60.0, 60.0, 31.5, 23.5)
    rays = np.asarray(pixel_rays(intr))
    # ray at the principal point is (0, 0)
    np.testing.assert_allclose(rays[23, 31], [(31 - 31.5) / 60.0, (23 - 23.5) / 60.0], atol=1e-6)


def test_intrinsics_scaled():
    intr = Intrinsics.azure_kinect_depth_nfov()
    half = intr.scaled(0.5)
    assert (half.width, half.height) == (320, 288)
    np.testing.assert_allclose(half.fx, intr.fx * 0.5)


def test_calibration_json_roundtrip(tmp_path):
    cal = CameraCalibration.azure_kinect_nominal(serial="000123")
    s = cal.to_json()
    cal2 = CameraCalibration.from_json(s)
    assert cal2.serial == "000123"
    np.testing.assert_allclose(cal2.color_from_depth, cal.color_from_depth)
    assert cal2.depth == cal.depth


def test_bilinear_sample_exact_on_grid():
    rng = np.random.RandomState(3)
    img = rng.uniform(0, 1, (16, 20)).astype(np.float32)
    uv = jnp.asarray(np.stack(np.meshgrid(np.arange(19), np.arange(15)), axis=-1), dtype=jnp.float32)
    val, inb = bilinear_sample(jnp.asarray(img), uv)
    np.testing.assert_allclose(np.asarray(val), img[:15, :19], atol=1e-6)
    assert bool(np.asarray(inb).all())


def test_bilinear_sample_interpolates():
    img = jnp.asarray(np.array([[0.0, 1.0], [2.0, 3.0]], dtype=np.float32))
    val, inb = bilinear_sample(img, jnp.asarray([[0.5, 0.5]], dtype=jnp.float32))
    np.testing.assert_allclose(np.asarray(val), [1.5], atol=1e-6)
