import numpy as np

from azurekinect3dreconstruction_tpu.core.camera import Intrinsics
from azurekinect3dreconstruction_tpu.core.types import RGBDFrame
from azurekinect3dreconstruction_tpu.io.replay import FrameRecorder, NpzReplaySource
from azurekinect3dreconstruction_tpu.io.synthetic import (
    Scene,
    Sphere,
    SyntheticCamera,
    orbit_trajectory,
)
from azurekinect3dreconstruction_tpu.ops.backproject import backproject_intrinsics


def test_sphere_depth_analytic(synthetic_camera):
    """Depth at pixels hitting the front sphere must satisfy |p - c| = r."""
    z, color = synthetic_camera.render()
    intr = synthetic_camera.intrinsics
    pts = np.asarray(backproject_intrinsics(z, intr))
    zz = np.asarray(z)
    sph = synthetic_camera.scene.spheres[0]
    d_to_center = np.linalg.norm(pts - np.asarray(sph.center), axis=-1)
    on_sphere = (np.abs(d_to_center - sph.radius) < 1e-3) & (zz > 0)
    # the front sphere must occupy a meaningful chunk of the image
    assert on_sphere.sum() > 0.01 * zz.size
    # and nothing ever lands strictly inside any sphere
    for s in synthetic_camera.scene.spheres:
        dist = np.linalg.norm(pts[zz > 0] - np.asarray(s.center), axis=-1)
        assert (dist > s.radius - 2e-3).all()


def test_capture_raw_format(synthetic_camera):
    depth, rgb = synthetic_camera.capture()
    assert depth.dtype == np.uint16 and rgb.dtype == np.uint8
    assert depth.shape == rgb.shape[:2]
    assert depth.max() > 500  # something within a couple of meters, in mm


def test_rgbd_frame_from_raw(synthetic_camera):
    depth, rgb = synthetic_camera.capture()
    frame = RGBDFrame.from_raw(depth, rgb, depth_scale=1000.0, depth_trunc=3.0)
    d = np.asarray(frame.depth)
    assert d.max() < 3.0
    assert (d[d > 0] > 0.1).all()
    inten = np.asarray(frame.intensity)
    assert inten.min() >= 0.0 and inten.max() <= 1.0


def test_npz_record_replay_roundtrip(tmp_path, synthetic_camera):
    rec = FrameRecorder(str(tmp_path), calibration=None)
    frames = []
    for T in orbit_trajectory(3):
        d, c = synthetic_camera.capture(T)
        frames.append((d, c))
        rec.write(d, c)
    src = NpzReplaySource(str(tmp_path))
    assert len(src) == 3
    for (d0, c0), (d1, c1) in zip(frames, src):
        np.testing.assert_array_equal(d0, d1)
        np.testing.assert_array_equal(c0, c1)


def test_replay_bgra_conversion(tmp_path):
    """Raw k4a captures are BGRA; replay must hand back RGB (reference drops
    alpha and reverses channels, bundlefusion_reconstruction.py:67-101)."""
    depth = np.zeros((4, 4), np.uint16)
    bgra = np.zeros((4, 4, 4), np.uint8)
    bgra[..., 0] = 10  # B
    bgra[..., 1] = 20  # G
    bgra[..., 2] = 30  # R
    bgra[..., 3] = 255
    rec = FrameRecorder(str(tmp_path))
    rec.write(depth, bgra)
    (d, c), = list(NpzReplaySource(str(tmp_path)))
    assert c.shape == (4, 4, 3)
    assert (c[..., 0] == 30).all() and (c[..., 2] == 10).all()


def test_orbit_trajectory_poses_valid():
    from azurekinect3dreconstruction_tpu.core import se3

    for T in orbit_trajectory(10):
        assert se3.is_valid_transform(T)


def test_view_overlap_between_consecutive_frames(synthetic_camera):
    """Consecutive orbit frames must see mostly the same surface (tracking
    pipelines depend on this)."""
    poses = orbit_trajectory(5)
    z0, _ = synthetic_camera.render(poses[0])
    z1, _ = synthetic_camera.render(poses[1])
    v0 = np.asarray(z0) > 0
    v1 = np.asarray(z1) > 0
    inter = (v0 & v1).sum()
    assert inter > 0.7 * min(v0.sum(), v1.sum())


def test_from_raw_float_color_intensity_consistent():
    """Float-color path: intensity must be computed from the CLIPPED color,
    so out-of-range float input (e.g. [0,255] handed in un-normalized)
    cannot feed the photometric odometry an intensity inconsistent with the
    stored color."""
    from azurekinect3dreconstruction_tpu.core.types import RGBDFrame

    d = np.full((8, 8), 1000, np.uint16)
    c = np.full((8, 8, 3), 200.0, np.float32)  # out of [0,1] by 200x
    f = RGBDFrame.from_raw(d, c, 1000.0, 3.0, 0.1)
    assert float(f.color.max()) == 1.0
    assert float(f.intensity.max()) <= 1.0 + 1e-6
