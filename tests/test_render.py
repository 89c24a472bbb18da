"""First-party preview renderer (viz.render): shaded pixels without GL."""

import os
import zlib

import numpy as np

from azurekinect3dreconstruction_tpu.core.types import PointCloudHost
from azurekinect3dreconstruction_tpu.meshing.sdf_mesh import sdf_mesh_from_cloud
from azurekinect3dreconstruction_tpu.viz.render import (
    render_mesh,
    render_points,
    save_turntable,
    write_png,
)


def _sphere_mesh():
    rng = np.random.RandomState(0)
    d = rng.normal(size=(8000, 3))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    cloud = PointCloudHost(points=(d * 0.15).astype(np.float32)
                           + np.array([0, 0, 0.5], np.float32),
                           normals=d.astype(np.float32),
                           colors=np.full((8000, 3), [0.9, 0.3, 0.2],
                                          np.float32))
    return sdf_mesh_from_cloud(cloud, voxel=0.01)


def test_render_mesh_produces_shaded_object(tmp_path):
    mesh = _sphere_mesh()
    img = render_mesh(mesh, size=(320, 240))
    assert img.shape == (240, 320, 3) and img.dtype == np.uint8
    bg = np.array([18, 18, 24])
    is_obj = np.abs(img.astype(int) - bg).sum(-1) > 10
    frac = is_obj.mean()
    # the auto-framed sphere fills a meaningful part of the image
    assert 0.05 < frac < 0.9, frac
    # object is red-ish (albedo carried through shading)
    obj = img[is_obj].astype(np.float32)
    assert obj[:, 0].mean() > 1.5 * obj[:, 2].mean()
    # shading varies across the surface (not flat fill)
    assert obj[:, 0].std() > 12

    # PNG roundtrip: file decodes and matches shape
    p = write_png(str(tmp_path / "x.png"), img)
    raw = open(p, "rb").read()
    assert raw[:8] == b"\x89PNG\r\n\x1a\n"
    # IDAT payload inflates to h * (1 + w*3) bytes
    idat = raw[raw.index(b"IDAT") + 4:raw.rindex(b"IEND") - 4]
    assert len(zlib.decompress(idat)) == 240 * (1 + 320 * 3)


def test_render_points_zbuffer_orders_near_over_far(tmp_path):
    # two planes of points: near red, far blue, overlapping in image space
    n = 4000
    rng = np.random.RandomState(1)
    xy = rng.uniform(-0.2, 0.2, (n, 2))
    near = np.concatenate([xy, np.full((n, 1), 0.5)], 1).astype(np.float32)
    far = np.concatenate([xy, np.full((n, 1), 1.0)], 1).astype(np.float32)
    pts = np.concatenate([far, near])
    cols = np.concatenate([np.tile([0, 0, 1.0], (n, 1)),
                           np.tile([1.0, 0, 0], (n, 1))]).astype(np.float32)
    img = render_points(pts, cols, np.eye(4), size=(160, 120), point_px=3)
    red = (img[..., 0] > 180) & (img[..., 2] < 80)
    blue = (img[..., 2] > 180) & (img[..., 0] < 80)
    assert red.sum() > 50
    assert blue.sum() < red.sum() * 0.1, "far points must not overwrite near"


def test_turntable_saves_n_views(tmp_path):
    mesh = _sphere_mesh()
    paths = save_turntable(mesh, str(tmp_path / "tt"), n_views=4,
                           size=(160, 120))
    assert len(paths) == 4
    assert all(os.path.exists(p) for p in paths)
