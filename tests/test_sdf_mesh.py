"""First-party cloud->mesh (oriented-point SDF splat + marching cubes) —
the Open3D-free replacement for the reference's Poisson path
(CreateMesh.py:32-70, PointCloudToMesh.py)."""

import numpy as np
import pytest

from azurekinect3dreconstruction_tpu.core.types import PointCloudHost
from azurekinect3dreconstruction_tpu.meshing.sdf_mesh import sdf_mesh_from_cloud


def _sphere_cloud(n=20000, r=0.15, center=(0.0, 0.0, 0.5), seed=0,
                  with_normals=True, with_colors=True):
    rng = np.random.RandomState(seed)
    d = rng.normal(size=(n, 3))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    pts = (d * r + np.asarray(center)).astype(np.float32)
    return PointCloudHost(
        points=pts,
        normals=d.astype(np.float32) if with_normals else None,
        colors=(d * 0.5 + 0.5).astype(np.float32) if with_colors else None,
    ), np.asarray(center), r


def test_sdf_mesh_reconstructs_sphere():
    cloud, center, r = _sphere_cloud()
    mesh = sdf_mesh_from_cloud(cloud, voxel=0.008)
    assert mesh is not None and mesh.triangles.shape[0] > 2000
    rad = np.linalg.norm(mesh.vertices - center, axis=1)
    rmse = np.sqrt(((rad - r) ** 2).mean())
    # surface recovered well below a voxel (Poisson-parity quality bar)
    assert rmse < 0.002, f"radius rmse {rmse * 1000:.2f}mm"
    # colors interpolated from the splats: outward direction encoded
    assert mesh.vertex_colors is not None
    dirs = (mesh.vertices - center) / rad[:, None]
    err = np.abs(mesh.vertex_colors - (dirs * 0.5 + 0.5)).mean()
    assert err < 0.08, f"color err {err}"
    # normals point outward (winding + gradient convention)
    assert mesh.vertex_normals is not None
    out_frac = ((mesh.vertex_normals * dirs).sum(1) > 0).mean()
    assert out_frac > 0.95


def test_sdf_mesh_estimates_normals_when_missing():
    cloud, center, r = _sphere_cloud(with_normals=False, with_colors=False)
    # viewpoint far outside the sphere orients the estimated normals
    mesh = sdf_mesh_from_cloud(cloud, voxel=0.01,
                               viewpoint=(0.0, 0.0, -2.0))
    assert mesh is not None and mesh.triangles.shape[0] > 1000
    rad = np.linalg.norm(mesh.vertices - center, axis=1)
    # visible hemisphere reconstructed; orientation flips would produce
    # garbage far off the sphere
    assert np.sqrt(((rad - r) ** 2).mean()) < 0.004
    assert mesh.vertex_colors is None


def test_sdf_mesh_too_few_points():
    cloud = PointCloudHost(points=np.zeros((3, 3), np.float32))
    assert sdf_mesh_from_cloud(cloud) is None
