"""First-party ball-pivoting reconstruction (meshing/ball_pivot.py) — the
Open3D-free equivalent of the reference's BPA fallback rung
(CodeThatKindaWorks/PointCloudToMesh.py:139-148, radii ladder :146)."""

from collections import Counter

import numpy as np

from azurekinect3dreconstruction_tpu.core.types import PointCloudHost
from azurekinect3dreconstruction_tpu.meshing.ball_pivot import (
    ball_pivot,
    ball_pivot_mesh,
)


def _fib_sphere(n=1500, r=0.3):
    """Deterministic near-uniform sphere samples (spacing ~ sqrt(4*pi*r^2/n))
    with exact outward normals."""
    i = np.arange(n) + 0.5
    phi = np.arccos(1.0 - 2.0 * i / n)
    th = np.pi * (1.0 + 5.0 ** 0.5) * i
    pts = r * np.stack([np.sin(phi) * np.cos(th),
                        np.sin(phi) * np.sin(th),
                        np.cos(phi)], -1)
    return pts, pts / r


def test_ball_pivot_sphere_watertight_manifold():
    """On a uniformly sampled sphere one suitable radius must close the
    surface completely: every vertex referenced, every edge shared by
    exactly two triangles (2-manifold), Euler counts of a watertight genus-0
    mesh (F = 2V - 4, E = 3V - 6), all faces wound outward — the quality
    Open3D's BPA delivers on the same input."""
    pts, nrm = _fib_sphere(1500, 0.3)
    tris = ball_pivot(pts, nrm, radii=[0.03])
    n = len(pts)
    assert len(np.unique(tris)) == n, "some points never reached"
    assert len(tris) == 2 * n - 4, (len(tris), 2 * n - 4)
    cnt = Counter()
    for a, b, c in tris:
        for u, v in ((a, b), (b, c), (c, a)):
            cnt[(min(u, v), max(u, v))] += 1
    assert set(cnt.values()) == {2}, "non-manifold or boundary edges"
    assert len(cnt) == 3 * n - 6
    fn = np.cross(pts[tris[:, 1]] - pts[tris[:, 0]],
                  pts[tris[:, 2]] - pts[tris[:, 0]])
    ctr = pts[tris].mean(1)
    assert (np.einsum("ij,ij->i", fn, ctr) > 0).all(), "inward-wound face"


def test_ball_pivot_interpolates_no_new_vertices():
    """BPA interpolates the input points — vertices are the cloud itself, so
    a noiseless sphere meshes with ZERO radial error (the property that
    distinguishes it from approximating meshers like Poisson/SDF-splat)."""
    pts, nrm = _fib_sphere(800, 0.2)
    mesh = ball_pivot_mesh(
        PointCloudHost(points=pts.astype(np.float32),
                       normals=nrm.astype(np.float32)),
        radii=[0.025, 0.05])
    assert mesh is not None
    np.testing.assert_array_equal(mesh.vertices,
                                  pts.astype(np.float32))
    rad = np.linalg.norm(mesh.vertices[np.unique(mesh.triangles)], axis=1)
    rmse = float(np.sqrt(((rad - 0.2) ** 2).mean()))
    assert rmse < 1e-6, f"radius rmse {rmse * 1000:.4f}mm"


def test_ball_pivot_radius_ladder_bridges_sparse_regions():
    """The multi-radius ladder (reference radii :146): a ball sized for the
    dense half of a plane cannot cross its sparse half; the next rungs must
    bridge it. Checks the exact failure the ladder exists for."""
    rng = np.random.default_rng(3)
    xs_d = np.arange(0.0, 0.2, 0.005)
    xs_s = np.arange(0.2, 0.4, 0.015)
    ys_d = np.arange(0.0, 0.2, 0.005)
    ys_s = np.arange(0.0, 0.2, 0.015)
    Pd = np.stack(np.meshgrid(xs_d, ys_d, indexing="ij"), -1).reshape(-1, 2)
    Ps = np.stack(np.meshgrid(xs_s, ys_s, indexing="ij"), -1).reshape(-1, 2)
    P = np.concatenate([Pd, Ps])
    pts = np.concatenate([P, np.zeros((len(P), 1))], 1)
    pts += rng.normal(0.0, 1e-4, pts.shape)
    nrm = np.tile([0.0, 0.0, 1.0], (len(P), 1))
    small = ball_pivot(pts, nrm, radii=[0.008])
    ladder = ball_pivot(pts, nrm, radii=[0.008, 0.016, 0.032])
    sparse_idx = np.arange(len(Pd), len(P))
    cov_small = np.isin(sparse_idx, np.unique(small)).mean()
    cov_ladder = np.isin(sparse_idx, np.unique(ladder)).mean()
    assert cov_small < 0.5, "small ball should not cross the sparse half"
    assert cov_ladder > 0.95, f"ladder left the sparse half open ({cov_ladder})"
    # dense half fully meshed in both
    dense_idx = np.arange(len(Pd))
    assert np.isin(dense_idx, np.unique(small)).mean() > 0.95


def test_ball_pivot_mesh_guards():
    assert ball_pivot_mesh(PointCloudHost(
        points=np.zeros((2, 3), np.float32))) is None
    # no normals -> refuse (callers estimate them; silence would mis-orient)
    pts, _ = _fib_sphere(200, 0.1)
    assert ball_pivot_mesh(PointCloudHost(
        points=pts.astype(np.float32))) is None


def test_ball_pivot_fallback_chain_without_open3d(monkeypatch):
    """meshing.poisson.ball_pivot_mesh_from_cloud must route to the
    first-party BPA when Open3D is absent (the reference's fallback rung no
    longer silently disappears on a clean image)."""
    from azurekinect3dreconstruction_tpu.meshing import poisson as P

    monkeypatch.setattr(P, "_o3d", lambda: None)
    pts, nrm = _fib_sphere(600, 0.15)
    mesh = P.ball_pivot_mesh_from_cloud(
        PointCloudHost(points=pts.astype(np.float32),
                       normals=nrm.astype(np.float32)),
        radii=(0.02, 0.04))
    assert mesh is not None and mesh.triangles.shape[0] > 1000
