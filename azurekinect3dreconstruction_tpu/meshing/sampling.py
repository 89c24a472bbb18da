"""Uniform surface sampling of triangle meshes (host-side numpy).

Open3D ``TriangleMesh.sample_points_uniformly`` analog — the fragment
pipeline registers 100k uniformly sampled mesh points with point-to-point
ICP (reference azure-kinect-DK/Reconstruction/3Dreconstruction.py:118-122,
mesh sampling; :112-135, registration) and the final scene is exported as a
sampled cloud (:217-232).

Sampling is area-weighted: triangle picked with probability proportional to
its area, point placed by uniform barycentric coordinates (the sqrt trick).
Host-side on purpose: sampling happens on already-extracted host meshes at
save/register time, not in the per-frame device hot loop.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from azurekinect3dreconstruction_tpu.core.types import PointCloudHost, TriangleMeshHost


def sample_points_uniformly(mesh: TriangleMeshHost, n: int = 100_000,
                            seed: Optional[int] = 0) -> PointCloudHost:
    """Area-uniform random samples on the mesh surface.

    Returns a PointCloudHost with interpolated colors/normals when the mesh
    carries them. ``seed=None`` uses nondeterministic entropy."""
    v = np.asarray(mesh.vertices, np.float64)
    t = np.asarray(mesh.triangles, np.int64)
    if len(t) == 0:
        return PointCloudHost(points=np.zeros((0, 3), np.float32))
    p0, p1, p2 = v[t[:, 0]], v[t[:, 1]], v[t[:, 2]]
    cross = np.cross(p1 - p0, p2 - p0)
    area = 0.5 * np.linalg.norm(cross, axis=1)
    total = area.sum()
    if total <= 0:
        return PointCloudHost(points=np.zeros((0, 3), np.float32))

    rng = np.random.default_rng(seed)
    tri = rng.choice(len(t), size=n, p=area / total)
    # uniform barycentric: u = 1-sqrt(r1), v = r2*sqrt(r1)
    r1 = np.sqrt(rng.random(n))
    r2 = rng.random(n)
    w0 = 1.0 - r1
    w1 = r1 * (1.0 - r2)
    w2 = r1 * r2

    def interp(attr):
        a0, a1, a2 = attr[t[tri, 0]], attr[t[tri, 1]], attr[t[tri, 2]]
        return (w0[:, None] * a0 + w1[:, None] * a1 + w2[:, None] * a2)

    pts = interp(v).astype(np.float32)
    colors = None
    if mesh.vertex_colors is not None:
        colors = interp(np.asarray(mesh.vertex_colors, np.float64)).astype(np.float32)
    normals = None
    if mesh.vertex_normals is not None:
        nrm = interp(np.asarray(mesh.vertex_normals, np.float64))
        nn = np.linalg.norm(nrm, axis=1, keepdims=True)
        normals = (nrm / np.maximum(nn, 1e-12)).astype(np.float32)
    return PointCloudHost(points=pts, colors=colors, normals=normals)


def transfer_colors(mesh: TriangleMeshHost, cloud: PointCloudHost,
                    radius: float = 0.02) -> TriangleMeshHost:
    """Color mesh vertices from the nearest cloud points — the reference's
    save-time color transfer for Poisson meshes, which lose vertex colors
    (azure-kinect-DK/Reconstruction/Reconstruction.py:227-267 paints the
    mesh from the accumulated model cloud with a KDTree NN query). Grid-hash
    NN here (ops.neighbors), host-facing save-time op."""
    import jax.numpy as jnp

    from azurekinect3dreconstruction_tpu.ops.neighbors import (
        build_cell_lists,
        knn_gather,
    )

    if cloud.colors is None or not len(cloud):
        return mesh
    from azurekinect3dreconstruction_tpu.ops.neighbors import auto_capacity

    pts = jnp.asarray(cloud.points, jnp.float32)
    n = pts.shape[0]
    mask = jnp.ones((n,), bool)
    # cell size = search radius: the 27-cell probe is complete only within
    # one cell size, so a smaller cell would silently shrink the search.
    # max_per_cell scales with the cell volume (a 3x cell holds ~27x the
    # points of the cloud's native spacing — 8 slots would evict most true
    # nearest neighbors)
    cells = build_cell_lists(pts, mask, 3 * radius, auto_capacity(n),
                             max_per_cell=32)
    v = jnp.asarray(mesh.vertices, jnp.float32)
    qmask = jnp.ones((v.shape[0],), bool)
    idx, _ = knn_gather(cells, pts, v, qmask, k=1, max_radius=3 * radius)
    idx = np.asarray(idx[:, 0])
    cols = np.full((v.shape[0], 3), 0.6, np.float32)
    hit = idx >= 0
    cols[hit] = np.asarray(cloud.colors)[idx[hit]]
    mesh.vertex_colors = cols
    return mesh
