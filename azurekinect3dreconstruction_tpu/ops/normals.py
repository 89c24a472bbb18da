"""Normal estimation.

Two forms, replacing Open3D's ``estimate_normals`` + orientation passes
(reference CreateMesh.py:604-607, azure-kinect-DK/Reconstruction/
Reconstruction.py:80-95, orient_normals_consistent_tangent_plane at
Reconstruction-ResourceEfficient.py:169):

- :func:`organized_normals` — O(1)-neighborhood cross-product normals on an
  organized depth/point map (the TPU-friendly path used by projective ICP and
  live viz; fully fused elementwise math, no neighbor search at all).
- :func:`estimate_normals_grid` — local-PCA normals for unorganized clouds
  using voxel-grid hashing for neighborhoods (fixed K candidates/cell instead
  of a KD-tree; see ops.neighbors).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_PP = jax.lax.Precision.HIGHEST


def organized_normals(points, max_edge: float = 0.1):
    """(H, W, 3) organized camera/world-space points -> (H, W, 3) unit
    normals oriented toward the camera (-z half-space for camera frames).

    Uses central differences with validity gating: a normal is zero where any
    required neighbor is invalid or an edge longer than ``max_edge`` (a depth
    discontinuity) crosses the stencil.
    """
    p = jnp.asarray(points)
    valid = p[..., 2] > 0

    right = jnp.roll(p, -1, axis=1)
    left = jnp.roll(p, 1, axis=1)
    down = jnp.roll(p, -1, axis=0)
    up = jnp.roll(p, 1, axis=0)
    vr = jnp.roll(valid, -1, axis=1)
    vl = jnp.roll(valid, 1, axis=1)
    vd = jnp.roll(valid, -1, axis=0)
    vu = jnp.roll(valid, 1, axis=0)

    du = right - left
    dv = down - up
    n = jnp.cross(du, dv)
    norm = jnp.linalg.norm(n, axis=-1, keepdims=True)
    n = n / jnp.maximum(norm, 1e-12)

    ok = (
        valid & vr & vl & vd & vu
        & (jnp.linalg.norm(du, axis=-1) < max_edge)
        & (jnp.linalg.norm(dv, axis=-1) < max_edge)
        & (norm[..., 0] > 1e-12)
    )
    # orient toward the camera: points are in camera frame, camera at origin
    flip = jnp.sum(n * p, axis=-1) > 0
    n = jnp.where(flip[..., None], -n, n)
    n = jnp.where(ok[..., None], n, 0.0)
    # zero the border rows/cols (roll wraps around)
    n = n.at[0].set(0.0).at[-1].set(0.0)
    n = n.at[:, 0].set(0.0).at[:, -1].set(0.0)
    return n


def pca_normal(neighbors, mask):
    """Smallest-eigenvector normal of a (K, 3) neighborhood with (K,) mask.
    Closed-form 3x3 eigen via the cross-product-of-differences trick is
    unstable; use one step of inverse iteration on the covariance."""
    w = mask.astype(jnp.float32)[..., None]
    cnt = jnp.maximum(jnp.sum(w, axis=-2), 1.0)
    mean = jnp.sum(neighbors * w, axis=-2, keepdims=True) / cnt[..., None, :]
    d = (neighbors - mean) * w
    cov = jnp.matmul(jnp.swapaxes(d, -1, -2), d, precision=_PP) / cnt[..., None]
    # smallest eigenvector via eigh (3x3 batched — cheap, stable)
    wvals, vecs = jnp.linalg.eigh(cov)
    return vecs[..., 0]  # ascending order: first column = smallest eigenvalue


def orient_normals_consistent(points, normals, mask, radius: float,
                              k: int = 16):
    """Flip normals so neighboring normals agree — Open3D
    ``orient_normals_consistent_tangent_plane`` analog (reference
    azure-kinect-DK/Reconstruction/Reconstruction-ResourceEfficient.py:169
    orients the accumulated model cloud this way on save, where no single
    viewpoint exists).

    The kNN graph comes from the device grid hash (ops.neighbors); the sign
    propagation itself is a host BFS over connected components seeded at
    each component's highest point (oriented +y-up... reference clouds are
    y-down camera frames, so the seed orients AWAY from the cloud centroid),
    flipping each newly-reached normal to agree with its parent. Offline
    save-time operation: host graph traversal is the right tool (SURVEY.md
    §2.2 keeps once-per-save work off the device)."""
    import numpy as np

    from azurekinect3dreconstruction_tpu.ops.neighbors import (
        build_cell_lists,
        knn_gather,
    )

    pts = jnp.asarray(points, jnp.float32)
    n = pts.shape[0]
    cells = build_cell_lists(pts, mask, radius, 1 << max(12, (n - 1).bit_length()),
                             max_per_cell=8)
    idx, _ = knn_gather(cells, pts, pts, mask, k=k, max_radius=radius)
    idx = np.asarray(idx)
    m = np.asarray(mask)
    nr = np.array(jnp.asarray(normals, jnp.float32))
    p = np.asarray(pts)

    visited = ~m  # invalid points are never traversed
    centroid = p[m].mean(0) if m.any() else np.zeros(3)
    order = np.argsort(-np.linalg.norm(p - centroid, axis=1))
    from collections import deque

    for seed in order:
        if visited[seed]:
            continue
        # seed orientation: away from the centroid (the only global cue an
        # unstructured accumulated cloud offers)
        if np.dot(nr[seed], p[seed] - centroid) < 0:
            nr[seed] = -nr[seed]
        visited[seed] = True
        q = deque([seed])
        while q:
            i = q.popleft()
            for j in idx[i]:
                if j < 0 or visited[j]:
                    continue
                if np.dot(nr[j], nr[i]) < 0:
                    nr[j] = -nr[j]
                visited[j] = True
                q.append(j)
    return jnp.asarray(nr)
