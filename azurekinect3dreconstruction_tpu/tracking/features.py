"""FPFH features (Fast Point Feature Histograms) — batched, fixed-shape.

Replaces ``o3d.pipelines.registration.compute_fpfh_feature`` (reference
CreateMesh.py:214-217, GoodColorReconstruction.py:171-177) for the global
registration path. Neighborhoods come from the grid-hash KNN
(:mod:`..ops.neighbors`) instead of a KDTree; the histogramming is a batched
one-hot scatter — (N, K, 33) elementwise + segment sums, no trees, no Python
loops.

The descriptor follows Rusu et al. 2009: per-pair Darboux angles
(alpha, phi, theta) binned into 3 x 11 bins; FPFH = SPFH(p) + mean over
neighbors of SPFH(q)/dist(q). Bins are L1-normalized per point (scale-free
matching — Open3D keeps raw counts, but normalization only rescales distances
in feature space and makes thresholds transferable across densities).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from azurekinect3dreconstruction_tpu.ops.neighbors import knn

N_BINS = 11
FEATURE_DIM = 3 * N_BINS


def _pair_angles(p, n_p, q, n_q):
    """Darboux-frame angle features for point pairs.

    p, n_p: (..., 3) source point/normal; q, n_q: (..., 3) neighbor.
    Returns (alpha, phi, theta) each (...,) plus validity."""
    d = q - p
    dist = jnp.linalg.norm(d, axis=-1)
    ok = dist > 1e-9
    dn = d / jnp.maximum(dist, 1e-9)[..., None]

    u = n_p
    v = jnp.cross(dn, u)
    vn = jnp.linalg.norm(v, axis=-1)
    ok = ok & (vn > 1e-6)
    v = v / jnp.maximum(vn, 1e-9)[..., None]
    w = jnp.cross(u, v)

    alpha = jnp.sum(v * n_q, axis=-1)  # [-1, 1]
    phi = jnp.sum(u * dn, axis=-1)  # [-1, 1]
    theta = jnp.arctan2(jnp.sum(w * n_q, axis=-1), jnp.sum(u * n_q, axis=-1))  # [-pi, pi]
    return alpha, phi, theta, ok, dist


def _histogram(vals, lo, hi, weights):
    """(..., K) values -> (..., N_BINS) weighted histogram."""
    t = jnp.clip((vals - lo) / (hi - lo), 0.0, 1.0 - 1e-6)
    b = jnp.floor(t * N_BINS).astype(jnp.int32)  # (..., K)
    onehot = (b[..., None] == jnp.arange(N_BINS)[None, None, :])
    return jnp.sum(onehot * weights[..., None], axis=-2)


@partial(jax.jit, static_argnames=("k", "capacity"))
def compute_fpfh(points, normals, mask, radius: float = 0.05, k: int = 16,
                 capacity: int = 16384):
    """(N,3) points + unit normals + mask -> (N, 33) FPFH descriptors.

    Points with < 3 valid neighbors get a zero descriptor (masked out of
    matching by callers)."""
    pts = jnp.asarray(points, jnp.float32)
    nrm = jnp.asarray(normals, jnp.float32)
    nn, dist = knn(pts, mask, radius, k=k)
    ok_n = nn >= 0
    nn_c = jnp.where(ok_n, nn, 0)
    q = pts[nn_c]  # (N, K, 3)
    n_q = nrm[nn_c]

    alpha, phi, theta, ok_pair, pdist = _pair_angles(
        pts[:, None, :], nrm[:, None, :], q, n_q
    )
    w = (ok_n & ok_pair & mask[:, None]).astype(jnp.float32)

    spfh = jnp.concatenate(
        [
            _histogram(alpha, -1.0, 1.0, w),
            _histogram(phi, -1.0, 1.0, w),
            _histogram(theta, -jnp.pi, jnp.pi, w),
        ],
        axis=-1,
    )  # (N, 33)
    cnt = jnp.maximum(jnp.sum(w, axis=-1, keepdims=True), 1.0)
    spfh = spfh / cnt  # normalize SPFH by neighbor count

    # FPFH = SPFH(p) + mean_i SPFH(q_i) / dist_i
    inv_d = jnp.where(ok_n & (dist > 1e-9), 1.0 / jnp.maximum(dist, 1e-9), 0.0)
    neigh_spfh = spfh[nn_c]  # (N, K, 33)
    wsum = jnp.maximum(jnp.sum(inv_d, axis=-1, keepdims=True), 1e-9)
    fpfh = spfh + jnp.sum(neigh_spfh * inv_d[..., None], axis=1) / wsum

    # L1 normalize; zero out under-constrained points
    l1 = jnp.sum(jnp.abs(fpfh), axis=-1, keepdims=True)
    fpfh = jnp.where(l1 > 1e-9, fpfh / l1, 0.0)
    enough = jnp.sum(ok_n, axis=-1) >= 3
    return jnp.where((mask & enough)[:, None], fpfh, 0.0)
