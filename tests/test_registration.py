import jax
import jax.numpy as jnp
import numpy as np
import pytest

from azurekinect3dreconstruction_tpu.config import RegistrationConfig
from azurekinect3dreconstruction_tpu.core import se3
from azurekinect3dreconstruction_tpu.ops.neighbors import estimate_normals_knn
from azurekinect3dreconstruction_tpu.tracking.features import compute_fpfh
from azurekinect3dreconstruction_tpu.tracking.icp import evaluate_registration, icp_grid
from azurekinect3dreconstruction_tpu.tracking.ransac import (
    global_registration,
    match_features,
    ransac_registration,
)


def make_structured_cloud(n=1200, seed=0):
    """An L-shaped wall + floor + bumps: distinctive geometry for FPFH."""
    rng = np.random.RandomState(seed)
    floor = np.stack([rng.uniform(0, 1, n // 3), np.zeros(n // 3), rng.uniform(0, 1, n // 3)], 1)
    wall = np.stack([rng.uniform(0, 1, n // 3), rng.uniform(0, 0.5, n // 3), np.zeros(n // 3)], 1)
    t = rng.uniform(0, 2 * np.pi, n - 2 * (n // 3))
    p = rng.uniform(0, np.pi, len(t))
    bump = 0.15 * np.stack([np.sin(p) * np.cos(t), np.sin(p) * np.sin(t), np.cos(p)], 1)
    bump += np.array([0.5, 0.15, 0.5])
    return np.concatenate([floor, wall, bump]).astype(np.float32)


VIEWPOINT = np.array([0.5, 2.0, 0.5])  # "sensor" position above the scene


@pytest.fixture(scope="module")
def cloud_pair():
    src = make_structured_cloud()
    xi = np.array([0.2, -0.1, 0.15, 0.3, 0.2, -0.4])
    T_true = np.asarray(se3.se3_exp(jnp.asarray(xi, jnp.float32)))
    tgt = src @ T_true[:3, :3].T + T_true[:3, 3]
    return src, tgt.astype(np.float32), T_true


def oriented_normals(pts, mask, viewpoint):
    """Normals oriented toward the cloud's own sensor position — what the
    real pipelines do (FPFH requires oriented normals)."""
    return estimate_normals_knn(jnp.asarray(pts), mask, radius=0.12, k=16,
                                orient_to=np.asarray(viewpoint, np.float32))


def test_fpfh_invariant_to_rigid_motion(cloud_pair):
    src, tgt, T_true = cloud_pair
    mask = jnp.ones((src.shape[0],), bool)
    n_s = oriented_normals(src, mask, VIEWPOINT)
    n_t = oriented_normals(tgt, mask, T_true[:3, :3] @ VIEWPOINT + T_true[:3, 3])
    f_s = np.asarray(compute_fpfh(jnp.asarray(src), n_s, mask, radius=0.15, k=16))
    f_t = np.asarray(compute_fpfh(jnp.asarray(tgt), n_t, mask, radius=0.15, k=16))
    ok = (np.abs(f_s).sum(1) > 0) & (np.abs(f_t).sum(1) > 0)
    # descriptors of corresponding points should be nearly identical
    d = np.linalg.norm(f_s[ok] - f_t[ok], axis=1)
    base = np.linalg.norm(f_s[ok], axis=1)
    assert (d / np.maximum(base, 1e-9)).mean() < 0.25


def test_match_features_self_identity(cloud_pair):
    src, tgt, _ = cloud_pair
    mask = jnp.ones((src.shape[0],), bool)
    n_s = estimate_normals_knn(jnp.asarray(src), mask, radius=0.12, k=16)
    f_s = compute_fpfh(jnp.asarray(src), n_s, mask, radius=0.15, k=16)
    ok = mask & (jnp.sum(jnp.abs(f_s), axis=1) > 0)
    corr = np.asarray(match_features(f_s, f_s, ok, ok, mutual=True))
    idx = np.arange(src.shape[0])
    valid = corr >= 0
    assert (corr[valid] == idx[valid]).mean() > 0.99


def test_global_registration_recovers_pose(cloud_pair):
    src, tgt, T_true = cloud_pair
    mask = jnp.ones((src.shape[0],), bool)
    n_s = oriented_normals(src, mask, VIEWPOINT)
    n_t = oriented_normals(tgt, mask, T_true[:3, :3] @ VIEWPOINT + T_true[:3, 3])
    f_s = compute_fpfh(jnp.asarray(src), n_s, mask, radius=0.15, k=16)
    f_t = compute_fpfh(jnp.asarray(tgt), n_t, mask, radius=0.15, k=16)
    cfg = RegistrationConfig(ransac_hypotheses=2048)
    res = global_registration(jnp.asarray(src), f_s, mask, jnp.asarray(tgt), f_t, mask,
                              jax.random.PRNGKey(0), cfg, distance_threshold=0.05)
    # random smooth surfaces give ambiguous FPFH -> many wrong mutual matches;
    # RANSAC must still lock onto the consistent subset
    assert float(res.fitness) > 0.1
    T = np.asarray(res.T)
    d = np.asarray(se3.se3_log(jnp.asarray(np.linalg.inv(T_true) @ T, jnp.float32)))
    assert np.linalg.norm(d[:3]) < 0.03 and np.linalg.norm(d[3:]) < 0.05


def test_icp_grid_refines(cloud_pair):
    src, tgt, T_true = cloud_pair
    mask = jnp.ones((src.shape[0],), bool)
    n_t = estimate_normals_knn(jnp.asarray(tgt), mask, radius=0.12, k=16)
    # start from a perturbed initialization (as if from RANSAC)
    xi = np.array([0.01, -0.015, 0.01, 0.02, -0.01, 0.015])
    T_init = np.asarray(se3.se3_exp(jnp.asarray(xi, jnp.float32))) @ T_true
    res = icp_grid(jnp.asarray(src), mask, jnp.asarray(tgt), n_t, mask,
                   init=jnp.asarray(T_init, jnp.float32), max_iters=30, dist_thr=0.06)
    T = np.asarray(res.T)
    d = np.asarray(se3.se3_log(jnp.asarray(np.linalg.inv(T_true) @ T, jnp.float32)))
    assert np.linalg.norm(d[:3]) < 5e-3 and np.linalg.norm(d[3:]) < 5e-3
    assert float(res.fitness) > 0.8


def test_evaluate_registration_gates(cloud_pair):
    src, tgt, T_true = cloud_pair
    mask = jnp.ones((src.shape[0],), bool)
    fit_good, rmse_good = evaluate_registration(
        jnp.asarray(src), mask, jnp.asarray(tgt), mask, jnp.asarray(T_true, jnp.float32),
        dist_thr=0.02)
    fit_bad, _ = evaluate_registration(
        jnp.asarray(src), mask, jnp.asarray(tgt), mask, jnp.eye(4, dtype=jnp.float32),
        dist_thr=0.02)
    assert float(fit_good) > 0.9
    assert float(rmse_good) < 0.01
    assert float(fit_bad) < float(fit_good)


def test_icp_point_to_point_recovers_pose(cloud_pair):
    from azurekinect3dreconstruction_tpu.tracking.icp import icp_point_to_point

    src, tgt, T_true = cloud_pair
    mask = jnp.ones((src.shape[0],), bool)
    xi = np.array([0.015, -0.01, 0.012, 0.025, -0.015, 0.02])
    T_init = np.asarray(se3.se3_exp(jnp.asarray(xi, jnp.float32))) @ T_true
    res = icp_point_to_point(jnp.asarray(src), mask, jnp.asarray(tgt), mask,
                             init=jnp.asarray(T_init, jnp.float32),
                             max_iters=30, dist_thr=0.06)
    T = np.asarray(res.T)
    d = np.asarray(se3.se3_log(jnp.asarray(np.linalg.inv(T_true) @ T, jnp.float32)))
    # identical point sets => point-to-point must converge essentially exactly
    assert np.linalg.norm(d[:3]) < 2e-3 and np.linalg.norm(d[3:]) < 2e-3
    assert float(res.fitness) > 0.9
    # rotation stays orthonormal through the Kabsch chain
    R = T[:3, :3]
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-5)


def test_uniform_mesh_sampling_density():
    from azurekinect3dreconstruction_tpu.core.types import TriangleMeshHost
    from azurekinect3dreconstruction_tpu.meshing.sampling import (
        sample_points_uniformly,
    )

    # two rectangles, one 4x the area of the other -> ~4x the samples
    verts = np.array([
        [0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0],      # unit square (z=0)
        [2, 0, 0], [4, 0, 0], [4, 2, 0], [2, 2, 0],      # 2x2 square
    ], np.float64)
    tris = np.array([[0, 1, 2], [0, 2, 3], [4, 5, 6], [4, 6, 7]], np.int32)
    cols = np.zeros((8, 3))
    cols[4:] = 1.0  # big square is white
    mesh = TriangleMeshHost(vertices=verts, triangles=tris, vertex_colors=cols)
    cloud = sample_points_uniformly(mesh, n=20000, seed=3)
    assert len(cloud) == 20000
    big = cloud.points[:, 0] >= 2.0
    ratio = big.sum() / max((~big).sum(), 1)
    assert 3.5 < ratio < 4.5, f"area weighting off: {ratio}"
    # all samples on the z=0 plane and inside the rectangles
    np.testing.assert_allclose(cloud.points[:, 2], 0, atol=1e-6)
    # colors interpolate from the vertices they were sampled between
    assert cloud.colors is not None
    np.testing.assert_allclose(cloud.colors[big], 1.0, atol=1e-6)
    np.testing.assert_allclose(cloud.colors[~big], 0.0, atol=1e-6)
