"""Trajectory metrics (utils/evaluation): ATE / RPE / Umeyama alignment.

The reference has no accuracy evaluation at all (SURVEY §5: printf fitness
only); these metrics are how this framework quantifies tracking quality
(bench.py reports slam_ate_rmse_mm from them).
"""

import numpy as np
import pytest

from azurekinect3dreconstruction_tpu.core import se3
from azurekinect3dreconstruction_tpu.utils.evaluation import (
    align_umeyama,
    ate,
    rpe,
)


def _orbit(n=24, radius=0.4, seed=0):
    """Simple GT trajectory: poses looking at the origin from an arc."""
    from azurekinect3dreconstruction_tpu.io.synthetic import orbit_trajectory

    return np.asarray(orbit_trajectory(n, radius=radius, angle_span=1.2),
                      np.float64)


def _rigid(seed=1):
    rng = np.random.default_rng(seed)
    w = rng.normal(size=3) * 0.6
    t = rng.normal(size=3) * 2.0
    T = np.eye(4)
    T[:3, :3] = np.asarray(se3.so3_exp(w))
    T[:3, 3] = t
    return T


def test_umeyama_recovers_exact_rigid_transform():
    gt = _orbit()
    pts = gt[:, :3, 3]
    T = _rigid()
    moved = (T[:3, :3] @ pts.T).T + T[:3, 3]
    s, R, t = align_umeyama(pts, moved)
    assert s == 1.0
    np.testing.assert_allclose(R, T[:3, :3], atol=1e-6)
    np.testing.assert_allclose(t, T[:3, 3], atol=1e-6)
    # with_scale recovers a synthetic scale too
    s2, R2, _ = align_umeyama(pts, 1.7 * moved, with_scale=True)
    assert abs(s2 - 1.7) < 1e-6


def test_ate_zero_on_identical_and_invariant_to_rigid_offset():
    gt = _orbit()
    r = ate(gt, gt)
    assert r["rmse"] < 1e-12 and r["final_drift"] < 1e-12
    # a rigidly-moved copy has the same SHAPE: aligned ATE must be ~0,
    # while final_drift (unaligned) reports the actual offset
    T = _rigid()
    moved = np.einsum("ij,njk->nik", T, gt)
    r2 = ate(moved, gt)
    assert r2["rmse"] < 1e-7
    assert r2["final_drift"] > 0.1


def test_ate_measures_known_noise():
    gt = _orbit(n=200)
    rng = np.random.default_rng(3)
    noisy = gt.copy()
    sigma = 0.01
    noise = rng.normal(scale=sigma, size=(len(gt), 3))
    noisy[:, :3, 3] += noise
    r = ate(noisy, gt, align=False)
    # 3D gaussian position noise: E[||e||^2] = 3 sigma^2
    expect = np.sqrt(np.mean(np.sum(noise ** 2, axis=1)))
    assert abs(r["rmse"] - expect) < 1e-12  # unaligned = direct residuals
    assert abs(r["rmse"] - np.sqrt(3) * sigma) / (np.sqrt(3) * sigma) < 0.15


def test_rpe_flags_local_error_not_global_drift():
    gt = _orbit()
    # trajectory with a constant world offset: zero RELATIVE error
    off = gt.copy()
    off[:, :3, 3] += np.array([1.0, -2.0, 0.5])
    r = rpe(off, gt)
    assert r["trans_rmse"] < 1e-12 and r["rot_rmse"] < 1e-7
    # one corrupted step shows up in delta=1 RPE
    bad = gt.copy()
    bad[10:, :3, 3] += np.array([0.05, 0.0, 0.0])  # a 5 cm jump at step 10
    r2 = rpe(bad, gt)
    n_pairs = len(gt) - 1
    assert abs(r2["trans_rmse"] - 0.05 / np.sqrt(n_pairs)) < 1e-9


def test_input_validation():
    gt = _orbit(n=8)
    with pytest.raises(ValueError):
        ate(gt[:4], gt)
    with pytest.raises(ValueError):
        rpe(gt, gt, delta=8)
    with pytest.raises(ValueError):
        align_umeyama(gt[:2, :3, 3], gt[:2, :3, 3])
    with pytest.raises(ValueError):  # aligned ATE on an unalignable pair
        ate(gt[:2], gt[:2])
    assert ate(gt[:2], gt[:2], align=False)["rmse"] < 1e-12
