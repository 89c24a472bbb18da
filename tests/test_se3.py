import jax.numpy as jnp
import numpy as np
import pytest

from azurekinect3dreconstruction_tpu.core import se3


def random_twist(rng, rot_scale=1.0):
    return np.concatenate([rng.uniform(-1, 1, 3), rng.uniform(-rot_scale, rot_scale, 3)])


def test_exp_identity():
    T = se3.se3_exp(jnp.zeros(6))
    np.testing.assert_allclose(np.asarray(T), np.eye(4), atol=1e-6)


@pytest.mark.parametrize("seed", range(5))
def test_exp_log_roundtrip(seed):
    rng = np.random.RandomState(seed)
    xi = random_twist(rng)
    T = se3.se3_exp(jnp.asarray(xi, dtype=jnp.float32))
    xi2 = np.asarray(se3.se3_log(T))
    np.testing.assert_allclose(xi2, xi, atol=1e-3)  # f32 trig precision
    # the reconstructed transform must match tightly even if the twist drifts
    T2 = np.asarray(se3.se3_exp(jnp.asarray(xi2, dtype=jnp.float32)))
    np.testing.assert_allclose(T2, np.asarray(T), atol=2e-4)


def test_exp_log_small_angle():
    xi = np.array([1e-4, -2e-4, 3e-5, 1e-5, -1e-6, 2e-5])
    T = se3.se3_exp(jnp.asarray(xi, dtype=jnp.float32))
    np.testing.assert_allclose(np.asarray(se3.se3_log(T)), xi, atol=1e-6)


def test_rotation_orthonormal():
    rng = np.random.RandomState(3)
    for _ in range(10):
        R = np.asarray(se3.so3_exp(jnp.asarray(rng.uniform(-2, 2, 3), dtype=jnp.float32)))
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-5)
        assert abs(np.linalg.det(R) - 1) < 1e-5


def test_inverse_compose():
    rng = np.random.RandomState(7)
    T = np.asarray(se3.se3_exp(jnp.asarray(random_twist(rng), dtype=jnp.float32)))
    I = np.asarray(se3.inverse(jnp.asarray(T))) @ T
    np.testing.assert_allclose(I, np.eye(4), atol=1e-5)


def test_transform_points_matches_matmul():
    rng = np.random.RandomState(11)
    T = np.asarray(se3.se3_exp(jnp.asarray(random_twist(rng), dtype=jnp.float32)))
    pts = rng.uniform(-2, 2, (50, 3)).astype(np.float32)
    out = np.asarray(se3.transform_points(jnp.asarray(T), jnp.asarray(pts)))
    hom = np.concatenate([pts, np.ones((50, 1), np.float32)], axis=1)
    expect = (T @ hom.T).T[:, :3]
    np.testing.assert_allclose(out, expect, atol=1e-5)


def test_rpy_roundtrip():
    rng = np.random.RandomState(5)
    for _ in range(5):
        r, p, y = rng.uniform(-1.2, 1.2, 3)
        R = se3.matrix_from_rpy(r, p, y)
        r2, p2, y2 = se3.rpy_from_matrix(R)
        np.testing.assert_allclose([r2, p2, y2], [r, p, y], atol=1e-9)


def test_is_valid_transform():
    assert se3.is_valid_transform(np.eye(4))
    bad = np.eye(4)
    bad[0, 0] = 2.0
    assert not se3.is_valid_transform(bad)
    assert not se3.is_valid_transform(np.full((4, 4), np.nan))
