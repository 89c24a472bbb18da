"""Multi-chip fusion on the 8-virtual-device CPU mesh: the (cam x blk)
shard_map step must reproduce sequential single-volume integration."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from azurekinect3dreconstruction_tpu.config import TSDFConfig
from azurekinect3dreconstruction_tpu.core.camera import Intrinsics, pixel_rays
from azurekinect3dreconstruction_tpu.io.synthetic import SyntheticCamera, orbit_trajectory
from azurekinect3dreconstruction_tpu.parallel import sharded_volume as sv
from azurekinect3dreconstruction_tpu.tsdf import volume as tsdf

CFG = TSDFConfig(voxel_size=0.02, sdf_trunc=0.08, block_resolution=8,
                 block_capacity=1024, hash_capacity=4096)


@pytest.fixture(scope="module")
def mesh():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    return sv.make_mesh(2, 4)


def test_sharded_two_camera_fusion_matches_reference(mesh, synthetic_camera):
    intr = synthetic_camera.intrinsics
    rays = pixel_rays(intr)
    poses = orbit_trajectory(2, radius=0.3, angle_span=0.6)
    frames = [synthetic_camera.render(np.asarray(T, np.float32)) for T in poses]
    depths = jnp.stack([f[0] for f in frames])
    colors = jnp.stack([f[1] for f in frames])
    posearr = jnp.stack([jnp.asarray(T, jnp.float32) for T in poses])

    step = sv.make_sharded_step(mesh, intr, CFG, stride=2)
    vol_s = sv.create_sharded(CFG, mesh)
    vol_s = step(vol_s, depths, colors, posearr, rays)

    # reference: single volume, both cameras (psum fusion == joint average)
    ref = tsdf.create(CFG)
    for i in range(2):
        ref = tsdf.allocate(ref, depths[i], rays, posearr[i], CFG, stride=2,
                            dedup_budget=2048)
    # joint-average both frames: accumulate obs sums manually via two
    # sequential integrations (equivalent for weight-1 observations)
    for i in range(2):
        ref = tsdf.integrate(ref, depths[i], colors[i], posearr[i], intr, CFG)

    total_sharded = sum(
        int(np.asarray(vol_s.n_blocks)[s]) for s in range(4)
    )
    assert total_sharded == int(ref.n_blocks), "shards must cover the same blocks"
    assert not bool(np.asarray(vol_s.overflow).any())

    # sample the analytic sphere surface through both representations
    sph = synthetic_camera.scene.spheres[0]
    rng = np.random.RandomState(0)
    dirs = rng.normal(size=(500, 3))
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    pts = (np.asarray(sph.center) + sph.radius * dirs).astype(np.float32)

    t_ref, w_ref = tsdf.sample_tsdf(ref, jnp.asarray(pts), CFG)
    t_ref, w_ref = np.asarray(t_ref), np.asarray(w_ref)

    t_s = np.full((500,), np.nan, np.float32)
    w_s = np.zeros((500,), np.float32)
    for s in range(4):
        sub = sv.gather_volume(vol_s, CFG, s, 4)
        t_i, w_i = tsdf.sample_tsdf(sub, jnp.asarray(pts), CFG)
        t_i, w_i = np.asarray(t_i), np.asarray(w_i)
        got = w_i > 0
        t_s[got] = t_i[got]
        w_s[got] = w_i[got]

    both = (w_ref > 0) & (w_s > 0)
    assert both.sum() > 0.8 * (w_ref > 0).sum()
    np.testing.assert_allclose(w_s[both], w_ref[both], atol=1e-5)
    np.testing.assert_allclose(t_s[both], t_ref[both], atol=1e-5)


def test_sharded_blocks_are_disjoint(mesh, synthetic_camera):
    intr = synthetic_camera.intrinsics
    rays = pixel_rays(intr)
    z, c = synthetic_camera.render(np.eye(4, dtype=np.float32))
    depths = jnp.stack([z, z])
    colors = jnp.stack([c, c])
    posearr = jnp.stack([jnp.eye(4, dtype=jnp.float32)] * 2)
    step = sv.make_sharded_step(mesh, intr, CFG, stride=2)
    vol_s = step(sv.create_sharded(CFG, mesh), depths, colors, posearr, rays)
    seen = set()
    for s in range(4):
        sub = sv.gather_volume(vol_s, CFG, s, 4)
        n = int(sub.n_blocks)
        coords = {tuple(x) for x in np.asarray(sub.block_coords)[:n]}
        assert not (coords & seen), "block owned by two shards"
        seen |= coords
