"""Parity: the Pallas worklist-integrate kernel (interpret mode on CPU) must
reproduce the jnp reference integrate exactly (tsdf/weight bit-exact; color
within u8 packing quantization of 0.5/255)."""

import jax
import jax.numpy as jnp
import numpy as np

from azurekinect3dreconstruction_tpu.config import TSDFConfig
from azurekinect3dreconstruction_tpu.core.camera import Intrinsics, pixel_rays
from azurekinect3dreconstruction_tpu.io.synthetic import SyntheticCamera, orbit_trajectory
from azurekinect3dreconstruction_tpu.ops.pallas.tsdf_kernels import (
    build_worklist,
    integrate_worklist,
)
from azurekinect3dreconstruction_tpu.tsdf import volume as tsdf

CFG = TSDFConfig(voxel_size=0.02, sdf_trunc=0.08, block_resolution=8,
                 block_capacity=2048, hash_capacity=8192)


def _snapshot(vol):
    return tsdf.TSDFVolume(*jax.tree.map(lambda x: jnp.asarray(np.array(x)), vol))


def test_pallas_integrate_matches_xla_reference(synthetic_camera):
    intr = synthetic_camera.intrinsics
    rays = pixel_rays(intr)
    T = jnp.eye(4, dtype=jnp.float32)
    z, c = synthetic_camera.render(np.eye(4, dtype=np.float32))
    vol0 = tsdf.allocate(tsdf.create(CFG), z, rays, T, CFG)
    ref_in = _snapshot(vol0)

    vb = integrate_worklist(vol0, z, c, T, intr, CFG, interpret=True)
    va = tsdf.integrate(ref_in, z, c, T, intr, CFG)

    ta, wa, ca = (np.array(x) for x in (va.tsdf, va.weight, va.color))
    tb, wb, cb = (np.array(x) for x in (vb.tsdf, vb.weight, vb.color))
    trash = CFG.block_capacity - 1
    ta[trash] = tb[trash] = 0
    wa[trash] = wb[trash] = 0
    ca[trash] = cb[trash] = 0
    np.testing.assert_array_equal(wa, wb)
    np.testing.assert_allclose(ta, tb, atol=1e-6)
    # kernel packs colors to u8 before fusing -> half-ULP quantization
    np.testing.assert_allclose(ca, cb, atol=0.51 / 255.0)


def test_pallas_integrate_moving_camera(synthetic_camera):
    """Multi-frame, moving camera — exercises frustum culling + mip levels.

    Blocks assigned mip level 0 must match the reference exactly; level>0
    blocks sample half/quarter-res depth (a bounded, by-design approximation
    for blocks whose footprint exceeds the static window) and may differ on a
    tiny fraction of band-edge voxels.
    """
    intr = synthetic_camera.intrinsics
    rays = pixel_rays(intr)
    vol_p = tsdf.create(CFG)
    vol_x = tsdf.create(CFG)
    lvl0 = np.zeros((CFG.block_capacity,), bool)
    seen = np.zeros((CFG.block_capacity,), bool)
    for T in orbit_trajectory(3, radius=0.35, angle_span=1.2):
        T = jnp.asarray(T, jnp.float32)
        z, c = synthetic_camera.render(np.asarray(T, np.float32))
        vol_p = tsdf.allocate(vol_p, z, rays, T, CFG)
        vol_x = tsdf.allocate(vol_x, z, rays, T, CFG)
        meta, _ = build_worklist(vol_p.block_coords, vol_p.n_blocks, T, intr, CFG)
        meta = np.array(meta)
        live = meta[0] != CFG.block_capacity - 1
        seen[meta[0, live]] = True
        lvl0[meta[0, live & (meta[6] > 0)]] = True  # mark mip>0 blocks
        snap = _snapshot(vol_x)
        vol_p = integrate_worklist(vol_p, z, c, T, intr, CFG, interpret=True)
        vol_x = tsdf.integrate(snap, z, c, T, intr, CFG)
    exact = seen & ~lvl0
    wa = np.array(vol_x.weight)
    wb = np.array(vol_p.weight)
    np.testing.assert_array_equal(wa[exact], wb[exact])
    ta, tb = np.array(vol_x.tsdf), np.array(vol_p.tsdf)
    np.testing.assert_allclose(ta[exact], tb[exact], atol=1e-5)
    # mip>0 blocks: the approximation may flip a few band-edge voxels only
    approx = seen & lvl0
    if approx.any():
        frac = (wa[approx] != wb[approx]).mean()
        assert frac < 0.02, f"mip approximation changed {frac:.1%} of voxels"


def test_worklist_culls_out_of_view_blocks(synthetic_camera):
    intr = synthetic_camera.intrinsics
    rays = pixel_rays(intr)
    T = jnp.eye(4, dtype=jnp.float32)
    z, _ = synthetic_camera.render(np.eye(4, dtype=np.float32))
    vol = tsdf.allocate(tsdf.create(CFG), z, rays, T, CFG)
    n = int(vol.n_blocks)

    # looking straight at the scene: every allocated block is visible
    meta, n_active = build_worklist(vol.block_coords, vol.n_blocks, T, intr, CFG)
    assert int(n_active) == n

    # camera turned 180 degrees: nothing visible
    import azurekinect3dreconstruction_tpu.core.se3 as se3
    T_back = se3.se3_exp(jnp.asarray([0, 0, 0, 0.0, np.pi, 0.0], jnp.float32))
    meta, n_active = build_worklist(vol.block_coords, vol.n_blocks, T_back, intr, CFG)
    assert int(n_active) == 0
    # all rows padded with the trash slot
    assert (np.array(meta[0]) == CFG.block_capacity - 1).all()
