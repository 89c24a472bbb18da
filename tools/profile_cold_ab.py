"""A/B the two cold-pass measurement styles (bench.py vs split-sync)."""
import time
import numpy as np
import jax
import jax.numpy as jnp

from azurekinect3dreconstruction_tpu.config import TSDFConfig
from azurekinect3dreconstruction_tpu.core.camera import Intrinsics, pixel_rays
from azurekinect3dreconstruction_tpu.io.synthetic import SyntheticCamera, orbit_trajectory
from azurekinect3dreconstruction_tpu.ops.pallas.tsdf_kernels import make_fused_batch_fn
from azurekinect3dreconstruction_tpu.tsdf import volume as tsdf

cfg = TSDFConfig(voxel_size=0.005, sdf_trunc=0.02, block_resolution=16,
                 block_capacity=16384, hash_capacity=65536)
intr = Intrinsics.azure_kinect_depth_nfov()
cam = SyntheticCamera(intrinsics=intr)
rays = pixel_rays(intr)

n_frames = 64
sweep = orbit_trajectory(n_frames, radius=0.35, angle_span=1.3)
ds, cs, Ts = [], [], []
for T in sweep:
    z, c = cam.render(np.asarray(T, np.float32))
    ds.append(z); cs.append(c); Ts.append(jnp.asarray(T, jnp.float32))
depths, colors, posearr = jnp.stack(ds), jnp.stack(cs), jnp.stack(Ts)

wdepths, wcolors, wposes = (x for x in (None, None, None))
wd, wc, wT = [], [], []
for T in orbit_trajectory(n_frames // 2, radius=0.3, angle_span=1.2,
                          center=(0.05, 0.05, 1.3)):
    z, c = cam.render(np.asarray(T, np.float32))
    wd.append(z); wc.append(c); wT.append(jnp.asarray(T, jnp.float32))
wdepths, wcolors, wposes = jnp.stack(wd), jnp.stack(wc), jnp.stack(wT)
jax.block_until_ready((depths, wdepths))

batch = make_fused_batch_fn(intr, cfg, worklist_size=2048, stride=2)
half = n_frames // 2
wvol = tsdf.create(cfg)
wvol = batch(wvol, wdepths, wcolors, wposes, rays)
float(wvol.weight.sum())
del wvol

for trial in range(3):
    # bench.py style: int(n_blocks) sync midway, one overall timing
    vol = tsdf.create(cfg)
    t0 = time.perf_counter()
    vol = batch(vol, depths[:half], colors[:half], posearr[:half], rays)
    nb_mid = int(vol.n_blocks)
    vol = batch(vol, depths[half:], colors[half:], posearr[half:], rays)
    checksum = float(vol.weight.sum())
    dt_a = (time.perf_counter() - t0) / n_frames
    del vol

    # split style: weight.sum() sync after each batch
    vol = tsdf.create(cfg)
    t0 = time.perf_counter()
    vol = batch(vol, depths[:half], colors[:half], posearr[:half], rays)
    float(vol.weight.sum())
    vol = batch(vol, depths[half:], colors[half:], posearr[half:], rays)
    float(vol.weight.sum())
    dt_b = (time.perf_counter() - t0) / n_frames
    del vol

    # no mid sync at all
    vol = tsdf.create(cfg)
    t0 = time.perf_counter()
    vol = batch(vol, depths[:half], colors[:half], posearr[:half], rays)
    vol = batch(vol, depths[half:], colors[half:], posearr[half:], rays)
    float(vol.weight.sum())
    dt_c = (time.perf_counter() - t0) / n_frames
    del vol

    print(f"trial {trial}: bench-style {dt_a*1000:.2f} ms/f | "
          f"split-sync {dt_b*1000:.2f} | no-mid-sync {dt_c*1000:.2f}")
