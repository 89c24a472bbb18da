#!/usr/bin/env python
"""Headline benchmark: 640x576 NFOV depth frames fused into a 5 mm TSDF on one
TPU chip (BASELINE.md target: >30 fps/camera; the reference never measured its
own CPU ScalableTSDFVolume, which also re-extracts the mesh every frame — see
SURVEY.md §6).

Measures the fused zero-sync frame step (allocate + frustum worklist + mip
pyramids + Pallas integrate kernel) batched via lax.scan, plus the two-stage
marching-cubes extraction time.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...extras}.
"""

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from azurekinect3dreconstruction_tpu.config import TSDFConfig
    from azurekinect3dreconstruction_tpu.core.camera import Intrinsics, pixel_rays
    from azurekinect3dreconstruction_tpu.io.synthetic import SyntheticCamera, orbit_trajectory
    from azurekinect3dreconstruction_tpu.ops.pallas.tsdf_kernels import make_fused_batch_fn
    from azurekinect3dreconstruction_tpu.tsdf import marching_cubes as mc
    from azurekinect3dreconstruction_tpu.tsdf import volume as tsdf

    cfg = TSDFConfig(
        voxel_size=0.005,
        sdf_trunc=0.02,
        block_resolution=16,
        block_capacity=16384,
        hash_capacity=65536,
    )
    intr = Intrinsics.azure_kinect_depth_nfov()  # 640x576 NFOV
    cam = SyntheticCamera(intrinsics=intr)
    rays = pixel_rays(intr)

    n_traj = 8
    tile = 4  # 32 frames per dispatch: amortizes host-link latency
    poses = orbit_trajectory(n_traj, radius=0.35, angle_span=1.0)
    ds, cs, Ts = [], [], []
    for T in poses:
        z, c = cam.render(np.asarray(T, np.float32))
        ds.append(z)
        cs.append(c)
        Ts.append(jnp.asarray(T, jnp.float32))
    depths = jnp.concatenate([jnp.stack(ds)] * tile)
    colors = jnp.concatenate([jnp.stack(cs)] * tile)
    posearr = jnp.concatenate([jnp.stack(Ts)] * tile)
    n_traj *= tile
    jax.block_until_ready(depths)

    batch = make_fused_batch_fn(intr, cfg, worklist_size=2048, stride=2)
    vol = tsdf.create(cfg)
    vol = batch(vol, depths, colors, posearr, rays)  # warmup/compile
    float(vol.weight.sum())  # value pull = reliable sync through the tunnel

    reps = 5
    t0 = time.perf_counter()
    for _ in range(reps):
        vol = batch(vol, depths, colors, posearr, rays)
    checksum = float(vol.weight.sum())
    dt = (time.perf_counter() - t0) / (reps * n_traj)
    fps = 1.0 / dt

    # marching-cubes extraction timing (the reference re-extracts per frame);
    # value-pull sync: block_until_ready does not reliably block through the
    # axon tunnel, and pulling full vertex buffers would time the network
    mcells, mtris = 4194304, 1048576  # max_cells budgets 64-cell groups
    v, c, n_tris, ovf = mc.extract_mesh_arrays(vol, cfg, max_cells=mcells,
                                               max_tris=mtris,
                                               extract_blocks=2048)
    float(v.sum())
    t0 = time.perf_counter()
    n_ext = 5
    for _ in range(n_ext):
        v, c, n_tris, ovf = mc.extract_mesh_arrays(
            vol, cfg, max_cells=mcells, max_tris=mtris, extract_blocks=2048)
        float(v.sum())
    extract_ms = (time.perf_counter() - t0) / n_ext * 1000.0

    # full SLAM (Pallas odometry + fusion, one scan-batched dispatch)
    from azurekinect3dreconstruction_tpu.config import PipelineConfig
    from azurekinect3dreconstruction_tpu.ops.image import rgb_to_intensity
    from azurekinect3dreconstruction_tpu.pipelines.mono_odometry_tsdf import (
        make_device_slam_batch,
    )

    pcfg = PipelineConfig(tsdf=cfg)
    intens = jnp.stack([rgb_to_intensity(c) for c in colors[:16]])
    slam = make_device_slam_batch(intr, pcfg, worklist_size=2048, stride=2)
    svol = tsdf.create(cfg)
    svol, traj, fits = slam(svol, jnp.eye(4, dtype=jnp.float32),
                            intens, depths[:16], colors[:16], rays)
    float(svol.weight.sum())
    t0 = time.perf_counter()
    for _ in range(3):
        svol, traj, fits = slam(svol, jnp.eye(4, dtype=jnp.float32),
                                intens, depths[:16], colors[:16], rays)
    float(svol.weight.sum())
    slam_dt = (time.perf_counter() - t0) / (3 * 15)
    slam_fps = 1.0 / slam_dt

    print(json.dumps({
        "metric": "depth_fps_into_5mm_tsdf_640x576",
        "value": round(fps, 2),
        "unit": "fps",
        "vs_baseline": round(fps / 30.0, 3),
        "frame_ms": round(dt * 1000.0, 2),
        "slam_fps_odometry_plus_fusion": round(slam_fps, 2),
        "slam_frame_ms": round(slam_dt * 1000.0, 2),
        "extract_ms": round(extract_ms, 2),
        "mesh_triangles": int(n_tris),
        "extract_overflow": bool(ovf),
        "n_blocks": int(vol.n_blocks),
        "volume_checksum": checksum,
        "min_odometry_fitness": round(float(jnp.min(fits)), 3),
        "device": str(jax.devices()[0]),
    }))


if __name__ == "__main__":
    main()
