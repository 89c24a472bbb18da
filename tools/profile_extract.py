"""Stage-by-stage TPU timing of marching-cubes extraction (dev tool).

Duplicates extract_mesh_arrays' stage structure with a `stop` knob so the
delta between successive stops isolates each stage's cost. Keep in sync with
tsdf/marching_cubes.py when profiling regressions.
"""

import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from azurekinect3dreconstruction_tpu.config import TSDFConfig
from azurekinect3dreconstruction_tpu.core.camera import Intrinsics, pixel_rays
from azurekinect3dreconstruction_tpu.io.synthetic import SyntheticCamera, orbit_trajectory
from azurekinect3dreconstruction_tpu.ops.pallas.tsdf_kernels import make_fused_frame_fn
from azurekinect3dreconstruction_tpu.tsdf import hash as vhash
from azurekinect3dreconstruction_tpu.tsdf import marching_cubes as mc
from azurekinect3dreconstruction_tpu.tsdf import mc_tables as mt
from azurekinect3dreconstruction_tpu.tsdf import volume as tsdf

_TRI_TABLE = np.asarray(mt.TRI_TABLE)
_EDGE_A = np.asarray(mt.EDGE_ENDPOINTS[:, 0])
_EDGE_B = np.asarray(mt.EDGE_ENDPOINTS[:, 1])
_CORNERS = np.asarray(mt.CORNER_OFFSETS)


@partial(jax.jit, static_argnames=("cfg", "max_cells", "max_tris", "E", "stop"))
def staged(vol, cfg, max_cells, max_tris, E, stop):
    R = cfg.block_resolution
    C3 = R * R * R
    t2 = vol.tsdf[:E].reshape(E, C3)
    w2 = vol.weight[:E].reshape(E, C3)
    coords = vol.block_coords[:E]
    alive = jax.lax.broadcasted_iota(jnp.int32, (E, 1), 0)[:, 0] < vol.n_blocks
    nbr = mc._neighbor_slots(vol.table, coords)
    nbr = jnp.where(nbr < E, nbr, -1)

    inside0 = (t2 < 0.0) & (w2 > 0.0) & alive[:, None]
    valid0 = (w2 > 0.0) & alive[:, None]

    def nbr_field(base, code):
        s_ = nbr[:, code]
        ok = (s_ >= 0) & alive
        return jnp.where(ok[:, None], base[jnp.where(ok, s_, 0)], False)

    ins_f = {0: inside0}
    val_f = {0: valid0}
    for c in range(1, 8):
        ins_f[c] = nbr_field(inside0, c)
        val_f[c] = nbr_field(valid0, c)
    ins_v = mc._corner_views(ins_f, R)
    val_v = mc._corner_views(val_f, R)

    case = jnp.zeros((E, C3), jnp.int32)
    all_valid = jnp.ones((E, C3), jnp.bool_)
    for k in range(8):
        key = tuple(mt.CORNER_OFFSETS[k])
        case = case | (ins_v[key].astype(jnp.int32) << k)
        all_valid = all_valid & val_v[key]
    active4 = all_valid & (case != 0) & (case != 255)
    if stop == "A":
        return active4.sum()

    active = active4.reshape(-1)
    order = jnp.cumsum(active.astype(jnp.int32)) - 1
    dst = jnp.where(active & (order < max_cells), order, max_cells)
    wl_cell = jnp.full((max_cells,), -1, jnp.int32)
    cell_ids = jax.lax.broadcasted_iota(jnp.int32, (E * C3, 1), 0)[:, 0]
    wl_cell = wl_cell.at[dst].set(cell_ids, mode="drop")
    if stop == "B":
        return wl_cell.sum()

    live = wl_cell >= 0
    cid = jnp.where(live, wl_cell, 0)
    b = cid // C3
    rem = cid % C3
    ci = rem // (R * R)
    cj = (rem // R) % R
    ck = rem % R
    gi = _CORNERS[:, 0][:, None] + ci[None, :]
    gj = _CORNERS[:, 1][:, None] + cj[None, :]
    gk = _CORNERS[:, 2][:, None] + ck[None, :]
    code = ((gi == R).astype(jnp.int32) + 2 * (gj == R).astype(jnp.int32)
            + 4 * (gk == R).astype(jnp.int32))
    cslot = nbr[b[None, :], code]
    cslot = jnp.where(cslot >= 0, cslot, 0)
    clin = (gi % R) * R * R + (gj % R) * R + (gk % R)
    vals = t2.reshape(-1)[cslot * C3 + clin]
    if stop == "C_tsdf_gather":
        return vals.sum()

    V = R * R * R
    cE = vol.color[:E]
    packed = (jnp.round(cE[:, 0] * 255.0) * 65536.0
              + jnp.round(cE[:, 1] * 255.0) * 256.0
              + jnp.round(cE[:, 2] * 255.0)).reshape(-1)
    pcol = packed[cslot * V + clin]
    pr = jnp.floor(pcol / 65536.0)
    pg = jnp.floor((pcol - pr * 65536.0) / 256.0)
    pb_ = pcol - pr * 65536.0 - pg * 256.0
    cols = jnp.stack([pr, pg, pb_]) / 255.0
    if stop == "C_col_gather":
        return cols.sum()

    mcase = jnp.zeros((max_cells,), jnp.int32)
    for k in range(8):
        mcase = mcase | ((vals[k] < 0.0).astype(jnp.int32) << k)
    va = vals[_EDGE_A]
    vb = vals[_EDGE_B]
    denom = va - vb
    frac = jnp.clip(va / jnp.where(jnp.abs(denom) > 1e-12, denom, 1e-12), 0.0, 1.0)
    cell0 = (coords[b].T * R + jnp.stack([ci, cj, ck])).astype(jnp.float32)
    ca = cols[:, _EDGE_A]
    cb2 = cols[:, _EDGE_B]
    ecol_ch = ca + frac[None] * (cb2 - ca)
    ecol_pk = (jnp.round(ecol_ch[0] * 255.0) * 65536.0
               + jnp.round(ecol_ch[1] * 255.0) * 256.0
               + jnp.round(ecol_ch[2] * 255.0))
    if stop == "C_edges":
        return frac.sum() + ecol_pk.sum()

    onehot = (mcase[None, :] ==
              jax.lax.broadcasted_iota(jnp.int32, (256, 1), 0)).astype(jnp.bfloat16)
    tab15 = (_TRI_TABLE.T + 1).astype(np.float32)
    tri_edges = jnp.dot(jnp.asarray(tab15, jnp.bfloat16), onehot,
                        preferred_element_type=jnp.float32).astype(jnp.int32) - 1
    if stop == "C_table":
        return tri_edges.sum() + frac.sum() + ecol_pk.sum()

    te = tri_edges.reshape(5, 3, max_cells)
    tri_valid = live[None, :] & (te[:, 0] >= 0)
    tv_flat = tri_valid.reshape(-1)
    t_order = jnp.cumsum(tv_flat.astype(jnp.int32)) - 1
    total_tris = t_order[-1] + 1
    out_flat = jnp.where(tv_flat & (t_order < max_tris), t_order, max_tris)
    pe = ((te[:, 0] + 1) | ((te[:, 1] + 1) << 4) | ((te[:, 2] + 1) << 8))
    src_idx = jax.lax.broadcasted_iota(jnp.int32, (5 * max_cells, 1), 0)[:, 0]
    inv = jnp.zeros((max_tris + 1,), jnp.int32)
    inv = inv.at[out_flat].set(src_idx, mode="drop")[:max_tris]
    if stop == "C_compact":
        return inv.sum() + frac.sum() + ecol_pk.sum() + total_tris

    m = inv % max_cells
    pe_t = pe.reshape(-1)[inv]
    ev = jnp.stack([pe_t & 0xF, (pe_t >> 4) & 0xF, (pe_t >> 8) & 0xF]) - 1
    ev = jnp.maximum(ev, 0)
    frac_t = frac.reshape(-1)[ev * max_cells + m[None, :]]
    cell0_t = cell0[:, m]
    pa_np = _CORNERS[_EDGE_A].astype(np.float32)
    pb_np = _CORNERS[_EDGE_B].astype(np.float32)
    pa_sel = jnp.zeros((3, 3, max_tris), jnp.float32)
    pd_sel = jnp.zeros((3, 3, max_tris), jnp.float32)
    for e in range(12):
        sel = (ev == e)[:, None, :]
        pa_sel = pa_sel + sel * pa_np[e][None, :, None]
        pd_sel = pd_sel + sel * (pb_np[e] - pa_np[e])[None, :, None]
    verts = ((cell0_t[None] + 0.5 + pa_sel + frac_t[:, None, :] * pd_sel)
             * cfg.voxel_size)
    cols_pk = ecol_pk.reshape(-1)[ev * max_cells + m[None, :]]
    cr = jnp.floor(cols_pk / 65536.0)
    cg = jnp.floor((cols_pk - cr * 65536.0) / 256.0)
    cb3 = cols_pk - cr * 65536.0 - cg * 256.0
    vcols = jnp.stack([cr, cg, cb3], axis=1) / 255.0
    num_tris = jnp.minimum(total_tris, max_tris).astype(jnp.int32)
    tmask = (jnp.arange(max_tris, dtype=jnp.int32) < num_tris)[None, None, :]
    return jnp.where(tmask, verts, 0.0).sum() + jnp.where(tmask, vcols, 0.0).sum()


def main():
    cfg = TSDFConfig(voxel_size=0.005, sdf_trunc=0.02, block_resolution=16,
                     block_capacity=4096, hash_capacity=16384)
    intr = Intrinsics.azure_kinect_depth_nfov()
    cam = SyntheticCamera(intrinsics=intr)
    rays = pixel_rays(intr)
    frame_fn = make_fused_frame_fn(intr, cfg, worklist_size=4096, stride=2)
    vol = tsdf.create(cfg)
    for T in orbit_trajectory(16, radius=0.3, angle_span=1.2):
        z, c = cam.render(np.asarray(T, np.float32))
        vol = frame_fn(vol, jnp.asarray(z), jnp.asarray(c),
                       jnp.asarray(T, jnp.float32), rays)
    float(vol.weight.sum())
    print("blocks:", int(vol.n_blocks))

    E, MC, MT = 2048, 524288, 1048576
    stops = ["A", "B", "C_tsdf_gather", "C_col_gather", "C_edges",
             "C_table", "C_compact", "full"]
    prev = 0.0
    for s in stops:
        r = staged(vol, cfg, MC, MT, E, s)
        float(r)  # compile + settle
        t0 = time.perf_counter()
        for _ in range(3):
            float(staged(vol, cfg, MC, MT, E, s))
        dt = (time.perf_counter() - t0) / 3 * 1000
        print(f"{s:16s} cum {dt:8.2f} ms   delta {dt - prev:8.2f} ms")
        prev = dt


if __name__ == "__main__":
    main()
