"""Marching cubes over the block-hashed TSDF volume (pure XLA, static shapes).

Replaces ``ScalableTSDFVolume.extract_triangle_mesh`` (the dominant per-frame
cost of the reference's live loops — reference
CodeThatWorks/1camera-detectsSceneChanges.py:277-291 re-extracts EVERY frame).

XLA cannot produce dynamic-size meshes, so extraction is staged with fixed
budgets (SURVEY.md §7.3 "marching cubes dynamic output"):

A. **survey** — one elementwise pass over all blocks builds a (R+1)^3 padded
   corner grid per block (interior = reshape, faces = 817 cross-block gathers
   per block via the neighbor hash), then computes each cell's 8-bit case and
   triangle count. A prefix sum assigns every cell its output offset.
B. **compact** — active cells (ntri > 0) are scattered into a fixed-capacity
   worklist. Typical scans activate ~1-3% of cells, so the expensive stage
   only touches surface cells.
C. **emit** — for worklist cells, interpolate the 12 edge intersections
   (positions + colors) and scatter up to 5 triangles each into fixed-size
   vertex buffers at their precomputed offsets.

The output is a triangle soup (vertex sharing is done host-side by
``weld_vertices`` when an indexed mesh is needed, e.g. for OBJ export).
Budgets that overflow set a flag so callers can retry with a larger static
budget (new compile, cached thereafter).
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from azurekinect3dreconstruction_tpu.config import TSDFConfig
from azurekinect3dreconstruction_tpu.core.types import TriangleMesh, TriangleMeshHost
from azurekinect3dreconstruction_tpu.tsdf import mc_tables as mt
from azurekinect3dreconstruction_tpu.tsdf import hash as vhash
from azurekinect3dreconstruction_tpu.tsdf.volume import TSDFVolume

_TRI_TABLE = jnp.asarray(mt.TRI_TABLE)  # (256, 15)
_TRI_COUNT = jnp.asarray(mt.TRI_COUNT)  # (256,)
_EDGE_A = jnp.asarray(mt.EDGE_ENDPOINTS[:, 0])  # (12,)
_EDGE_B = jnp.asarray(mt.EDGE_ENDPOINTS[:, 1])
_CORNERS = jnp.asarray(mt.CORNER_OFFSETS)  # (8, 3)


def _neighbor_slots(vol: TSDFVolume):
    """(N, 8) pool slots of the 8 (0/1)^3 neighbor blocks (self = code 0)."""
    offs = _CORNERS  # (8, 3) — same 0/1 pattern
    keys = vhash.pack_key(vol.block_coords[:, None, :] + offs[None])  # (N, 8)
    return vhash.lookup(vol.table, keys)


def _padded_grids(vol: TSDFVolume, R: int):
    """Padded (R+1)^3 tsdf/weight grids per block; cross-block faces gathered
    through the neighbor table. Missing neighbors read weight 0."""
    N = vol.tsdf.shape[0]
    nbr = _neighbor_slots(vol)  # (N, 8)
    t_own = vol.tsdf.reshape(N, R, R, R)
    w_own = vol.weight.reshape(N, R, R, R)

    P = R + 1
    tp = jnp.ones((N, P, P, P), jnp.float32)
    wp = jnp.zeros((N, P, P, P), jnp.float32)
    tp = tp.at[:, :R, :R, :R].set(t_own)
    wp = wp.at[:, :R, :R, :R].set(w_own)

    def fetch(code, sel):
        """Gather the plane/edge/corner at local coords given by sel arrays."""
        slot = nbr[:, code]  # (N,)
        ok = slot >= 0
        slot_c = jnp.where(ok, slot, 0)
        li, lj, lk = sel
        lin = li * R * R + lj * R + lk  # broadcastable to (len_i, len_j, len_k)
        t = vol.tsdf[slot_c[:, None, None, None], lin[None]]
        w = vol.weight[slot_c[:, None, None, None], lin[None]]
        w = jnp.where(ok[:, None, None, None], w, 0.0)
        return t, w

    r_idx = jnp.arange(R)
    z1 = jnp.zeros((1,), jnp.int32)
    # +x face (gi == R -> neighbor code 1, local i = 0)
    t, w = fetch(1, (z1[:, None, None], r_idx[None, :, None], r_idx[None, None, :]))
    tp = tp.at[:, R, :R, :R].set(t[:, 0])
    wp = wp.at[:, R, :R, :R].set(w[:, 0])
    # +y face (code 2)
    t, w = fetch(2, (r_idx[:, None, None], z1[None, :, None], r_idx[None, None, :]))
    tp = tp.at[:, :R, R, :R].set(t[:, :, 0])
    wp = wp.at[:, :R, R, :R].set(w[:, :, 0])
    # +z face (code 4)
    t, w = fetch(4, (r_idx[:, None, None], r_idx[None, :, None], z1[None, None, :]))
    tp = tp.at[:, :R, :R, R].set(t[:, :, :, 0])
    wp = wp.at[:, :R, :R, R].set(w[:, :, :, 0])
    # +xy edge (code 3)
    t, w = fetch(3, (z1[:, None, None], z1[None, :, None], r_idx[None, None, :]))
    tp = tp.at[:, R, R, :R].set(t[:, 0, 0])
    wp = wp.at[:, R, R, :R].set(w[:, 0, 0])
    # +xz edge (code 5)
    t, w = fetch(5, (z1[:, None, None], r_idx[None, :, None], z1[None, None, :]))
    tp = tp.at[:, R, :R, R].set(t[:, 0, :, 0])
    wp = wp.at[:, R, :R, R].set(w[:, 0, :, 0])
    # +yz edge (code 6)
    t, w = fetch(6, (r_idx[:, None, None], z1[None, :, None], z1[None, None, :]))
    tp = tp.at[:, :R, R, R].set(t[:, :, 0, 0])
    wp = wp.at[:, :R, R, R].set(w[:, :, 0, 0])
    # +xyz corner (code 7)
    t, w = fetch(7, (z1[:, None, None], z1[None, :, None], z1[None, None, :]))
    tp = tp.at[:, R, R, R].set(t[:, 0, 0, 0])
    wp = wp.at[:, R, R, R].set(w[:, 0, 0, 0])
    return tp, wp, nbr


@partial(jax.jit, static_argnames=("cfg", "max_cells", "max_tris"))
def extract_mesh_arrays(vol: TSDFVolume, cfg: TSDFConfig,
                        max_cells: int = 65536, max_tris: int = 131072):
    """Device-side extraction. Returns (vertices (3*max_tris,3), colors,
    num_tris, overflow_flag)."""
    R = cfg.block_resolution
    N = vol.tsdf.shape[0]
    C3 = R * R * R

    # ---- stage A: survey --------------------------------------------------
    tp, wp, nbr = _padded_grids(vol, R)
    inside = (tp < 0.0) & (wp > 0.0)
    validc = wp > 0.0

    # cell corner view: corners k at (i+dx, j+dy, k+dz)
    def corner_view(a, k):
        dx, dy, dz = mt.CORNER_OFFSETS[k]
        return a[:, dx : dx + R, dy : dy + R, dz : dz + R]

    case = jnp.zeros((N, R, R, R), jnp.int32)
    all_valid = jnp.ones((N, R, R, R), jnp.bool_)
    for k in range(8):
        case = case | (corner_view(inside, k).astype(jnp.int32) << k)
        all_valid = all_valid & corner_view(validc, k)

    slot_alive = (
        jax.lax.broadcasted_iota(jnp.int32, (N, 1, 1, 1), 0) < vol.n_blocks
    )
    ntri = jnp.where(all_valid & slot_alive, _TRI_COUNT[case], 0)  # (N,R,R,R)

    ntri_flat = ntri.reshape(-1)
    offsets = jnp.cumsum(ntri_flat) - ntri_flat  # exclusive prefix sum
    total_tris = offsets[-1] + ntri_flat[-1]

    # ---- stage B: compact active cells ------------------------------------
    active = ntri_flat > 0
    order = jnp.cumsum(active.astype(jnp.int32)) - 1
    n_active = order[-1] + 1
    dst = jnp.where(active & (order < max_cells), order, max_cells)
    wl_cell = jnp.full((max_cells,), -1, jnp.int32)
    wl_off = jnp.zeros((max_cells,), jnp.int32)
    cell_ids = jax.lax.broadcasted_iota(jnp.int32, (N * C3, 1), 0)[:, 0]
    wl_cell = wl_cell.at[dst].set(cell_ids, mode="drop")
    wl_off = wl_off.at[dst].set(offsets.astype(jnp.int32), mode="drop")

    # ---- stage C: emit -----------------------------------------------------
    live = wl_cell >= 0
    cid = jnp.where(live, wl_cell, 0)
    b = cid // C3
    rem = cid % C3
    ci = rem // (R * R)
    cj = (rem // R) % R
    ck = rem % R

    # corner values from the padded grid + colors via neighbor gather
    gi = ci[:, None] + _CORNERS[None, :, 0]  # (M, 8)
    gj = cj[:, None] + _CORNERS[None, :, 1]
    gk = ck[:, None] + _CORNERS[None, :, 2]
    vals = tp[b[:, None], gi, gj, gk]  # (M, 8)

    code = ((gi == R).astype(jnp.int32)
            + 2 * (gj == R).astype(jnp.int32)
            + 4 * (gk == R).astype(jnp.int32))
    cslot = nbr[b[:, None], code]
    cslot = jnp.where(cslot >= 0, cslot, 0)
    clin = (gi % R) * R * R + (gj % R) * R + (gk % R)
    cols = vol.color[cslot, :, clin]  # channel-major pool -> (M, 8, 3)

    mcase = jnp.zeros(b.shape, jnp.int32)
    for k in range(8):
        mcase = mcase | ((vals[:, k] < 0.0).astype(jnp.int32) << k)
    mntri = jnp.where(live, _TRI_COUNT[mcase], 0)

    # 12 edge intersections per cell
    va = vals[:, _EDGE_A]  # (M, 12)
    vb = vals[:, _EDGE_B]
    denom = va - vb
    frac = va / jnp.where(jnp.abs(denom) > 1e-12, denom, 1e-12)
    frac = jnp.clip(frac, 0.0, 1.0)
    pa = _CORNERS[_EDGE_A].astype(jnp.float32)  # (12, 3)
    pb = _CORNERS[_EDGE_B].astype(jnp.float32)
    base = (vol.block_coords[b] * R + jnp.stack([ci, cj, ck], -1)).astype(jnp.float32)
    # corner positions are voxel centers -> +0.5
    epos = (base[:, None, :] + 0.5 + pa[None] + frac[..., None] * (pb - pa)[None]
            ) * cfg.voxel_size  # (M, 12, 3)
    ca = cols[:, _EDGE_A]  # (M, 12, 3)
    cb = cols[:, _EDGE_B]
    ecol = ca + frac[..., None] * (cb - ca)

    tri_edges = _TRI_TABLE[mcase]  # (M, 15)
    verts = jnp.zeros((max_tris * 3, 3), jnp.float32)
    vcols = jnp.zeros((max_tris * 3, 3), jnp.float32)
    M = max_cells
    for t in range(mt.MAX_TRIS_PER_CELL):
        emit = live & (t < mntri) & (wl_off + t < max_tris)
        out = jnp.where(emit, (wl_off + t) * 3, max_tris * 3)
        for v in range(3):
            e = jnp.clip(tri_edges[:, 3 * t + v], 0, 11)
            p = epos[jnp.arange(M), e]
            c = ecol[jnp.arange(M), e]
            verts = verts.at[out + v].set(p, mode="drop")
            vcols = vcols.at[out + v].set(c, mode="drop")

    num_tris = jnp.minimum(total_tris, max_tris).astype(jnp.int32)
    overflow = (total_tris > max_tris) | (n_active > max_cells)
    return verts, vcols, num_tris, overflow


_TRIANGLE_IDX_CACHE = {}


def extract_mesh(vol: TSDFVolume, cfg: TSDFConfig, max_cells: int = 65536,
                 max_tris: int = 131072, auto_grow: bool = True) -> TriangleMesh:
    """Extract a triangle-soup mesh; grows static budgets (x4, recompile)
    if they overflow and ``auto_grow``."""
    while True:
        verts, vcols, num_tris, overflow = extract_mesh_arrays(
            vol, cfg, max_cells=max_cells, max_tris=max_tris
        )
        if not (auto_grow and bool(overflow)):
            break
        max_cells *= 4
        max_tris *= 4
    if max_tris not in _TRIANGLE_IDX_CACHE:
        _TRIANGLE_IDX_CACHE[max_tris] = jnp.arange(max_tris * 3, dtype=jnp.int32).reshape(-1, 3)
    return TriangleMesh(
        vertices=verts,
        triangles=_TRIANGLE_IDX_CACHE[max_tris],
        num_vertices=num_tris * 3,
        num_triangles=num_tris,
        vertex_colors=vcols,
    )


def weld_vertices(mesh: TriangleMeshHost, decimals: int = 6) -> TriangleMeshHost:
    """Host-side vertex welding: triangle soup -> indexed mesh (for OBJ/PLY
    export parity with Open3D's indexed meshes)."""
    keys = np.round(mesh.vertices, decimals)
    uniq, index, inverse = np.unique(
        keys, axis=0, return_index=True, return_inverse=True
    )
    tris = inverse[mesh.triangles]
    out = TriangleMeshHost(
        vertices=mesh.vertices[index],
        triangles=tris.astype(np.int32),
        vertex_colors=None if mesh.vertex_colors is None else mesh.vertex_colors[index],
    )
    return out
