"""Marching cubes over the block-hashed TSDF volume (pure XLA, static shapes).

Replaces ``ScalableTSDFVolume.extract_triangle_mesh`` (the dominant per-frame
cost of the reference's live loops — reference
CodeThatWorks/1camera-detectsSceneChanges.py:277-291 re-extracts EVERY frame).

XLA cannot produce dynamic-size meshes, so extraction is staged with fixed
budgets (SURVEY.md §7.3 "marching cubes dynamic output"):

A. **survey** — one pass over the *alive prefix* of the pool (block slots are
   allocated densely, so "alive" is a static-size slice chosen from a ladder)
   builds a (R+1)^3 padded corner grid per block. Interior corners are a
   reshape; cross-block faces/edges/corner come from 7 slice-shaped gathers
   through the neighbor hash (regular (R,R)/(R,)/scalar slices per block —
   vector loads, not 817 scalar gathers). Each cell's 8-bit case and triangle
   count follow elementwise; a prefix sum assigns output offsets.
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

# numpy constants (jnp.asarray at import would pin the default backend);
# they are closed over by jitted functions and constant-folded there
_TRI_TABLE = np.asarray(mt.TRI_TABLE)  # (256, 15)
_TRI_COUNT = np.asarray(mt.TRI_COUNT)  # (256,)
_EDGE_A = np.asarray(mt.EDGE_ENDPOINTS[:, 0])  # (12,)
_EDGE_B = np.asarray(mt.EDGE_ENDPOINTS[:, 1])
_CORNERS = np.asarray(mt.CORNER_OFFSETS)  # (8, 3)

EXTRACT_SIZES = (256, 512, 1024, 2048, 4096, 8192, 16384, 32768, 65536)


def _neighbor_slots(table, block_coords):
    """(E, 8) pool slots of the 8 (0/1)^3 neighbor blocks (self = code 0)."""
    keys = vhash.pack_key(block_coords[:, None, :] + _CORNERS[None])  # (E, 8)
    return vhash.lookup(table, keys)


def _padded_grids(t4, w4, nbr, alive, R: int):
    """Padded (R+1)^3 tsdf/weight grids for E blocks.

    t4/w4: (E, R, R, R); nbr: (E, 8) neighbor slots (< E or -1); alive (E,).
    Cross-block faces come from slice-shaped gathers (fast vector loads)."""
    E = t4.shape[0]
    P = R + 1
    tp = jnp.ones((E, P, P, P), jnp.float32)
    wp = jnp.zeros((E, P, P, P), jnp.float32)
    tp = tp.at[:, :R, :R, :R].set(t4)
    wp = wp.at[:, :R, :R, :R].set(jnp.where(alive[:, None, None, None], w4, 0.0))

    def fetch(code, index):
        s = nbr[:, code]
        ok = (s >= 0) & alive
        sc = jnp.where(ok, s, 0)
        t = index(t4, sc)
        w = jnp.where(
            ok.reshape((E,) + (1,) * (t.ndim - 1)), index(w4, sc), 0.0
        )
        return t, w

    # +x face: neighbor local x == 0
    t, w = fetch(1, lambda a, s: a[s, 0, :, :])
    tp = tp.at[:, R, :R, :R].set(t)
    wp = wp.at[:, R, :R, :R].set(w)
    # +y face
    t, w = fetch(2, lambda a, s: a[s, :, 0, :])
    tp = tp.at[:, :R, R, :R].set(t)
    wp = wp.at[:, :R, R, :R].set(w)
    # +z face
    t, w = fetch(4, lambda a, s: a[s, :, :, 0])
    tp = tp.at[:, :R, :R, R].set(t)
    wp = wp.at[:, :R, :R, R].set(w)
    # +xy edge
    t, w = fetch(3, lambda a, s: a[s, 0, 0, :])
    tp = tp.at[:, R, R, :R].set(t)
    wp = wp.at[:, R, R, :R].set(w)
    # +xz edge
    t, w = fetch(5, lambda a, s: a[s, 0, :, 0])
    tp = tp.at[:, R, :R, R].set(t)
    wp = wp.at[:, R, :R, R].set(w)
    # +yz edge
    t, w = fetch(6, lambda a, s: a[s, :, 0, 0])
    tp = tp.at[:, :R, R, R].set(t)
    wp = wp.at[:, :R, R, R].set(w)
    # +xyz corner
    t, w = fetch(7, lambda a, s: a[s, 0, 0, 0])
    tp = tp.at[:, R, R, R].set(t)
    wp = wp.at[:, R, R, R].set(w)
    return tp, wp


@partial(jax.jit, static_argnames=("cfg", "max_cells", "max_tris", "extract_blocks"))
def extract_mesh_arrays(vol: TSDFVolume, cfg: TSDFConfig,
                        max_cells: int = 65536, max_tris: int = 131072,
                        extract_blocks: int = None):
    """Device-side extraction. Returns (vertices (3*max_tris,3), colors,
    num_tris, overflow_flag). ``extract_blocks`` bounds the alive prefix
    processed (blocks are allocated densely, so slots >= n_blocks are dead)."""
    R = cfg.block_resolution
    N = vol.tsdf.shape[0]
    E = min(extract_blocks or N, N)
    C3 = R * R * R

    t4 = vol.tsdf[:E].reshape(E, R, R, R)
    w4 = vol.weight[:E].reshape(E, R, R, R)
    coords = vol.block_coords[:E]
    alive = jax.lax.broadcasted_iota(jnp.int32, (E, 1), 0)[:, 0] < vol.n_blocks
    nbr = _neighbor_slots(vol.table, coords)
    # neighbors beyond the extract prefix are treated as absent (they can
    # only exist if E < n_blocks, which the caller prevents)
    nbr = jnp.where(nbr < E, nbr, -1)

    # ---- stage A: survey ---------------------------------------------------
    tp, wp = _padded_grids(t4, w4, nbr, alive, R)
    inside = (tp < 0.0) & (wp > 0.0)
    validc = wp > 0.0

    def corner_view(a, k):
        dx, dy, dz = mt.CORNER_OFFSETS[k]
        return a[:, dx : dx + R, dy : dy + R, dz : dz + R]

    case = jnp.zeros((E, R, R, R), jnp.int32)
    all_valid = jnp.ones((E, R, R, R), jnp.bool_)
    for k in range(8):
        case = case | (corner_view(inside, k).astype(jnp.int32) << k)
        all_valid = all_valid & corner_view(validc, k)

    # a cell has triangles iff its corners' signs are mixed: every case except
    # 0 and 255 produces geometry — two compares, no table lookup, no gathers
    active4 = all_valid & alive[:, None, None, None] & (case != 0) & (case != 255)

    # ---- stage B: compact active cells --------------------------------------
    active = active4.reshape(-1)
    order = jnp.cumsum(active.astype(jnp.int32)) - 1
    n_active = order[-1] + 1
    dst = jnp.where(active & (order < max_cells), order, max_cells)
    wl_cell = jnp.full((max_cells,), -1, jnp.int32)
    cell_ids = jax.lax.broadcasted_iota(jnp.int32, (E * C3, 1), 0)[:, 0]
    wl_cell = wl_cell.at[dst].set(cell_ids, mode="drop")

    # ---- stage C: emit -------------------------------------------------------
    # LAYOUT RULE: the worklist axis M stays MINOR everywhere. TPU tiles the
    # last two dims to (8, 128); an (M, 15, 3) array pads 3 -> 128 lanes (42x
    # memory blowup — gigabytes at M = 1M). With shapes like (12, 3, M) the
    # padding is negligible.
    live = wl_cell >= 0
    cid = jnp.where(live, wl_cell, 0)
    b = cid // C3
    rem = cid % C3
    ci = rem // (R * R)
    cj = (rem // R) % R
    ck = rem % R

    gi = _CORNERS[:, 0][:, None] + ci[None, :]  # (8, M)
    gj = _CORNERS[:, 1][:, None] + cj[None, :]
    gk = _CORNERS[:, 2][:, None] + ck[None, :]
    # flat-index gathers (single index vector) lower to simpler TPU gathers
    # than 4D advanced indexing
    P = R + 1
    tflat = tp.reshape(-1)
    vals = tflat[((b[None, :] * P + gi) * P + gj) * P + gk]  # (8, M)

    code = ((gi == R).astype(jnp.int32)
            + 2 * (gj == R).astype(jnp.int32)
            + 4 * (gk == R).astype(jnp.int32))
    cslot = nbr[b[None, :], code]
    cslot = jnp.where(cslot >= 0, cslot, 0)
    clin = (gi % R) * R * R + (gj % R) * R + (gk % R)
    # pack RGB into one f32 (exact for 24-bit ints) -> one gather, not three
    V = R * R * R
    cE = vol.color[:E]
    packed = (jnp.round(cE[:, 0] * 255.0) * 65536.0
              + jnp.round(cE[:, 1] * 255.0) * 256.0
              + jnp.round(cE[:, 2] * 255.0)).reshape(-1)  # (E*V,)
    pcol = packed[cslot * V + clin]  # (8, M)
    pr = jnp.floor(pcol / 65536.0)
    pg = jnp.floor((pcol - pr * 65536.0) / 256.0)
    pb_ = pcol - pr * 65536.0 - pg * 256.0
    cols = jnp.stack([pr, pg, pb_]) / 255.0  # (3, 8, M)

    mcase = jnp.zeros((max_cells,), jnp.int32)
    for k in range(8):
        mcase = mcase | ((vals[k] < 0.0).astype(jnp.int32) << k)

    va = vals[_EDGE_A]  # (12, M)
    vb = vals[_EDGE_B]
    denom = va - vb
    frac = va / jnp.where(jnp.abs(denom) > 1e-12, denom, 1e-12)
    frac = jnp.clip(frac, 0.0, 1.0)
    pa = _CORNERS[_EDGE_A].astype(np.float32)  # (12, 3)
    pbt = _CORNERS[_EDGE_B].astype(np.float32)
    cell0 = (coords[b].T * R + jnp.stack([ci, cj, ck])).astype(jnp.float32)  # (3, M)
    epos = ((cell0[None] + 0.5 + pa[:, :, None]
             + frac[:, None, :] * (pbt - pa)[:, :, None]) * cfg.voxel_size
            )  # (12, 3, M)
    ca = cols[:, _EDGE_A]  # (3, 12, M)
    cb2 = cols[:, _EDGE_B]
    ecol = jnp.swapaxes(ca + frac[None] * (cb2 - ca), 0, 1)  # (12, 3, M)

    # tri_edges = TRI_TABLE[mcase] without gathers. Each table row packs its
    # 16 nibble entries (edge ids shifted to [0,12], 15 = "none") into TWO
    # int32 words, so the 256-iteration select only moves (2, M) per step —
    # 16x less traffic than selecting the unpacked (16, M) rows.
    packed_np = np.zeros((2, 256), np.uint32)
    for c in range(256):
        for t in range(15):
            v = int(_TRI_TABLE[c, t]) + 1  # -1 (none) -> nibble 0
            packed_np[t // 8, c] |= np.uint32((v & 0xF) << (4 * (t % 8)))
    tab_packed = jnp.asarray(packed_np.view(np.int32))

    def tab_body(c, pk):
        return jnp.where((mcase == c)[None, :], tab_packed[:, c][:, None], pk)

    packed_sel = jax.lax.fori_loop(0, 256, tab_body,
                                   jnp.zeros((2, max_cells), jnp.int32))
    # unpack 15 nibbles -> (15, M) edge ids (-1 where empty)
    tri_edges = jnp.stack([
        ((jax.lax.shift_right_logical(packed_sel[t // 8], jnp.int32(4 * (t % 8))) & 0xF) - 1)
        for t in range(15)
    ])

    # edge-id -> position/color select, same no-gather trick over 12 edges
    def edge_body(e, carry):
        pos15, col15 = carry
        sel = (tri_edges == e)[:, None, :]  # (15, 1, M)
        pos15 = pos15 + jnp.where(sel, epos[e][None], 0.0)
        col15 = col15 + jnp.where(sel, ecol[e][None], 0.0)
        return pos15, col15

    pos15, col15 = jax.lax.fori_loop(
        0, 12, edge_body,
        (jnp.zeros((15, 3, max_cells), jnp.float32),
         jnp.zeros((15, 3, max_cells), jnp.float32)),
    )

    # per-TRIANGLE compaction: a slot is real iff its first edge id >= 0
    # (exact counts never needed — no TRI_COUNT table, no 8.4M prefix sums)
    tri_valid = live[None, :] & (tri_edges[0::3] >= 0)  # (5, M)
    tv_flat = tri_valid.reshape(-1)
    t_order = jnp.cumsum(tv_flat.astype(jnp.int32)) - 1
    total_tris = t_order[-1] + 1
    out_flat = jnp.where(tv_flat & (t_order < max_tris), t_order, max_tris)  # (5M,)

    # emit as 9 independent minor-axis scatters (scatters along the last axis
    # of a 2D array are the fast path; scattering (3,3,M) chunks into a
    # (3,3,T) buffer serializes badly)
    src_p = pos15.reshape(5, 3, 3, max_cells)  # (tri-slot, vtx, xyz, M)
    src_c = col15.reshape(5, 3, 3, max_cells)
    src_p = jnp.moveaxis(src_p, 0, -2).reshape(9, 5 * max_cells)
    src_c = jnp.moveaxis(src_c, 0, -2).reshape(9, 5 * max_cells)
    # out_flat is (tri-slot major, M minor); match source ordering
    out_rows = jnp.broadcast_to(out_flat.reshape(1, 5 * max_cells), (9, 5 * max_cells))
    verts_t = jnp.zeros((9, max_tris + 1), jnp.float32)
    vcols_t = jnp.zeros((9, max_tris + 1), jnp.float32)
    rows9 = jnp.arange(9, dtype=jnp.int32)[:, None]
    verts_t = verts_t.at[rows9, out_rows].set(src_p, mode="drop")
    vcols_t = vcols_t.at[rows9, out_rows].set(src_c, mode="drop")

    num_tris = jnp.minimum(total_tris, max_tris).astype(jnp.int32)
    overflow = (total_tris > max_tris) | (n_active > max_cells)
    # outputs stay M-minor: (vtx*3+xyz, tri). extract_mesh reorders on host.
    return (verts_t[:, :max_tris].reshape(3, 3, max_tris),
            vcols_t[:, :max_tris].reshape(3, 3, max_tris), num_tris, overflow)


_TRIANGLE_IDX_CACHE = {}


def extract_mesh(vol: TSDFVolume, cfg: TSDFConfig, max_cells: int = 65536,
                 max_tris: int = 131072, auto_grow: bool = True) -> TriangleMesh:
    """Extract a triangle-soup mesh; grows static budgets (x4, recompile)
    if they overflow and ``auto_grow``.

    Device outputs are tri-minor (3, 3, T) to dodge lane padding; this host
    wrapper reorders them to the conventional (3T, 3) soup (numpy leaves in
    the TriangleMesh — extraction is a host-facing operation)."""
    n_alive = int(vol.n_blocks)
    N = vol.tsdf.shape[0]
    E = next((e for e in EXTRACT_SIZES if e >= n_alive), N)
    E = min(E, N)
    while True:
        verts_t, vcols_t, num_tris, overflow = extract_mesh_arrays(
            vol, cfg, max_cells=max_cells, max_tris=max_tris, extract_blocks=E
        )
        if not (auto_grow and bool(overflow)):
            break
        max_cells *= 4
        max_tris *= 4
    # (vertex, xyz, tri) -> (tri, vertex, xyz) -> (3T, 3)
    verts = np.asarray(verts_t).transpose(2, 0, 1).reshape(max_tris * 3, 3)
    vcols = np.asarray(vcols_t).transpose(2, 0, 1).reshape(max_tris * 3, 3)
    if max_tris not in _TRIANGLE_IDX_CACHE:
        _TRIANGLE_IDX_CACHE[max_tris] = np.arange(max_tris * 3, dtype=np.int32).reshape(-1, 3)
    return TriangleMesh(
        vertices=verts,
        triangles=_TRIANGLE_IDX_CACHE[max_tris],
        num_vertices=np.int32(int(num_tris) * 3),
        num_triangles=np.int32(int(num_tris)),
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
