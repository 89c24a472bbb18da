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
   (positions + packed colors), then compact per TRIANGLE by inverting the
   output permutation (one int scatter) so the final vertex data moves as
   gathers sized by the triangle budget — never as big scatters.

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


def _corner_views(fields, R: int):
    """All 8 corner-shifted views of a per-block boolean field, computed in
    the pool-native merged layout (E, R^3) — no (R+1)^3 padded cube.

    A padded cube has minor dims R+1 (=17), which the TPU lane-pads 17->128
    (10x memory). Instead each (dx, dy, dz) corner view is a composition of
    three one-voxel axis shifts on the FLAT (E, R^3) layout: a lane roll for
    the in-block part plus a boundary-lane injection rolled out of the
    matching neighbor block's field. 12 shift ops total, all vector
    slice/concat/select — no gathers, no padding.

    ``fields``: dict code -> (E, R^3) for the 8 (0/1)^3 neighbor blocks
    (code 0 = self; missing neighbors already masked False).
    Returns dict (dx, dy, dz) -> (E, R^3).
    """
    R2, R3 = R * R, R * R * R
    idx = np.arange(R3)
    mz = (idx % R) == R - 1
    my = (idx // R) % R == R - 1
    mx = (idx // R2) == R - 1

    def shift(off, mask, a_own, a_nbr):
        # value at voxel i becomes field[i + off]; voxels whose +axis step
        # leaves the block instead read the neighbor's axis==0 plane, which
        # sits at i - (R-1)*stride in the neighbor's flat layout
        return jnp.where(mask, jnp.roll(a_nbr, (R - 1) * off, axis=1),
                         jnp.roll(a_own, -off, axis=1))

    sz = lambda a, b: shift(1, mz, a, b)
    sy = lambda a, b: shift(R, my, a, b)
    sx = lambda a, b: shift(R2, mx, a, b)

    z0 = (fields[0], fields[1], fields[2], fields[3])  # own, +x, +y, +xy
    z1 = (sz(fields[0], fields[4]), sz(fields[1], fields[5]),
          sz(fields[2], fields[6]), sz(fields[3], fields[7]))
    views = {}
    for dz, (f0, f1, f2, f3) in ((0, z0), (1, z1)):
        y_rows = ((0, f0, f1), (1, sy(f0, f2), sy(f1, f3)))
        for dy, v_own, v_x in y_rows:
            views[(0, dy, dz)] = v_own
            views[(1, dy, dz)] = sx(v_own, v_x)
    return views


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

    t2 = vol.tsdf[:E].reshape(E, C3)
    w2 = vol.weight[:E].reshape(E, C3)
    coords = vol.block_coords[:E]
    alive = jax.lax.broadcasted_iota(jnp.int32, (E, 1), 0)[:, 0] < vol.n_blocks
    nbr = _neighbor_slots(vol.table, coords)
    # neighbors beyond the extract prefix are treated as absent (they can
    # only exist if E < n_blocks, which the caller prevents)
    nbr = jnp.where(nbr < E, nbr, -1)

    # ---- stage A: survey ---------------------------------------------------
    inside0 = (t2 < 0.0) & (w2 > 0.0) & alive[:, None]
    valid0 = (w2 > 0.0) & alive[:, None]

    def nbr_field(base, code):
        s = nbr[:, code]
        ok = (s >= 0) & alive
        return jnp.where(ok[:, None], base[jnp.where(ok, s, 0)], False)

    ins_f = {0: inside0}
    val_f = {0: valid0}
    for c in range(1, 8):
        ins_f[c] = nbr_field(inside0, c)
        val_f[c] = nbr_field(valid0, c)
    ins_v = _corner_views(ins_f, R)
    val_v = _corner_views(val_f, R)

    case = jnp.zeros((E, C3), jnp.int32)
    all_valid = jnp.ones((E, C3), jnp.bool_)
    for k in range(8):
        key = tuple(mt.CORNER_OFFSETS[k])
        case = case | (ins_v[key].astype(jnp.int32) << k)
        all_valid = all_valid & val_v[key]

    # a cell has triangles iff its corners' signs are mixed: every case except
    # 0 and 255 produces geometry — two compares, no table lookup, no gathers
    active4 = all_valid & (case != 0) & (case != 255)

    # ---- stage B: compact active cells --------------------------------------
    # two-level prefix sum: per-block scans run independently across sublanes;
    # only the (E,) block totals need a global scan
    active = active4.reshape(-1)
    local = jnp.cumsum(active4.astype(jnp.int32), axis=1)  # (E, C3) inclusive
    counts = local[:, -1]
    offs = jnp.cumsum(counts) - counts  # exclusive block offsets
    order = (local - 1 + offs[:, None]).reshape(-1)
    n_active = offs[-1] + counts[-1]
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
    # than 4D advanced indexing; corner values come straight from the pool
    # (boundary corners resolve through the neighbor slots — for active cells
    # all_valid already guarantees the neighbors exist)
    code = ((gi == R).astype(jnp.int32)
            + 2 * (gj == R).astype(jnp.int32)
            + 4 * (gk == R).astype(jnp.int32))
    cslot = nbr[b[None, :], code]
    cslot = jnp.where(cslot >= 0, cslot, 0)
    clin = (gi % R) * R * R + (gj % R) * R + (gk % R)
    vals = t2.reshape(-1)[cslot * C3 + clin]  # (8, M)
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
    cell0 = (coords[b].T * R + jnp.stack([ci, cj, ck])).astype(jnp.float32)  # (3, M)
    ca = cols[:, _EDGE_A]  # (3, 12, M)
    cb2 = cols[:, _EDGE_B]
    ecol_ch = ca + frac[None] * (cb2 - ca)  # (3, 12, M)
    # re-pack interpolated edge colors to one f32 (8 bits/channel — the
    # source colors are u8, so this quantization is below source granularity);
    # the emit stage then needs ONE color gather per vertex, not three
    ecol_pk = (jnp.round(ecol_ch[0] * 255.0) * 65536.0
               + jnp.round(ecol_ch[1] * 255.0) * 256.0
               + jnp.round(ecol_ch[2] * 255.0))  # (12, M)

    # tri_edges = TRI_TABLE[mcase] without gathers: the 256-case row select
    # is an MXU matmul of the (15, 256) table against a bf16 one-hot of the
    # case codes. Edge ids + 1 are <= 13, exact in bf16, so the product is
    # exact; the MXU does in ~1 ms what a 256-step select loop did in ~33 ms.
    onehot = (mcase[None, :] ==
              jax.lax.broadcasted_iota(jnp.int32, (256, 1), 0)).astype(jnp.bfloat16)
    tab15 = (_TRI_TABLE.T + 1).astype(np.float32)  # (15, 256), 0 = "none"
    tri_edges = jnp.dot(jnp.asarray(tab15, jnp.bfloat16), onehot,
                        preferred_element_type=jnp.float32).astype(jnp.int32) - 1

    # per-TRIANGLE compaction: a slot is real iff its first edge id >= 0
    # (exact counts never needed — no TRI_COUNT table, no 8.4M prefix sums)
    te = tri_edges.reshape(5, 3, max_cells)  # (tri-slot, vtx, M)
    tri_valid = live[None, :] & (te[:, 0] >= 0)  # (5, M)
    tv_flat = tri_valid.reshape(-1)
    t_order = jnp.cumsum(tv_flat.astype(jnp.int32)) - 1
    total_tris = t_order[-1] + 1
    out_flat = jnp.where(tv_flat & (t_order < max_tris), t_order, max_tris)  # (5M,)

    # emit by INVERTING the compaction permutation: one int32 scatter builds
    # inv (triangle -> source slot), then everything else is gathers sized by
    # max_tris, not 5*max_cells. (The previous 9-row scatter emit moved
    # 18 x 5M scattered f32 — 65% of total extraction time; this moves one
    # 5M int scatter + ~13 x T gathered f32.) Each triangle's 3 edge ids ride
    # as one packed int so the worklist payload is a single gather.
    pe = ((te[:, 0] + 1) | ((te[:, 1] + 1) << 4) | ((te[:, 2] + 1) << 8))  # (5, M)
    src_idx = jax.lax.broadcasted_iota(jnp.int32, (5 * max_cells, 1), 0)[:, 0]
    inv = jnp.zeros((max_tris + 1,), jnp.int32)
    inv = inv.at[out_flat].set(src_idx, mode="drop")[:max_tris]
    m = inv % max_cells  # worklist cell of triangle t
    pe_t = pe.reshape(-1)[inv]  # (T,) — 1 gather
    ev = jnp.stack([pe_t & 0xF, (pe_t >> 4) & 0xF, (pe_t >> 8) & 0xF]) - 1
    ev = jnp.maximum(ev, 0)  # (3, T) edge id per vertex (trash rows -> 0)

    # positions are RECOMPUTED per triangle vertex from gathered frac + cell
    # origin (same f32 expression as a per-edge precompute — bit-identical —
    # but 6 gathers/triangle instead of 9, and no (12, 3, M) buffer). The
    # edge-endpoint constants come from a 12-term mask-sum (VPU-cheap), never
    # a gather. Output is directly tri-minor (vtx, xyz, T): no transpose,
    # no scatter.
    frac_t = frac.reshape(-1)[ev * max_cells + m[None, :]]  # (3, T)
    cell0_t = cell0[:, m]  # (3, T)
    pa_np = _CORNERS[_EDGE_A].astype(np.float32)  # (12, 3)
    pb_np = _CORNERS[_EDGE_B].astype(np.float32)
    pa_sel = jnp.zeros((3, 3, max_tris), jnp.float32)
    pd_sel = jnp.zeros((3, 3, max_tris), jnp.float32)
    for e in range(12):
        sel = (ev == e)[:, None, :]
        pa_sel = pa_sel + sel * pa_np[e][None, :, None]
        pd_sel = pd_sel + sel * (pb_np[e] - pa_np[e])[None, :, None]
    verts = ((cell0_t[None] + 0.5 + pa_sel + frac_t[:, None, :] * pd_sel)
             * cfg.voxel_size)  # (3, 3, T)
    cols_pk = ecol_pk.reshape(-1)[ev * max_cells + m[None, :]]  # (3, T)
    cr = jnp.floor(cols_pk / 65536.0)
    cg = jnp.floor((cols_pk - cr * 65536.0) / 256.0)
    cb3 = cols_pk - cr * 65536.0 - cg * 256.0
    vcols = jnp.stack([cr, cg, cb3], axis=1) / 255.0  # (3, 3, T)

    num_tris = jnp.minimum(total_tris, max_tris).astype(jnp.int32)
    overflow = (total_tris > max_tris) | (n_active > max_cells)
    # zero the tail (unset inv slots gathered garbage from source slot 0)
    tmask = (jnp.arange(max_tris, dtype=jnp.int32) < num_tris)[None, None, :]
    # outputs stay M-minor: (vtx, xyz, tri). extract_mesh reorders on host.
    return (jnp.where(tmask, verts, 0.0), jnp.where(tmask, vcols, 0.0),
            num_tris, overflow)


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
