"""Incremental mesh extraction for live loops.

The reference re-extracts the WHOLE mesh every 1-5 frames
(CodeThatWorks/1camera-detectsSceneChanges.py:277-291 every frame;
GoodColorReconstruction.py:84 every 5) — the dominant cost of its live
loops. A live scan only changes the blocks the current frame touches, so
this extractor:

1. detects changed blocks by per-block weight checksums (one cheap device
   rowsum per update — no volume-structure changes needed),
2. re-extracts ONLY those blocks via ``extract_mesh_arrays(emit_mask=...)``
   — untouched alive blocks still feed corner values, so emitted geometry is
   bit-identical to a full extraction of the same blocks,
3. keeps a host-side per-block triangle cache (keyed by block coords,
   grouped via the per-triangle source-cell output) and reassembles the
   full scene soup by concatenation.

Per-update device work scales with the touched-block count (a frame touches
~5-20% of a mid-size scene) instead of the whole volume.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from azurekinect3dreconstruction_tpu.config import TSDFConfig
from azurekinect3dreconstruction_tpu.core.types import TriangleMeshHost
from azurekinect3dreconstruction_tpu.tsdf import marching_cubes as mc
from azurekinect3dreconstruction_tpu.tsdf.volume import TSDFVolume

import jax


@jax.jit
def _checksums(vol: TSDFVolume):
    """(change_checksum, monotonic_checksum) per block, one fused pass.
    Stacked into ONE array so the host pulls both in a single transfer."""
    return jnp.stack([jnp.sum(vol.weight + jnp.abs(vol.tsdf), axis=(1, 2)),
                      jnp.sum(vol.weight, axis=(1, 2))])


def _pack_np(coords: np.ndarray) -> np.ndarray:
    """(..., 3) int block coords -> int64 keys (host-side, vectorized)."""
    c = coords.astype(np.int64)
    return c[..., 0] + (c[..., 1] << 21) + (c[..., 2] << 42)


from functools import partial


@partial(jax.jit, static_argnames=("ntb",))
def _pack_pull(v, c, cells, ntb: int):
    """Bundle stage-2 outputs into ONE (21, ntb) f32 array for a single
    device->host transfer: rows 0-8 vertex xyz (vtx-major), 9-17 colors,
    18-20 cell coords (exact in f32: |coord| <= 8192)."""
    T = v.shape[2]
    return jnp.concatenate([
        v.reshape(9, T)[:, :ntb],
        c.reshape(9, T)[:, :ntb],
        cells.astype(jnp.float32)[:, :ntb],
    ], axis=0)


def _slice_bucket(n: int, cap: int) -> int:
    """Round a dynamic triangle count up to a coarse bucket so the
    device-side pre-transfer slice compiles once per bucket, not once per
    distinct count (a fresh count per update would mean a fresh XLA compile
    per frame — measured as the dominant incremental-update cost)."""
    b = 4096
    while b < n:
        b *= 2
    return min(b, cap)


class IncrementalExtractor:
    def __init__(self, cfg: TSDFConfig, max_cells: int = 1 << 20,
                 max_tris: int = 1 << 18):
        self.cfg = cfg
        self.max_cells = max_cells
        self.max_tris = max_tris
        self._cache: Dict[Tuple[int, int, int], Tuple[np.ndarray, np.ndarray]] = {}
        self._prev_ws: Optional[np.ndarray] = None
        self._prev_mono: Optional[np.ndarray] = None
        self._prev_nb = 0
        self._assembled: Optional[TriangleMeshHost] = None
        self._coords_host: Optional[np.ndarray] = None
        self.last_touched = 0  # blocks re-extracted on the last update

    def reset(self) -> None:
        self._cache.clear()
        self._prev_ws = None
        self._prev_mono = None
        self._prev_nb = 0
        self._assembled = None
        self._coords_host = None

    def update(self, vol: TSDFVolume) -> TriangleMeshHost:
        """Refresh the cache against the volume's current state and return
        the full scene as a triangle soup."""
        N = vol.tsdf.shape[0]
        nb = int(vol.n_blocks)
        # change checksum: weight ALONE saturates at max_integration_weight
        # (a dwelled-on block would go blind to later scene changes), so fold
        # in the tsdf magnitudes, which keep moving while the surface does;
        # the plain weight sum is kept too — it is MONOTONIC, so any decrease
        # proves a volume reset even if the pool already regrew larger
        cks = np.asarray(_checksums(vol))  # one (2, N) transfer
        ws, mono = cks[0], cks[1]
        if nb < self._prev_nb or (
                self._prev_mono is not None
                and bool(np.any(mono < self._prev_mono))):
            self.reset()
        if self._prev_ws is None:
            changed = np.zeros((N,), bool)
            changed[:nb] = True
        else:
            changed = ws != self._prev_ws
            changed[nb:] = False
        self._prev_ws = ws
        self._prev_mono = mono
        self._prev_nb = nb
        self.last_touched = int(changed.sum())

        if self.last_touched:
            # a changed block's own surface can shift cells in the -1
            # neighbor blocks' boundary layer too: dilate the emit set by
            # the 7 negative-corner neighbors (cells sample corners at +1).
            # All vectorized: packed-key sorted search, no Python-set loops.
            # Block coords only ever append, so the host copy is reused
            # until the pool grows (saves one ~30 ms tunnel pull per update).
            if self._coords_host is None or len(self._coords_host) != nb:
                self._coords_host = np.asarray(vol.block_coords[:nb])
            coords = self._coords_host
            all_keys = _pack_np(coords)
            ak_order = np.argsort(all_keys)
            ak_sorted = all_keys[ak_order]
            chg = coords[changed[:nb]]  # (nc, 3)
            offs = np.stack(np.meshgrid([0, -1], [0, -1], [0, -1],
                                        indexing="ij"), -1).reshape(8, 3)
            want = _pack_np(chg[:, None, :] + offs[None]).reshape(-1)
            pos = np.searchsorted(ak_sorted, want)
            pos_c = np.minimum(pos, nb - 1)
            hit = ak_sorted[pos_c] == want
            emit_mask = np.zeros((N,), bool)
            emit_mask[ak_order[pos_c[hit]]] = True
            self.last_touched = int(emit_mask.sum())

            E = mc.snap_extract_blocks(nb, N)
            while True:
                v, c_, n_tris, ovf, cells = mc.extract_mesh_arrays(
                    vol, self.cfg, max_cells=self.max_cells,
                    max_tris=self.max_tris, extract_blocks=E,
                    emit_mask=jnp.asarray(emit_mask), return_cells=True)
                if not bool(ovf):
                    break
                # persist grown budgets: this object lives across updates,
                # so the next refresh starts at the working size
                self.max_cells *= 4
                self.max_tris *= 4
            nt = int(n_tris)
            # ONE device->host pull: verts + colors + cells pack into a
            # single (21, ntb) array sliced ON DEVICE to a BUCKETED length —
            # the transfer scales with the emitted triangle count, the
            # bucket keeps the slice's compiled-shape count finite, and a
            # single pull pays one tunnel round trip instead of three
            ntb = _slice_bucket(nt, self.max_tris)
            packed = np.asarray(_pack_pull(v, c_, cells, ntb))
            verts = (packed[:9].reshape(3, 3, ntb)
                     .transpose(2, 0, 1)[:nt].astype(np.float32))
            vcols = (packed[9:18].reshape(3, 3, ntb)
                     .transpose(2, 0, 1)[:nt].astype(np.float32))
            blk = (packed[18:].T[:nt].astype(np.int64)
                   // self.cfg.block_resolution)

            # replace every emitted block's cache entry (emitted blocks with
            # zero triangles now must drop their stale entry), and prune
            # entries whose block is no longer alive at all
            emitted = {tuple(c) for c in coords[emit_mask[:nb]]}
            for k in emitted:
                self._cache.pop(k, None)
            alive_keys = set(map(tuple, coords))
            for k in [k for k in self._cache if k not in alive_keys]:
                self._cache.pop(k)
            if nt:
                order = np.lexsort(blk.T)
                blk_s = blk[order]
                bounds = np.nonzero(np.any(blk_s[1:] != blk_s[:-1], 1))[0] + 1
                starts = np.concatenate([[0], bounds, [nt]])
                for a, b in zip(starts[:-1], starts[1:]):
                    key = tuple(blk_s[a])
                    self._cache[key] = (verts[order[a:b]], vcols[order[a:b]])

        if self.last_touched == 0 and self._assembled is not None:
            return self._assembled  # nothing changed: reuse the assembly
        if not self._cache:
            self._assembled = TriangleMeshHost(
                vertices=np.zeros((0, 3), np.float32),
                triangles=np.zeros((0, 3), np.int32),
                vertex_colors=np.zeros((0, 3), np.float32))
            return self._assembled
        av = np.concatenate([e[0] for e in self._cache.values()])
        ac = np.concatenate([e[1] for e in self._cache.values()])
        n = av.shape[0]
        self._assembled = TriangleMeshHost(
            vertices=av.reshape(-1, 3),
            triangles=np.arange(3 * n, dtype=np.int32).reshape(-1, 3),
            vertex_colors=ac.reshape(-1, 3))
        return self._assembled
