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
    """(change_checksum, monotonic_checksum) per block, one fused pass."""
    return (jnp.sum(vol.weight + jnp.abs(vol.tsdf), axis=(1, 2)),
            jnp.sum(vol.weight, axis=(1, 2)))


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
        self.last_touched = 0  # blocks re-extracted on the last update

    def reset(self) -> None:
        self._cache.clear()
        self._prev_ws = None
        self._prev_mono = None
        self._prev_nb = 0
        self._assembled = None

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
        ws, mono = (np.asarray(a) for a in _checksums(vol))
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
            # the 7 negative-corner neighbors (cells sample corners at +1)
            coords = np.asarray(vol.block_coords[:nb])
            chg = set(map(tuple, coords[changed[:nb]]))
            emit = set(chg)
            for c in chg:
                for dx in (0, -1):
                    for dy in (0, -1):
                        for dz in (0, -1):
                            emit.add((c[0] + dx, c[1] + dy, c[2] + dz))
            emit_mask = np.zeros((N,), bool)
            keys = {tuple(c): i for i, c in enumerate(map(tuple, coords))}
            for c in emit:
                i = keys.get(c)
                if i is not None:
                    emit_mask[i] = True
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
            # slice ON DEVICE before pulling: the transfer scales with the
            # emitted triangle count, not the static budget
            verts = np.asarray(v[:, :, :nt]).transpose(2, 0, 1)
            vcols = np.asarray(c_[:, :, :nt]).transpose(2, 0, 1)
            blk = np.asarray(cells[:, :nt]).T // self.cfg.block_resolution

            # replace every emitted block's cache entry (emitted blocks with
            # zero triangles now must drop their stale entry), and prune
            # entries whose block is no longer alive at all
            emitted = {tuple(c) for c in coords[emit_mask[:nb]]}
            for k in emitted:
                self._cache.pop(k, None)
            alive_keys = set(keys)
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
