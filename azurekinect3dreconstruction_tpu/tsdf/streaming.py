"""Host streaming for unbounded scenes on a fixed HBM block pool.

The reference's ``ScalableTSDFVolume`` grows its std::unordered_map without
bound (reference CreateMesh.py:300-336; the long recording sessions of
GoodColorReconstruction.py:568-685 rely on that), while this framework's
pool is a fixed-capacity HBM array (tsdf/volume.py) whose exhaustion sets a
sticky overflow flag. This module closes that scale gap the way production
voxel-hashing systems do (host streaming a la Niessner et al.: swap
far-from-camera blocks out to host memory, swap them back on revisit), so a
scan of any spatial extent runs in constant device memory — up to the
coordinate space itself: hash.pack_key addresses block coords in
[-512, 512)^3 (+-41 m from the origin at 8 cm blocks), which binds every
volume in this framework, streamed or not.

Mechanism (all fixed-shape, bucketed device calls):

- **evict**: when the pool passes ``high_water``, blocks farther than
  ``evict_dist`` from the camera are pulled to a host store (one bucketed
  row gather) and the pool is COMPACTED device-side: survivors re-packed
  into a dense prefix with one full-pool row gather + a fresh hash table
  via ``hash.build_table`` (explicit key->slot mapping). The dense-prefix
  invariant every consumer relies on (integrate masks, extraction prefix
  scans) is preserved by construction.
- **reload**: stored blocks within ``reload_dist`` of the camera are
  re-inserted (``hash.insert``) and their payloads scattered back. A fresh
  slot restores the stored data BIT-EXACTLY; a block that was concurrently
  re-allocated live (policy violation, see below) degrades gracefully to a
  weighted merge instead of losing either side.
- **frozen geometry**: marching-cubes cells of block B read corner values
  from B's positive-corner neighbors, so evicting V silently changes what
  B = V - corner would emit. The manager therefore keeps a per-block FROZEN
  set with the local invariant *frozen(B) <=> B is off-device OR some
  existing positive-corner neighbor of B is off-device*. Any block ENTERING
  the frozen set is extracted right then (compact form of
  ``marching_cubes.extract_mesh_arrays`` — the same sel/nbr_sel machinery
  the incremental extractor uses) while all its corner suppliers are still
  resident, and its triangle soup is cached on host. ``extract_mesh``
  then emits live geometry only for un-frozen blocks (``emit_mask``) and
  appends the cached soups: the result is BIT-IDENTICAL to a full
  extraction of an infinite pool, because every cell is evaluated exactly
  once against the same voxel values either live or at freeze time.

Policy contract (what makes frozen caches immutable): integration can only
touch blocks within ``depth_trunc + sdf_trunc`` of the camera, so with
``reload_dist`` above that reach and ``evict_dist > reload_dist``
(hysteresis), frozen blocks are re-activated (reloaded + unfrozen) before
the camera can integrate into them again. ``tick`` runs the policy every
``check_interval`` frames; the camera must not cover
``reload_dist - integration reach`` meters within one interval.

The sticky ``vol.overflow`` flag stays meaningful: with enough headroom it
fires only when the WORKING SET (blocks within evict_dist) itself exceeds
the pool, which no streaming scheme can fix without a bigger pool. Since
eviction runs at tick cadence, size the headroom accordingly:
``(1 - high_water) * block_capacity`` must exceed the blocks a burst of
``check_interval`` frames can allocate (tens per frame in steady scanning;
``allocate``'s dedup_budget caps the absolute worst case).
"""

from __future__ import annotations

from functools import partial
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from azurekinect3dreconstruction_tpu.config import TSDFConfig
from azurekinect3dreconstruction_tpu.core.camera import Intrinsics
from azurekinect3dreconstruction_tpu.core.types import TriangleMeshHost
from azurekinect3dreconstruction_tpu.tsdf import hash as vhash
from azurekinect3dreconstruction_tpu.tsdf import marching_cubes as mc
from azurekinect3dreconstruction_tpu.tsdf import mc_tables as mt
from azurekinect3dreconstruction_tpu.tsdf import volume as tsdf_volume
from azurekinect3dreconstruction_tpu.tsdf.volume import TSDFVolume
from azurekinect3dreconstruction_tpu.utils.telemetry import log_warning

_CORNERS = np.asarray(mt.CORNER_OFFSETS)  # (8, 3); [0] = self, [1:] positive

# host-side key math — the SAME definition the device hash uses (hash.py),
# so the packings cannot drift
pack_np = vhash.pack_key_np
unpack_np = vhash.unpack_key_np


# pow2 size ladder shared with the incremental extractor (one definition:
# the ladder controls the bounded-compile-count guarantee both document)
_bucket = mc.pow2_bucket


# ---------------------------------------------------------------------------
# device ops (shapes bucketed by the host caller)
# ---------------------------------------------------------------------------


@jax.jit
def _gather_rows(vol: TSDFVolume, slots):
    """Compact payload of the given pool slots (for the eviction pull)."""
    s = jnp.asarray(slots, jnp.int32)
    return vol.tsdf[s], vol.weight[s], vol.color[s], vol.block_coords[s]


@jax.jit
def _state_pull(vol: TSDFVolume):
    """(n_blocks, block_coords, per-block change checksum) in ONE pull.
    The checksum wrap-sums the raw tsdf+weight BITS (any bit change =
    change, reduction-order-independent — the same trick as
    incremental._checksums and for the same reason); it detects frozen
    blocks that were integrated into DESPITE the policy (reload-race
    windows), whose cached soups would otherwise go silently stale."""
    bits = lambda a: jax.lax.bitcast_convert_type(a, jnp.int32)
    cks = jnp.sum(bits(vol.tsdf) + bits(vol.weight), axis=(1, 2))
    return vol.n_blocks, vol.block_coords, cks


@jax.jit
def _compact(vol: TSDFVolume, perm, n_keep) -> TSDFVolume:
    """Re-pack survivors into a dense prefix. ``perm[i]`` = old slot of new
    slot i for i < n_keep (rows past n_keep arbitrary valid indices). Only
    WEIGHT is zeroed on freed rows: weight == 0 is the framework-wide
    invalid marker (integrate's running mean, extraction's validity mask,
    and fresh-slot reuse all key off it), so tsdf/color garbage on free
    rows is unobservable."""
    cap = vol.tsdf.shape[0]
    iota = jnp.arange(cap, dtype=jnp.int32)
    keep = iota < n_keep
    p = jnp.where(keep, jnp.asarray(perm, jnp.int32), 0)
    bc = vol.block_coords[p]
    keys = jnp.where(keep, vhash.pack_key(bc), vhash.EMPTY_KEY)
    table, ok = vhash.build_table(keys, iota, vol.table_keys.shape[0])
    return vol._replace(
        table_keys=table.keys,
        table_vals=table.vals,
        n_blocks=jnp.asarray(n_keep, jnp.int32),
        block_coords=bc,
        tsdf=vol.tsdf[p],
        weight=jnp.where(keep[:, None, None], vol.weight[p], 0.0),
        color=vol.color[p],
        overflow=vol.overflow | ~ok,
    )


@partial(jax.jit, static_argnames=("cfg",))
def _scatter_reload(vol: TSDFVolume, keys, coords, tK, wK, cK,
                    cfg: TSDFConfig):
    """Insert stored blocks back into the pool. Fresh slots (the policy-
    compliant case) restore the stored payload bit-exactly; a key that is
    unexpectedly live again merges by integration weight instead of
    clobbering either side. Padding lanes use keys == EMPTY_KEY.

    Returns ``(vol, vals)`` — per-key assigned slots, MISS where the pool
    was full. The caller re-stores dropped payloads and retries after the
    next eviction, so a full-pool reload DEFERS instead of losing data (and
    does not set the sticky overflow flag: it is recoverable, unlike a
    working set that genuinely exceeds the pool)."""
    cap = vol.tsdf.shape[0]
    table, counter, vals, _overflowed = vhash.insert(
        vol.table, vol.n_blocks, jnp.asarray(keys, jnp.int32),
        jnp.int32(cap - 1))  # last row = Pallas trash slot, as in allocate()
    slots = jnp.where(vals >= 0, vals, cap)  # cap = dropped
    sc = jnp.where(vals >= 0, vals, 0)
    w_old = vol.weight[sc]
    fresh = w_old <= 0.0
    denom = jnp.maximum(w_old + wK, 1e-6)
    t_new = jnp.where(fresh, tK, (vol.tsdf[sc] * w_old + tK * wK) / denom)
    w4 = w_old[:, None]
    d4 = denom[:, None]
    c_new = jnp.where(fresh[:, None], cK,
                      (vol.color[sc] * w4 + cK * wK[:, None]) / d4)
    w_new = jnp.minimum(w_old + wK, cfg.max_integration_weight)
    return vol._replace(
        table_keys=table.keys,
        table_vals=table.vals,
        n_blocks=counter,
        block_coords=vol.block_coords.at[slots].set(coords, mode="drop"),
        tsdf=vol.tsdf.at[slots].set(t_new, mode="drop"),
        weight=vol.weight.at[slots].set(w_new, mode="drop"),
        color=vol.color.at[slots].set(c_new, mode="drop"),
    ), vals


# ---------------------------------------------------------------------------
# the manager
# ---------------------------------------------------------------------------


class StreamingTSDF:
    """Fixed-pool TSDF volume + host block store + frozen-geometry cache.

    Owns a ``TSDFVolume`` (``self.vol``); integration goes through
    :meth:`integrate_frame` (which runs the streaming policy every
    ``check_interval`` frames) or externally with explicit :meth:`tick`
    calls. ``reload_dist`` must exceed the integration reach
    (``depth_trunc + sdf_trunc`` + one block diagonal) and ``evict_dist``
    must exceed ``reload_dist`` (hysteresis) — violations degrade to a
    weighted merge on reload rather than corruption, but break the
    bit-exactness contract of the frozen cache."""

    def __init__(self, cfg: TSDFConfig, evict_dist: float,
                 reload_dist: float, high_water: float = 0.85,
                 check_interval: int = 8,
                 max_cells: int = 65536, max_tris: int = 131072,
                 vol: Optional[TSDFVolume] = None):
        """``vol``: adopt an existing pool instead of allocating one — the
        pipeline wiring passes its own volume so only ONE pool ever exists
        (a second create would transiently double HBM)."""
        assert evict_dist > reload_dist > 0, (evict_dist, reload_dist)
        self.cfg = cfg
        self.vol = tsdf_volume.create(cfg) if vol is None else vol
        self.evict_dist = float(evict_dist)
        self.reload_dist = float(reload_dist)
        self.high_water = int(high_water * cfg.block_capacity)
        self.check_interval = int(check_interval)
        self.max_cells = max_cells
        self.max_tris = max_tris
        # key -> (tsdf (s,128), weight (s,128), color (3,s,128), coord (3,))
        self.store: Dict[int, Tuple[np.ndarray, ...]] = {}
        # key -> (verts (m, 3, 3), cols (m, 3, 3)); presence == frozen
        self.soups: Dict[int, Tuple[np.ndarray, np.ndarray]] = {}
        # key -> (exists (8,) bool, cks (8,) i32): the recorded state of the
        # block's +corner NEIGHBORHOOD (code 0 = self) when its soup was
        # cut. A soup stays valid exactly while that environment is
        # unchanged — the block's own data, each supplier's data, AND the
        # existence set (a neighbor appearing where none existed changes
        # which boundary cells emit).
        self._soup_env: Dict[int, Tuple[np.ndarray, np.ndarray]] = {}
        # key -> change checksum of each STORED block (its data is immutable
        # off-device, so this is the value to compare environments against)
        self._stored_cks: Dict[int, int] = {}
        # live-block checksums at the END of the last tick: the change
        # detector behind the supplier rule (changed live blocks must have
        # their stored +corner suppliers resident)
        self._live_cks: Dict[int, int] = {}
        self._since_check = 0
        self.n_evictions = 0
        self.n_reloads = 0
        self.n_stale_refreshes = 0

    @staticmethod
    def integration_reach(cfg) -> float:
        """Farthest block center a frame can touch, from a PipelineConfig:
        max depth x the diagonal-FOV secant (~1.45 for the Kinect NFOV
        corner rays) + the truncation band + one block diagonal. The ONE
        definition of the policy-critical quantity — for_pipeline derives
        the reload ring from it and live_mono re-checks it after runtime
        depth-trunc retuning."""
        return (1.45 * cfg.camera.depth_trunc + cfg.tsdf.sdf_trunc
                + 1.8 * cfg.tsdf.block_size)

    @classmethod
    def for_pipeline(cls, cfg, high_water: float = 0.85,
                     check_interval: int = 8, margin: float = 0.5,
                     **kw) -> "StreamingTSDF":
        """Safe distances derived from a ``PipelineConfig``: the reload
        ring sits ``margin`` meters beyond :meth:`integration_reach` (the
        camera must not cover more than ``margin`` per check interval),
        eviction one more meter out (hysteresis)."""
        reload_dist = cls.integration_reach(cfg) + margin
        return cls(cfg.tsdf, evict_dist=reload_dist + 1.0,
                   reload_dist=reload_dist, high_water=high_water,
                   check_interval=check_interval, **kw)

    def reset_state(self) -> None:
        """Forget everything (the pipeline-level 'C' volume reset): fresh
        pool, empty store and caches."""
        self.vol = tsdf_volume.create(self.cfg)
        self.store.clear()
        self.soups.clear()
        self._soup_env.clear()
        self._stored_cks.clear()
        self._live_cks.clear()
        self._since_check = 0

    # -- per-frame ----------------------------------------------------------

    def integrate_frame(self, depth, color, rays, T_world_cam,
                        intr: Intrinsics, stride: int = 2,
                        backend: str = "auto") -> None:
        """allocate + integrate one registered frame, then (periodically)
        run the streaming policy against the frame's camera position."""
        self.vol = tsdf_volume.integrate_frame(
            self.vol, depth, color, rays, T_world_cam, intr, self.cfg,
            stride=stride, backend=backend)
        self.maybe_tick(lambda: np.asarray(T_world_cam, np.float64)[:3, 3])

    def maybe_tick(self, cam_pos) -> bool:
        """Count one frame; run :meth:`tick` when the interval elapses.
        ``cam_pos`` may be a callable (evaluated only when the tick actually
        runs — lets zero-sync pipelines defer their pose pull). The single
        source of the interval counter: external integrators (e.g.
        MonoOdometryTSDF) call this instead of keeping their own."""
        self._since_check += 1
        if self._since_check < self.check_interval:
            return False
        self.tick(cam_pos() if callable(cam_pos) else cam_pos)
        return True

    # -- policy -------------------------------------------------------------

    def tick(self, cam_pos: np.ndarray) -> None:
        """Run reload-then-evict against the camera position. One host sync
        (n_blocks + coords pull) per call — keep ``check_interval`` above 1
        on a remote-tunnel device."""
        self._since_check = 0
        cam = np.asarray(cam_pos, np.float64).reshape(3)
        reloaded = self._maybe_reload(cam)
        n, coords, cks = self._pull_state()
        n, coords, cks, r2 = self._supply_changed_live(n, coords, cks)
        n, coords, cks, r3 = self._refresh_frozen(n, coords, cks)
        live_keys = pack_np(coords[:n])
        if n > self.high_water:
            live_keys = self._evict(cam, n, coords, cks)
        if reloaded or r2 or r3:
            self._unfreeze_sweep(live_keys)
        # snapshot for the next tick's change detection. Victims evicted
        # above are filtered out; keys reloaded after the last pull are
        # simply absent and read as "changed" next tick (conservative).
        lk = set(live_keys.tolist())
        self._live_cks = {k: v for k, v in
                          zip(pack_np(coords[:n]).tolist(), cks[:n].tolist())
                          if k in lk}

    def _supply_changed_live(self, n, coords, cks):
        """The supplier rule: any live block whose data changed since the
        last tick (including blocks that are NEW — e.g. allocated in a
        reload-race window right next to an evicted region) must have its
        stored +corner suppliers reloaded, or its boundary cells facing
        them can neither emit live nor be covered by any frozen cache."""
        if not self.store:
            return n, coords, cks, False
        live_keys = pack_np(coords[:n])
        prev = self._live_cks
        chg = np.asarray([prev.get(int(k)) != int(c)
                          for k, c in zip(live_keys, cks[:n])], bool)
        if not chg.any():
            return n, coords, cks, False
        kk = pack_np(coords[:n][chg][:, None, :]
                     + _CORNERS[None, 1:]).reshape(-1)
        skeys = np.fromiter(self.store.keys(), np.int32, len(self.store))
        need = np.unique(kk[np.isin(kk, skeys)])
        if not len(need):
            return n, coords, cks, False
        self.n_stale_refreshes += 1
        self._reload_keys(need.astype(np.int32))
        n, coords, cks = self._pull_state()
        return n, coords, cks, True

    def _pull_state(self) -> Tuple[int, np.ndarray, np.ndarray]:
        nb, bc, cks = jax.device_get(_state_pull(self.vol))
        return int(nb), np.asarray(bc), np.asarray(cks)

    def _refresh_frozen(self, n, coords, cks):
        """Invalidate frozen soups whose recorded neighborhood environment
        no longer matches reality: the block's own data changed (policy-race
        integration), a live supplier's data changed, or a NEW neighbor
        appeared where none existed at freeze time. Invalidated blocks (and
        their stored suppliers) are reloaded and unfrozen — live extraction
        then re-emits them from current data. Loops to a fixpoint (an
        unfreeze/reload changes no voxel data, so each pass only shrinks the
        frozen set). Returns a refreshed (n, coords, cks, did_anything)."""
        did = False
        for _ in range(len(self.soups) + 1):
            if not self.soups:
                break
            cks_map = dict(zip(pack_np(coords[:n]).tolist(),
                               cks[:n].tolist()))
            fkeys = np.fromiter(self.soups.keys(), np.int32, len(self.soups))
            kk = pack_np(unpack_np(fkeys)[:, None, :] + _CORNERS[None])
            stale, need = [], set()
            for i, k in enumerate(fkeys):
                env = self._soup_env.get(int(k))
                if env is None:  # defensive: no record -> must refresh
                    stale.append(int(k))
                    need.update(int(c) for c in kk[i]
                                if int(c) in self.store)
                    continue
                exist, c8 = env
                bad = False
                for j in range(8):
                    ckey = int(kk[i, j])
                    if ckey in cks_map:
                        ok = bool(exist[j]) and cks_map[ckey] == int(c8[j])
                    elif ckey in self._stored_cks:
                        ok = (bool(exist[j])
                              and self._stored_cks[ckey] == int(c8[j]))
                    else:
                        ok = not bool(exist[j])
                    if not ok:
                        bad = True
                        break
                if bad:
                    stale.append(int(k))
                    need.update(int(c) for c in kk[i]
                                if int(c) in self.store)
            if not stale:
                break
            did = True
            self.n_stale_refreshes += 1
            if need:
                self._reload_keys(np.asarray(sorted(need), np.int32))
                n, coords, cks = self._pull_state()
            # unfreeze only where the suppliers actually came back: a
            # pool-full reload DEFERS, and a stale soup kept frozen beats a
            # hole in the mesh (retried next tick once eviction frees room)
            deferred = 0
            stale_set = set(stale)
            stale_rows = {int(k): kk[i] for i, k in enumerate(fkeys)
                          if int(k) in stale_set}
            for k in stale:
                if any(int(c) in self.store for c in stale_rows[k]):
                    deferred += 1
                    continue
                self.soups.pop(k, None)
                self._soup_env.pop(k, None)
            if deferred:
                log_warning(f"streaming: {deferred} invalidated frozen "
                            "caches kept (pool full; reload deferred)")
                break
        return n, coords, cks, did

    def _block_dist(self, coords: np.ndarray, cam: np.ndarray) -> np.ndarray:
        centers = (coords.astype(np.float64) + 0.5) * self.cfg.block_size
        return np.linalg.norm(centers - cam[None], axis=1)

    def _maybe_reload(self, cam: np.ndarray) -> bool:
        if not self.store:
            return False
        skeys = np.fromiter(self.store.keys(), np.int32, len(self.store))
        near = self._block_dist(unpack_np(skeys), cam) < self.reload_dist
        want = skeys[near]
        if not len(want):
            return False
        self._reload_keys(want)
        return True

    def _reload_keys(self, want: np.ndarray) -> None:
        K = _bucket(len(want), 0)
        keys = np.full(K, vhash.EMPTY_KEY, np.int32)
        keys[: len(want)] = want
        s = self.cfg.block_resolution ** 3 // 128
        tK = np.zeros((K, s, 128), np.float32)
        wK = np.zeros((K, s, 128), np.float32)
        cK = np.zeros((K, 3, s, 128), np.float32)
        crd = np.zeros((K, 3), np.int32)
        payloads = []
        for i, k in enumerate(want):
            payloads.append(self.store.pop(int(k)))
            tK[i], wK[i], cK[i], crd[i] = payloads[-1]
        self.vol, vals = _scatter_reload(self.vol, keys, crd, tK, wK, cK,
                                         cfg=self.cfg)
        # a full pool DEFERS the reload instead of losing the payload: the
        # dropped entries go back to the store (one vals pull — reload
        # cadence, not per frame) and retry after the next eviction
        dropped = set(np.flatnonzero(np.asarray(vals)[: len(want)] < 0)
                      .tolist())
        if dropped:
            log_warning(f"streaming: pool full, deferred reload of "
                        f"{len(dropped)} blocks")
        for i, k in enumerate(want):
            if i in dropped:
                self.store[int(k)] = payloads[i]
            else:
                self._stored_cks.pop(int(k), None)
        self.n_reloads += 1

    def _evict(self, cam: np.ndarray, n: int, coords: np.ndarray,
               cks: np.ndarray) -> np.ndarray:
        """Freeze-extract, store and compact away far blocks. Returns the
        surviving live keys."""
        live = coords[:n]
        live_keys = pack_np(live)
        far = self._block_dist(live, cam) > self.evict_dist
        victims = np.flatnonzero(far)
        if not len(victims):
            log_warning("streaming: pool over high water but nothing beyond "
                        "evict_dist — working set exceeds the pool")
            return live_keys
        vkeys = live_keys[victims]
        vset = set(vkeys.tolist())
        frozen = self.soups.keys()
        # newly frozen = victims not yet frozen + live minus-shell neighbors
        # of victims (their boundary cells read INTO the victims: C is shell
        # iff C + corner is a victim, i.e. a victim is one of C's positive
        # corner SUPPLIERS — note the +, the mirror of incremental.py's
        # "- _CORNERS" dilation which goes from changed block to readers)
        shell_keys = pack_np(live[:, None, :] + _CORNERS[None, 1:]
                             ).reshape(n, 7)
        shell_hit = np.isin(shell_keys, vkeys).any(axis=1)
        emit = [s for s in victims if int(live_keys[s]) not in frozen]
        emit += [int(s) for s in np.flatnonzero(shell_hit)
                 if int(live_keys[s]) not in frozen
                 and int(live_keys[s]) not in vset]
        if emit:
            self._freeze_extract(np.asarray(sorted(set(emit)), np.int64),
                                 live, live_keys, cks)
        # pull victim payloads (bucketed) and store
        K = _bucket(len(victims), 0)
        slots = np.zeros(K, np.int32)
        slots[: len(victims)] = victims
        tK, wK, cK, crd = (np.asarray(a) for a in
                           _gather_rows(self.vol, slots))
        for i, v in enumerate(victims):
            self.store[int(vkeys[i])] = (tK[i], wK[i], cK[i], crd[i])
            self._stored_cks[int(vkeys[i])] = int(cks[v])
        # compact survivors into a dense prefix
        survivors = np.flatnonzero(~far)
        perm = np.zeros(self.cfg.block_capacity, np.int32)
        perm[: len(survivors)] = survivors
        self.vol = _compact(self.vol, perm, np.int32(len(survivors)))
        self.n_evictions += 1
        return live_keys[survivors]

    def _freeze_extract(self, emit_slots: np.ndarray, live: np.ndarray,
                        live_keys: np.ndarray, cks: np.ndarray) -> None:
        """Cache the triangle soup of the given live blocks (all corner
        suppliers must still be resident — guaranteed by the freeze
        invariant: a block with an off-device positive neighbor is already
        frozen and never re-enters here)."""
        n = len(live)
        order = np.argsort(live_keys)
        skeys = live_keys[order]

        def find(want):
            pos = np.minimum(np.searchsorted(skeys, want), n - 1)
            hit = skeys[pos] == want
            return np.where(hit, order[pos], -1)

        nsl = find(pack_np(live[emit_slots][:, None, :] + _CORNERS[None]
                           ).reshape(-1)).reshape(-1, 8)
        # record each frozen block's neighborhood environment: at freeze
        # time every EXISTING +corner neighbor is live (the freeze
        # invariant), so existence == found-in-live and its checksum is at
        # hand. The soup stays valid exactly while this record matches.
        for row, s_ in zip(nsl, emit_slots):
            exist = row >= 0
            c8 = np.where(exist, cks[np.maximum(row, 0)], 0).astype(np.int64)
            self._soup_env[int(live_keys[s_])] = (exist.copy(), c8)
        sel_slots = np.unique(nsl[nsl >= 0])
        ns = len(sel_slots)
        Es = _bucket(ns, self.cfg.block_capacity)
        sel, nbr_pad, emit_c = mc.build_compact_selection(
            find, n, sel_slots, emit_slots, live, Es)

        cells_bucket = _bucket(ns * (self.cfg.block_resolution ** 3) // 64,
                               self.max_cells, lo=1024) * 64
        v, c, nt, ovf, cells = self._run_extract(
            min(cells_bucket, self.max_cells), self.max_tris,
            sel=jnp.asarray(sel), nbr_sel=jnp.asarray(nbr_pad),
            emit_mask=jnp.asarray(emit_c), return_cells=True)
        # slice the pull to a bucketed triangle count: the full budget
        # arrays are ~10+ MB through a 2-45 MB/s tunnel while a typical
        # eviction emits a few-MB band (colors stay f32 — the frozen cache
        # must remain bit-identical to live extraction, unlike the
        # incremental preview's u8 wire format)
        nt = int(nt)
        ntb = _bucket(max(nt, 1), self.max_tris, lo=4096)
        verts = np.asarray(v[:, :, :ntb]).transpose(2, 0, 1)[:nt]
        cols = np.asarray(c[:, :, :ntb]).transpose(2, 0, 1)[:nt]
        blk = (np.asarray(cells[:, :ntb]).T[:nt]
               // self.cfg.block_resolution)
        tkeys = pack_np(blk)
        empty_v = np.zeros((0, 3, 3), np.float32)
        for s in emit_slots:  # zero-triangle blocks still freeze
            self.soups[int(live_keys[s])] = (empty_v, empty_v)
        if nt:
            o = np.argsort(tkeys, kind="stable")
            tk, start = np.unique(tkeys[o], return_index=True)
            end = np.append(start[1:], nt)
            for k, a, b in zip(tk, start, end):
                self.soups[int(k)] = (verts[o[a:b]], cols[o[a:b]])

    def _run_extract(self, max_cells: int, max_tris: int, **kw):
        """extract_mesh_arrays with persistent grow-on-overflow budgets
        (host bool sync — eviction/save cadence, not per frame)."""
        while True:
            out = mc.extract_mesh_arrays(self.vol, self.cfg,
                                         max_cells=max_cells,
                                         max_tris=max_tris, **kw)
            if not bool(out[3]):
                break
            max_cells *= 2
            max_tris *= 2
            self.max_cells = max(self.max_cells, max_cells)
            self.max_tris = max(self.max_tris, max_tris)
        return out

    def _unfreeze_sweep(self, live_keys: np.ndarray) -> None:
        """Drop cached soups whose block is live again with every EXISTING
        positive-corner neighbor live too — live extraction re-emits them
        bit-exactly from the (unchanged) reloaded data."""
        if not self.soups:
            return
        fkeys = np.fromiter(self.soups.keys(), np.int32, len(self.soups))
        live_set = set(live_keys.tolist())
        stored = self.store.keys()
        nbrs = pack_np(unpack_np(fkeys)[:, None, :] + _CORNERS[None, 1:])
        for i, k in enumerate(fkeys):
            k = int(k)
            if k not in live_set:
                continue
            if any(int(nk) in stored for nk in nbrs[i]):
                continue
            del self.soups[k]
            self._soup_env.pop(k, None)

    # -- extraction ---------------------------------------------------------

    def extract_mesh(self, max_cells: int = None,
                     max_tris: int = None) -> TriangleMeshHost:
        """Full-scene triangle soup: live extraction of un-frozen blocks +
        the frozen caches. Bit-identical to extracting an infinite pool that
        saw the same frames (policy contract above). Runs the supplier rule
        and the stale-refresh pass first so frames integrated since the last
        tick (including any policy-race integration into frozen blocks or
        new blocks allocated beside stored ones) are always reflected.
        ``max_cells``/``max_tris`` raise the live-extraction budgets for
        this and later calls (they only ever grow — one compile per rung)."""
        if max_cells:
            self.max_cells = max(self.max_cells, max_cells)
        if max_tris:
            self.max_tris = max(self.max_tris, max_tris)
        n, coords, cks = self._pull_state()
        n, coords, cks, r2 = self._supply_changed_live(n, coords, cks)
        n, coords, cks, r3 = self._refresh_frozen(n, coords, cks)
        if r2 or r3:
            self._unfreeze_sweep(pack_np(coords[:n]))
        parts_v = [v for v, _ in self.soups.values()]
        parts_c = [c for _, c in self.soups.values()]
        if n:
            live_keys = pack_np(coords[:n])
            emit = np.zeros((self.cfg.block_capacity,), bool)
            if self.soups:
                fkeys = np.fromiter(self.soups.keys(), np.int32,
                                    len(self.soups))
                emit[:n] = ~np.isin(live_keys, fkeys)
            else:
                emit[:n] = True
            E = mc.snap_extract_blocks(n, self.cfg.block_capacity)
            v, c, nt, ovf = self._run_extract(
                self.max_cells, self.max_tris, extract_blocks=E,
                emit_mask=jnp.asarray(emit))
            nt = int(nt)  # trim the pull (see _freeze_extract)
            ntb = _bucket(max(nt, 1), self.max_tris, lo=4096)
            parts_v.append(np.asarray(v[:, :, :ntb]).transpose(2, 0, 1)[:nt])
            parts_c.append(np.asarray(c[:, :, :ntb]).transpose(2, 0, 1)[:nt])
        if parts_v:
            verts = np.concatenate(parts_v).reshape(-1, 3)
            cols = np.concatenate(parts_c).reshape(-1, 3)
        else:
            verts = np.zeros((0, 3), np.float32)
            cols = np.zeros((0, 3), np.float32)
        tris = np.arange(len(verts), dtype=np.int32).reshape(-1, 3)
        return TriangleMeshHost(vertices=verts, triangles=tris,
                                vertex_colors=cols)

    def extract_point_cloud(self, max_points: Optional[int] = None):
        """Full-scene surface point samples: the live volume's crossings
        plus the SAME numpy crossing math over the host-stored (evicted)
        blocks — block data is identical either side of the frontier, so
        the union equals an infinite-pool extraction of this API (which is
        interior-crossings-only by contract either way)."""
        pts, cols = tsdf_volume.extract_point_cloud(self.vol, self.cfg)
        if self.store:
            R = self.cfg.block_resolution
            K = len(self.store)
            t4 = np.empty((K, R, R, R), np.float32)
            w4 = np.empty((K, R, R, R), np.float32)
            c5 = np.empty((K, R, R, R, 3), np.float32)
            crd = np.empty((K, 3), np.int32)
            for i, (tK, wK, cK, co) in enumerate(self.store.values()):
                t4[i] = tK.reshape(R, R, R)
                w4[i] = wK.reshape(R, R, R)
                c5[i] = cK.reshape(3, R * R * R).T.reshape(R, R, R, 3)
                crd[i] = co
            sp, sc = tsdf_volume.host_interior_crossings(
                t4, w4, c5, crd, self.cfg)
            pts = np.concatenate([pts, sp])
            cols = np.concatenate([cols, sc])
        if max_points is not None and pts.shape[0] > max_points:
            sel = np.random.RandomState(0).choice(pts.shape[0], max_points,
                                                  replace=False)
            pts, cols = pts[sel], cols[sel]
        return pts, cols

    # -- stats ---------------------------------------------------------------

    @property
    def n_stored(self) -> int:
        return len(self.store)

    @property
    def n_frozen(self) -> int:
        return len(self.soups)
