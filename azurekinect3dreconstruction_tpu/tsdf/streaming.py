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
  ``evict_dist`` from the camera are gathered (one bucketed row gather)
  and DMA'd into the device's HOST memory space (``pinned_host`` memory
  kind — the TPU host's RAM, reached over its local PCIe), then the pool
  is COMPACTED device-side: survivors re-packed into a dense prefix with
  one full-pool row gather + a fresh hash table via ``hash.build_table``
  (explicit key->slot mapping). The dense-prefix invariant every consumer
  relies on (integrate masks, extraction prefix scans) is preserved by
  construction. Nothing crosses to the *client* python process at tick
  time: on a remote-tunnel device the eviction path moves ZERO tunnel
  bytes (measured: the tunnel pull it replaces was 167 MB / 6.7 s on the
  240-frame bench corridor — the entire streaming-vs-plain gap).
- **reload**: stored blocks within ``reload_dist`` of the camera are
  re-inserted (``hash.insert``): their batch is DMA'd back device-side
  and the wanted rows scatter in one jitted call. A fresh slot restores
  the stored data BIT-EXACTLY (pinned_host round-trips are pure DMA
  copies); a block that was concurrently re-allocated live (policy
  violation, see below) degrades gracefully to a weighted merge instead
  of losing either side.
- **frozen geometry**: marching-cubes cells of block B read corner values
  from B's positive-corner neighbors, so evicting V silently changes what
  B = V - corner would emit. The manager therefore keeps a per-block FROZEN
  set with the local invariant *frozen(B) <=> B is off-device OR some
  existing positive-corner neighbor of B is off-device*. Any block ENTERING
  the frozen set is extracted right then (compact form of
  ``marching_cubes.extract_mesh_arrays`` — the same sel/nbr_sel machinery
  the incremental extractor uses) while all its corner suppliers are still
  resident, and its triangle soup is cached — in device-host memory, like
  the payload store: only the per-triangle CELL ids (12 bytes/triangle,
  needed to split the soup per block) cross to the client at freeze time;
  the 72-byte/triangle vertex+color data crosses once, at save time, when
  it is the output anyway. ``extract_mesh`` then emits live geometry only
  for un-frozen blocks (``emit_mask``) and appends the cached soups: the
  result is BIT-IDENTICAL to a full extraction of an infinite pool,
  because every cell is evaluated exactly once against the same voxel
  values either live or at freeze time.

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
eviction runs at tick cadence AND the high-water trigger reads a state
snapshot up to one interval old (the tick's inputs are prefetched right
after the previous tick so their host copy hides under a full interval of
compute) AND a slow transfer may defer the tick up to one more interval
(:meth:`maybe_tick` never blocks on the in-flight state), size the
headroom accordingly: ``(1 - high_water) * block_capacity`` must exceed
the blocks a burst of THREE ``check_interval`` windows can allocate (tens
per frame in steady scanning; ``allocate``'s dedup_budget caps the
absolute worst case).
"""

from __future__ import annotations

import time
from concurrent.futures import ThreadPoolExecutor
from concurrent.futures import TimeoutError as FuturesTimeout
from functools import partial
from typing import Dict, NamedTuple, Optional, Tuple

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


class _SoupRef(NamedTuple):
    """A frozen block's triangle range [a, b) within soup batch ``sid``."""
    sid: int
    a: int
    b: int


# ---------------------------------------------------------------------------
# device ops (shapes bucketed by the host caller)
# ---------------------------------------------------------------------------


@jax.jit
def _gather_rows(vol: TSDFVolume, slots):
    """Compact payload of the given pool slots (the eviction gather; block
    coords are NOT gathered — the caller already holds them host-side from
    the tick's state pull)."""
    s = jnp.asarray(slots, jnp.int32)
    return vol.tsdf[s], vol.weight[s], vol.color[s]


@jax.jit
def _sort_soup(v, c, perm):
    """Reorder freshly-extracted triangles into per-block-contiguous order
    (``perm`` is the host argsort of the triangles' block keys) and lay
    them out (n, 3, 3) — the storage layout of the frozen-soup cache. Runs
    device-side so the big vertex/color payload never crosses to the
    client at freeze time (it is DMA'd to device-host memory instead)."""
    p = jnp.asarray(perm, jnp.int32)
    return v.transpose(2, 0, 1)[p], c.transpose(2, 0, 1)[p]


def _mem_sharding(arr, kind: str):
    """Single-device sharding pinning ``kind`` ('device' / 'pinned_host')
    on the device that owns ``arr`` — the addressing scheme for the
    device-host block store."""
    from jax.sharding import SingleDeviceSharding

    return SingleDeviceSharding(next(iter(arr.devices())), memory_kind=kind)


def _put_mem(kind: str, *arrays):
    """DMA arrays to the given memory space of their own device. On a TPU
    this is a device<->host-RAM copy over the accelerator's local PCIe —
    it never touches the client python process (zero tunnel bytes on a
    remote device) and round-trips BIT-EXACTLY (pure copies). Asynchronous:
    returns immediately with in-flight arrays."""
    out = tuple(jax.device_put(a, _mem_sharding(a, kind)) for a in arrays)
    return out if len(out) > 1 else out[0]


@jax.jit
def _state_pull(vol: TSDFVolume, T):
    """The tick's whole input — n_blocks, camera pose, per-block change
    checksum, block_coords — as ONE flat i32 array, so the host lands it
    in ONE transfer. The r4 form returned three arrays and the tick's
    ``np.asarray`` of each paid its own tunnel round trip (~25 ms fixed,
    measured 52 ms/tick in the r5 stage breakdown for ~16 KB of payload
    — pure RTT, not bytes). Layout: [n_blocks, pose f32 bits (16), cks
    (cap), coords (cap*3)]; decode with :func:`_decode_state`.

    The checksum wrap-sums the raw tsdf+weight BITS (any bit change =
    change, reduction-order-independent — the same trick as
    incremental._checksums and for the same reason); it detects frozen
    blocks that were integrated into DESPITE the policy (reload-race
    windows), whose cached soups would otherwise go silently stale."""
    bits = lambda a: jax.lax.bitcast_convert_type(a, jnp.int32)
    cks = jnp.sum(bits(vol.tsdf) + bits(vol.weight), axis=(1, 2))
    return jnp.concatenate([
        vol.n_blocks.reshape(1),
        bits(jnp.asarray(T, jnp.float32)).reshape(16),
        cks,
        vol.block_coords.reshape(-1),
    ])


def _decode_state(buf: np.ndarray, cap: int):
    """Host decode of :func:`_state_pull`'s packed layout -> (n, pose,
    cks, coords)."""
    nb = int(buf[0])
    pose = buf[1:17].view(np.float32).reshape(4, 4)
    cks = buf[17:17 + cap]
    coords = buf[17 + cap:].reshape(cap, 3)
    return nb, pose, cks, coords


@partial(jax.jit, static_argnames=("ntb",))
def _freeze_meta(cells, n_tris, overflow, R, ntb: int):
    """Everything the freeze path needs HOST-side about an extraction, as
    one flat i32 array: [n_tris, overflow, per-triangle BLOCK key x ntb].
    The r4 path paid three separate syncs per eviction (the grow-loop's
    overflow bool, int(n_tris), then a (3, ntb) cell-coordinate pull ≈
    12 B/triangle) — measured 255 ms per eviction, mostly round trips.
    The soup split only ever consumed cells // R packed to keys, so the
    key math moves device-side and the pull is 4 B/triangle in the same
    transfer as the scalars."""
    blk = jnp.floor_divide(cells[:, :ntb].T.astype(jnp.int32), R)
    keys = vhash.pack_key(blk)
    meta = jnp.stack([n_tris.astype(jnp.int32), overflow.astype(jnp.int32)])
    return jnp.concatenate([meta, keys])


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
def _scatter_reload(vol: TSDFVolume, keys, coords, bt, bw, bc, rows,
                    cfg: TSDFConfig):
    """Insert stored blocks back into the pool. ``bt/bw/bc`` is one stored
    eviction batch (already DMA'd back to device memory); ``rows`` selects
    the wanted rows, gathered HERE so the pick fuses with the scatter.
    Fresh slots (the policy-compliant case) restore the stored payload
    bit-exactly; a key that is unexpectedly live again merges by
    integration weight instead of clobbering either side. Padding lanes
    use keys == EMPTY_KEY.

    Returns ``(vol, vals)`` — per-key assigned slots, MISS where the pool
    was full. The caller keeps dropped entries in the store and retries
    after the next eviction, so a full-pool reload DEFERS instead of
    losing data (and does not set the sticky overflow flag: it is
    recoverable, unlike a working set that genuinely exceeds the pool)."""
    r = jnp.asarray(rows, jnp.int32)
    tK, wK, cK = bt[r], bw[r], bc[r]
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
                 vol: Optional[TSDFVolume] = None, max_defer: int = 0):
        """``vol``: adopt an existing pool instead of allocating one — the
        pipeline wiring passes its own volume so only ONE pool ever exists
        (a second create would transiently double HBM).

        ``max_defer``: extra frames a tick may wait for its in-flight state
        transfer instead of blocking on it (0 = always block at the
        interval, the exact-cadence default). Deferral stretches the
        camera-movement-per-tick bound by up to ``max_defer/check_interval``
        intervals, so distances must be sized for it —
        :meth:`for_pipeline` does (it widens the reload ring to ``2 *
        margin``); direct constructions that enable it must do the same or
        late reloads degrade to the weighted merge (float-order deltas vs
        the infinite-pool reference)."""
        assert evict_dist > reload_dist > 0, (evict_dist, reload_dist)
        self.cfg = cfg
        self.vol = tsdf_volume.create(cfg) if vol is None else vol
        self.evict_dist = float(evict_dist)
        self.reload_dist = float(reload_dist)
        self.high_water = int(high_water * cfg.block_capacity)
        self.check_interval = int(check_interval)
        self.max_defer = int(max_defer)
        self.max_cells = max_cells
        self.max_tris = max_tris
        # The stores live in the DEVICE'S host memory (pinned_host memory
        # kind), batched per eviction — tick-time traffic is device-local
        # PCIe DMA, never client-bound (module docstring):
        # bid -> [tsdf (K,s,128), weight (K,s,128), color (K,3,s,128)
        #         (all pinned_host jax arrays), coords np (K,3), live_count]
        self._pbatch: Dict[int, list] = {}
        # key -> (bid, row) into _pbatch
        self.store: Dict[int, Tuple[int, int]] = {}
        # sid -> [verts (m,3,3), cols (m,3,3) (pinned_host), ref_count]
        self._sbatch: Dict[int, list] = {}
        # key -> _SoupRef into _sbatch, or an inline (verts, cols) numpy
        # tuple for zero-triangle freezes; presence == frozen
        self.soups: Dict[int, object] = {}
        self._next_bid = 0
        self._next_sid = 0
        # (state arrays, pose) dispatched one frame ahead of the next tick
        self._prefetch = None
        # One worker that LANDS the prefetched state (np.asarray) off the
        # pipeline thread: through the axon tunnel ``copy_to_host_async``
        # does not actually move bytes until a host copy is requested, so
        # an on-thread land pays a full tunnel RTT every tick (measured
        # ~52 ms/tick in BENCH state_land — the whole streaming-vs-plain
        # gap). The worker pays that RTT concurrently with the interval's
        # device compute; the tick then reads a finished numpy array.
        self._lander = ThreadPoolExecutor(max_workers=1,
                                          thread_name_prefix="azk3d-land")
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
        self._freeze_nt = 0  # last freeze's triangle count (pull-slice seed)
        self.n_evictions = 0
        self.n_reloads = 0
        self.n_stale_refreshes = 0
        # cumulative per-stage wall ms across all ticks (observability —
        # VERDICT r4 weak #2 asked where the tick budget goes; bench and
        # tools/profile_streaming read this after a run)
        self.tick_ms: Dict[str, float] = {}
        self.n_ticks = 0

    def _acc(self, key: str, t0: float) -> float:
        """Accumulate wall time since ``t0`` into ``tick_ms[key]``; returns
        a fresh timestamp (stage chaining)."""
        t1 = time.perf_counter()
        self.tick_ms[key] = self.tick_ms.get(key, 0.0) + (t1 - t0) * 1e3
        return t1

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
        ring sits ``2 * margin`` meters beyond :meth:`integration_reach`
        (the camera must not cover more than ``margin`` per check
        interval; the factor 2 covers the one extra interval a tick may
        DEFER waiting for its state transfer — ``max_defer`` below),
        eviction one more meter out (hysteresis)."""
        reload_dist = cls.integration_reach(cfg) + 2.0 * margin
        kw.setdefault("max_defer", check_interval)
        return cls(cfg.tsdf, evict_dist=reload_dist + 1.0,
                   reload_dist=reload_dist, high_water=high_water,
                   check_interval=check_interval, **kw)

    def reset_state(self) -> None:
        """Forget everything (the pipeline-level 'C' volume reset): fresh
        pool, empty store and caches."""
        self.vol = tsdf_volume.create(self.cfg)
        self.store.clear()
        self._pbatch.clear()
        self.soups.clear()
        self._sbatch.clear()
        self._soup_env.clear()
        self._stored_cks.clear()
        self._live_cks.clear()
        self._since_check = 0
        self._prefetch = None

    # -- per-frame ----------------------------------------------------------

    def integrate_frame(self, depth, color, rays, T_world_cam,
                        intr: Intrinsics, stride: int = 2,
                        backend: str = "auto") -> None:
        """allocate + integrate one registered frame, then (periodically)
        run the streaming policy against the frame's camera position."""
        self.vol = tsdf_volume.integrate_frame(
            self.vol, depth, color, rays, T_world_cam, intr, self.cfg,
            stride=stride, backend=backend)
        self.maybe_tick(lambda: T_world_cam)  # (4,4) host or device — ok

    def maybe_tick(self, cam_pos) -> bool:
        """Count one frame; run :meth:`tick` when the interval elapses.
        ``cam_pos`` may be a callable (evaluated lazily — lets zero-sync
        pipelines defer their pose pull); it may return a host (3,)
        position, a host (4,4) pose, or a DEVICE array of either shape.
        The single source of the interval counter: external integrators
        (e.g. MonoOdometryTSDF) call this instead of keeping their own.

        One frame AFTER the previous tick — i.e. a full interval before the
        next — the tick's inputs (pool state + camera pose) are dispatched
        and their host copies started asynchronously
        (``copy_to_host_async``): the transfer rides under an entire
        interval of device compute, so the tick itself is SYNC-FREE on its
        common path (nothing to reload/evict/refresh). Round 4 dispatched
        only ONE frame ahead, which covers a ~25 ms tunnel RTT with ~4-12 ms
        of frame time — every tick stalled the difference in ``state_land``
        (the per-stage tick_ms breakdown is what exposed it). The
        (interval-1)-frame-stale state is safe for the same reason 1-frame
        stale was: change detection runs against SNAPSHOTS (missed changes
        surface next tick, nothing is lost), the eviction path re-pulls
        fresh before acting (its compaction permutation must match the live
        pool), and :meth:`extract_mesh` does its own fresh pull + refresh,
        so bit-exactness never rests on tick freshness.

        The tick never BLOCKS on that transfer either: through the remote
        tunnel a pull occupies ~a full RTT of wall time no matter when it
        was dispatched (measured: the round-4 "land at tick time" design
        still paid ~50 ms/tick), so if the state has not landed when the
        interval elapses the tick DEFERS — integration continues, and the
        tick runs on whichever later frame the worker finishes
        (``tick_ms["deferred_frames"]`` counts them). A safety valve blocks
        after one extra interval so the policy cannot lag unboundedly.
        Sizing note: the high-water trigger reads a state up to one
        interval old and may defer up to one more, so the pool headroom
        ``(1 - high_water) * capacity`` should cover THREE intervals'
        worth of allocation (module docstring)."""
        self._since_check += 1
        if self._since_check == 1 and self.check_interval > 1:
            t0 = time.perf_counter()
            pose = cam_pos() if callable(cam_pos) else cam_pos
            if isinstance(pose, jax.Array):
                # device pose rides INSIDE the packed state: one transfer
                st = _state_pull(self.vol, pose)
                host_pose = None
            else:
                st = _state_pull(self.vol, jnp.zeros((4, 4), jnp.float32))
                host_pose = pose
            st.copy_to_host_async()
            # land (np.asarray) on the worker thread; the tick polls done()
            self._prefetch = (self._lander.submit(np.asarray, st), host_pose)
            self._acc("prefetch_dispatch", t0)
            return False
        if self._since_check < self.check_interval:
            return False
        pf = self._prefetch
        if pf is not None:
            st_f, host_pose = pf
            t0 = time.perf_counter()
            if self._since_check < self.check_interval + self.max_defer:
                # 2 ms grace: a landed (or local-backend) pull proceeds now;
                # a genuinely in-flight tunnel pull defers instead
                try:
                    buf = st_f.result(timeout=0.002)
                except FuturesTimeout:
                    self.tick_ms["deferred_frames"] = (
                        self.tick_ms.get("deferred_frames", 0.0) + 1.0)
                    return False  # state in flight: retry next frame
            else:
                buf = st_f.result()  # defer budget spent: block
            self._prefetch = None
            nb, dev_pose, cks, bc = _decode_state(
                buf, self.cfg.block_capacity)
            self._acc("state_land", t0)
            self.tick(dev_pose if host_pose is None else host_pose,
                      _state=(nb, bc, cks))
        else:
            pose = cam_pos() if callable(cam_pos) else cam_pos
            self.tick(pose)
        return True

    # -- policy -------------------------------------------------------------

    def tick(self, cam_pos, _state=None) -> None:
        """Run reload-then-evict against the camera position. Direct calls
        sync once (n_blocks + coords pull); :meth:`maybe_tick` passes the
        prefetched ``_state`` instead, making the common path sync-free.
        A stale state only ever DEFERS work one tick (change detection is
        vs snapshots, so nothing is missed permanently); anything that
        mutates the pool against the state re-pulls fresh first."""
        self._since_check = 0
        self._prefetch = None  # a direct tick orphans any pending prefetch
        self.n_ticks += 1
        t0 = time.perf_counter()
        cam = np.asarray(cam_pos, np.float64)
        cam = (cam[:3, 3] if cam.shape == (4, 4) else cam.reshape(3))
        reloaded = self._maybe_reload(cam)
        t0 = self._acc("reload", t0)
        # a reload just changed the pool: the prefetched state no longer
        # matches it (reload cadence — revisits only — so the extra pull
        # amortizes to nothing)
        fresh = _state is None or reloaded
        n, coords, cks = self._pull_state() if fresh else _state
        t0 = self._acc("pull", t0)
        n, coords, cks, r2 = self._supply_changed_live(n, coords, cks)
        t0 = self._acc("supply", t0)
        n, coords, cks, r3 = self._refresh_frozen(n, coords, cks)
        t0 = self._acc("refresh_frozen", t0)
        fresh = fresh or r2 or r3  # both re-pull after acting
        live_keys = pack_np(coords[:n])
        if n > self.high_water:
            if not fresh:
                # eviction compacts the pool with an explicit permutation
                # and freeze-extracts against live voxel data — both must
                # see the CURRENT pool, not the prefetched snapshot. Re-run
                # the rules on a fresh pull (eviction cadence only).
                n, coords, cks = self._pull_state()
                n, coords, cks, r2b = self._supply_changed_live(n, coords,
                                                                cks)
                n, coords, cks, r3b = self._refresh_frozen(n, coords, cks)
                r2, r3 = r2 or r2b, r3 or r3b
                live_keys = pack_np(coords[:n])
            t0 = self._acc("evict_repull", t0)
            if n > self.high_water:
                live_keys = self._evict(cam, n, coords, cks)
                t0 = self._acc("evict", t0)
        if reloaded or r2 or r3:
            self._unfreeze_sweep(live_keys)
            t0 = self._acc("unfreeze", t0)
        # snapshot for the next tick's change detection. Victims evicted
        # above are filtered out; keys reloaded after the last pull are
        # simply absent and read as "changed" next tick (conservative).
        lk = set(live_keys.tolist())
        self._live_cks = {k: v for k, v in
                          zip(pack_np(coords[:n]).tolist(), cks[:n].tolist())
                          if k in lk}
        self._acc("snapshot", t0)

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
        buf = np.asarray(_state_pull(self.vol,
                                     jnp.zeros((4, 4), jnp.float32)))
        nb, _pose, cks, bc = _decode_state(buf, self.cfg.block_capacity)
        return nb, bc, cks

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
                self._drop_soup(k)
            if deferred:
                log_warning(f"streaming: {deferred} invalidated frozen "
                            "caches kept (pool full; reload deferred)")
                break
        return n, coords, cks, did

    def _drop_soup(self, key: int) -> None:
        """Remove a frozen soup (and its env record), releasing its batch
        when the last reference goes."""
        val = self.soups.pop(key, None)
        self._soup_env.pop(key, None)
        if isinstance(val, _SoupRef):
            sb = self._sbatch[val.sid]
            sb[2] -= 1
            if sb[2] == 0:
                del self._sbatch[val.sid]

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

    def _store_payload(self, key: int, t, w, c, crd) -> None:
        """Insert one block's payload into the store as a single-row batch
        (host arrays accepted — DMA'd to device-host memory). Production
        payloads arrive batched via :meth:`_evict`; this is the seam for
        tests and external injection."""
        bid = self._next_bid
        self._next_bid += 1
        th, wh, ch = _put_mem("pinned_host", jnp.asarray(t)[None],
                              jnp.asarray(w)[None], jnp.asarray(c)[None])
        self._pbatch[bid] = [th, wh, ch,
                             np.asarray(crd, np.int32).reshape(1, 3), 1]
        self.store[int(key)] = (bid, 0)

    def _stored_payload(self, key: int):
        """Pull one stored block's (tsdf, weight, color, coord) to numpy —
        test/inspection seam (crosses the tunnel; batch pulls for bulk use
        live in :meth:`extract_point_cloud`)."""
        bid, row = self.store[int(key)]
        b = self._pbatch[bid]
        return (np.asarray(b[0])[row], np.asarray(b[1])[row],
                np.asarray(b[2])[row], b[3][row])

    def _reload_keys(self, want: np.ndarray) -> None:
        # group wanted rows by their eviction batch: each group DMAs its
        # batch back to device memory (device-local, async) and scatters
        # its rows in one jitted call — no payload bytes touch the client
        groups: Dict[int, list] = {}
        for k in want.tolist():
            bid, row = self.store[int(k)]
            groups.setdefault(bid, []).append((int(k), row))
        n_deferred = 0
        for bid, items in groups.items():
            b = self._pbatch[bid]
            K = _bucket(len(items), 0)
            keys = np.full(K, vhash.EMPTY_KEY, np.int32)
            rows = np.zeros(K, np.int32)
            crd = np.zeros((K, 3), np.int32)
            for i, (k, r) in enumerate(items):
                keys[i], rows[i], crd[i] = k, r, b[3][r]
            bt, bw, bc = _put_mem("device", b[0], b[1], b[2])
            self.vol, vals = _scatter_reload(self.vol, keys, crd,
                                             bt, bw, bc, rows, cfg=self.cfg)
            # a full pool DEFERS the reload instead of losing the payload:
            # dropped entries simply stay in the store (one vals pull —
            # reload cadence, not per frame) and retry after the next
            # eviction
            dropped = set(np.flatnonzero(
                np.asarray(vals)[: len(items)] < 0).tolist())
            n_deferred += len(dropped)
            for i, (k, _r) in enumerate(items):
                if i in dropped:
                    continue
                del self.store[k]
                self._stored_cks.pop(k, None)
                b[4] -= 1
            if b[4] == 0:
                del self._pbatch[bid]
        if n_deferred:
            log_warning(f"streaming: pool full, deferred reload of "
                        f"{n_deferred} blocks")
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
        t0 = time.perf_counter()
        if emit:
            self._freeze_extract(np.asarray(sorted(set(emit)), np.int64),
                                 live, live_keys, cks)
        t0 = self._acc("evict_freeze", t0)
        # gather victim payloads (bucketed) and DMA them to device-host
        # memory as one batch — async, zero client-bound bytes
        K = _bucket(len(victims), 0)
        slots = np.zeros(K, np.int32)
        slots[: len(victims)] = victims
        tK, wK, cK = _put_mem("pinned_host",
                              *_gather_rows(self.vol, slots))
        bid = self._next_bid
        self._next_bid += 1
        self._pbatch[bid] = [tK, wK, cK, live[victims].copy(), len(victims)]
        for i, v in enumerate(victims):
            self.store[int(vkeys[i])] = (bid, i)
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
        # ONE host sync for the whole freeze: extraction meta (overflow +
        # count) and the per-triangle BLOCK keys land in a single packed
        # pull (_freeze_meta — 4 B/triangle; the key math runs device-side).
        # The vertex/color payload (72 bytes/triangle, f32: the frozen
        # cache must remain bit-identical to live extraction, unlike the
        # incremental preview's u8 wire format) is reordered per-block-
        # contiguous DEVICE-side and DMA'd to device-host memory; it
        # crosses once, at save time. Budget overflow grows persistently
        # and redoes, like _run_extract; an under-guessed key slice costs
        # one extra pull (rare — the guess is last freeze's count).
        mcells_ = min(cells_bucket, self.max_cells)
        mtris_ = self.max_tris
        kw = dict(sel=jnp.asarray(sel), nbr_sel=jnp.asarray(nbr_pad),
                  emit_mask=jnp.asarray(emit_c), return_cells=True)
        R = jnp.int32(self.cfg.block_resolution)
        while True:
            v, c, nt_d, ovf_d, cells = mc.extract_mesh_arrays(
                self.vol, self.cfg, max_cells=mcells_, max_tris=mtris_,
                **kw)
            ntb = _bucket(max(self._freeze_nt, 4096), mtris_)
            meta = np.asarray(_freeze_meta(cells, nt_d, ovf_d, R, ntb))
            nt = int(meta[0])
            if meta[1]:  # budget overflow: grow persistently and redo
                mcells_ *= 2
                mtris_ *= 2
                self.max_cells = max(self.max_cells, mcells_)
                self.max_tris = max(self.max_tris, mtris_)
                continue
            if nt > ntb:
                ntb = _bucket(nt, mtris_)
                meta = np.asarray(_freeze_meta(cells, nt_d, ovf_d, R, ntb))
            break
        self._freeze_nt = nt
        tkeys = meta[2:2 + nt]
        empty_v = np.zeros((0, 3, 3), np.float32)
        for s in emit_slots:  # zero-triangle blocks still freeze
            self.soups[int(live_keys[s])] = (empty_v, empty_v)
        if nt:
            o = np.argsort(tkeys, kind="stable")
            perm = np.zeros(ntb, np.int32)
            perm[:nt] = o
            vs, cs = _put_mem("pinned_host",
                              *_sort_soup(v, c, jnp.asarray(perm)))
            sid = self._next_sid
            self._next_sid += 1
            sb = [vs, cs, 0]
            self._sbatch[sid] = sb
            tk, start = np.unique(tkeys[o], return_index=True)
            end = np.append(start[1:], nt)
            for k, a, b in zip(tk, start, end):
                self.soups[int(k)] = _SoupRef(sid, int(a), int(b))
                sb[2] += 1

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
            self._drop_soup(k)

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
        # pull each frozen-soup batch ONCE (this is where the cached
        # geometry finally crosses to the client — save cadence; rows of
        # since-dropped soups ride along, bounded by the batch)
        pulled: Dict[int, Tuple[np.ndarray, np.ndarray]] = {}
        parts_v, parts_c = [], []
        for val in self.soups.values():
            if isinstance(val, _SoupRef):
                if val.sid not in pulled:
                    sb = self._sbatch[val.sid]
                    pulled[val.sid] = (np.asarray(sb[0]), np.asarray(sb[1]))
                pv, pc = pulled[val.sid]
                parts_v.append(pv[val.a:val.b])
                parts_c.append(pc[val.a:val.b])
            else:
                parts_v.append(val[0])
                parts_c.append(val[1])
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
            # pull each payload batch once (save cadence — the one place
            # stored voxel data crosses to the client)
            pulled: Dict[int, Tuple[np.ndarray, ...]] = {}
            for i, (key, (bid, row)) in enumerate(self.store.items()):
                if bid not in pulled:
                    b = self._pbatch[bid]
                    pulled[bid] = (np.asarray(b[0]), np.asarray(b[1]),
                                   np.asarray(b[2]), b[3])
                tB, wB, cB, crdB = pulled[bid]
                t4[i] = tB[row].reshape(R, R, R)
                w4[i] = wB[row].reshape(R, R, R)
                c5[i] = cB[row].reshape(3, R * R * R).T.reshape(R, R, R, 3)
                crd[i] = crdB[row]
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
