"""Fused Pallas TSDF-integration kernel (the framework's hottest op).

Replaces the per-voxel depth-image gather that makes a naive XLA integrate
~2 s/frame on TPU (scalar gathers cost ~12 ns each; a 16k-block pool needs
67M of them). The kernel restructures the problem around what the TPU memory
system is good at:

- a **worklist** of visible blocks (built in XLA from frustum culling) drives
  a 1-D Pallas grid through scalar prefetch, so only surface blocks are
  touched and their pool rows stream through VMEM via BlockSpec index maps;
- each block DMAs a small **depth/color window** from an image pyramid into
  VMEM (the window origin and mip level are precomputed per block so the
  footprint always fits a static 64x128 window);
- the per-voxel bilinear-free (nearest) sample becomes a **lane-local
  dynamic_gather**: the window is broadcast to (WV*32, WU) so the only
  supported gather form — ``take_along_axis(axis=-1)`` with equal shapes —
  selects the u coordinate, and a one-hot compare + 64-term strided reduction
  selects the v coordinate. Measured cost: ~0.01 us/block — effectively free
  against the block-row DMA.
- RGB is packed into a single f32 (24-bit integer, exactly representable), so
  only two channels are gathered per voxel.

Parity: semantics match tsdf.volume.integrate (the jnp reference) except
that blocks whose projected footprint exceeds the level-2 mip window update
only the in-window part — this can only occur closer than ~0.35 m at 5 mm
voxels, below the sensor's near plane in practice.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from azurekinect3dreconstruction_tpu.config import TSDFConfig
from azurekinect3dreconstruction_tpu.core.camera import Intrinsics
from azurekinect3dreconstruction_tpu.core import se3

WV = 64  # window rows (v); origins 8-aligned (DMA tile constraint)
WU = 256  # window cols (u); origins 128-aligned, gathered in two 128-lane halves
# usable footprint inside a window, accounting for origin alignment slack
FOOT_V = WV - 10  # 8 alignment + rounding margin
FOOT_U = WU - 132  # 128 alignment + margin
N_LEVELS = 3

# worklist sizes ladder (static shapes -> one compile per size)
WORKLIST_SIZES = (256, 512, 1024, 2048, 4096, 8192, 16384)


def _pyr_shape(h: int, w: int, lvl: int) -> Tuple[int, int]:
    hl, wl = -(-h // (1 << lvl)), -(-w // (1 << lvl))
    # round up to DMA tile multiples so aligned window slices always fit
    hl = max(-(-hl // 8) * 8, WV)
    wl = max(-(-wl // 128) * 128, WU)
    return hl, wl


@functools.partial(jax.jit, static_argnames=("h", "w"))
def prep_pyramids(depth, color, h: int, w: int):
    """(H,W) f32 depth + (H,W,3) f32 color -> 3 mip levels of (2, H_l, W_l)
    [depth, packed_rgb] planes. Packed RGB = r*2^16+g*2^8+b as f32 (exact)."""
    c8 = jnp.clip(jnp.round(color * 255.0), 0, 255)
    packed = c8[..., 0] * 65536.0 + c8[..., 1] * 256.0 + c8[..., 2]
    base = jnp.stack([depth, packed])  # (2, H, W)
    outs = []
    for lvl in range(N_LEVELS):
        img = base[:, :: 1 << lvl, :: 1 << lvl]
        ph, pw = _pyr_shape(h, w, lvl)
        img = jnp.pad(img, ((0, 0), (0, ph - img.shape[1]), (0, pw - img.shape[2])))
        outs.append(img)
    return tuple(outs)


@functools.partial(jax.jit, static_argnames=("cfg", "intr"))
def build_worklist(vol_block_coords, vol_n_blocks, T_world_cam, intr: Intrinsics,
                   cfg: TSDFConfig):
    """Frustum-cull live blocks and compute per-block window origin + mip
    level. Returns (meta int32[N, 7], n_active): rows sorted actives-first,
    padded with the trash slot. meta = (slot, bcx,bcy,bcz, v0, u0, lvl)."""
    N = vol_block_coords.shape[0]
    R = cfg.block_resolution
    T_cw = se3.inverse(jnp.asarray(T_world_cam, jnp.float32))

    corners = jnp.asarray(
        [[0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1],
         [1, 1, 0], [1, 0, 1], [0, 1, 1], [1, 1, 1]], jnp.float32
    )  # (8,3)
    pw = (vol_block_coords[:, None, :].astype(jnp.float32) + corners[None]) * (
        R * cfg.voxel_size
    )  # (N,8,3)
    pc = se3.transform_points(T_cw, pw.reshape(-1, 3)).reshape(N, 8, 3)
    z = pc[..., 2]
    zs = jnp.maximum(z, 1e-3)
    u = pc[..., 0] / zs * intr.fx + intr.cx
    v = pc[..., 1] / zs * intr.fy + intr.cy
    behind = z <= 1e-3
    # a block with any corner behind the camera: treat conservatively as
    # covering everything (level picks max, origin centered on image)
    u = jnp.where(behind, jnp.nan, u)
    v = jnp.where(behind, jnp.nan, v)
    umin, umax = jnp.nanmin(u, 1), jnp.nanmax(u, 1)
    vmin, vmax = jnp.nanmin(v, 1), jnp.nanmax(v, 1)
    any_behind = jnp.any(behind, 1)
    all_behind = jnp.all(behind, 1)
    umin = jnp.where(any_behind, 0.0, umin)
    umax = jnp.where(any_behind, float(intr.width), umax)
    vmin = jnp.where(any_behind, 0.0, vmin)
    vmax = jnp.where(any_behind, float(intr.height), vmax)

    alive = jax.lax.broadcasted_iota(jnp.int32, (N, 1), 0)[:, 0] < vol_n_blocks
    zmax = jnp.max(z, 1)
    visible = (
        alive
        & ~all_behind
        & (zmax > 1e-3)
        & (umax > 0) & (umin < intr.width)
        & (vmax > 0) & (vmin < intr.height)
    )

    sv = (vmax - vmin) / FOOT_V
    su = (umax - umin) / FOOT_U
    s = jnp.maximum(jnp.maximum(sv, su), 1.0)
    lvl = jnp.where(s > 1.0, 1, 0) + jnp.where(s > 2.0, 1, 0)  # 0,1,2 (clamped)
    scale = jnp.exp2(-lvl.astype(jnp.float32))

    hl = jnp.asarray([_pyr_shape(intr.height, intr.width, l)[0] for l in range(N_LEVELS)])
    wl = jnp.asarray([_pyr_shape(intr.height, intr.width, l)[1] for l in range(N_LEVELS)])
    # align-down origins to the DMA tiling (v: 8 sublanes, u: 128 lanes)
    v0 = jnp.floor(vmin * scale / 8.0).astype(jnp.int32) * 8
    u0 = jnp.floor(umin * scale / 128.0).astype(jnp.int32) * 128
    v0 = jnp.clip(v0, 0, hl[lvl] - WV)
    u0 = jnp.clip(u0, 0, wl[lvl] - WU)

    slot_ids = jax.lax.broadcasted_iota(jnp.int32, (N, 1), 0)[:, 0]
    order = jnp.cumsum(visible.astype(jnp.int32)) - 1
    n_active = order[-1] + 1
    trash = jnp.int32(cfg.block_capacity - 1)
    # meta is laid out (7, N): SMEM operands are lane-padded to 128, so the
    # worklist must NOT be the minor dimension (an (N, 7) layout costs N*512B)
    meta = jnp.zeros((7, N), jnp.int32).at[0].set(trash)
    dst = jnp.where(visible, order, N)
    rows = jnp.stack(
        [slot_ids, vol_block_coords[:, 0].astype(jnp.int32),
         vol_block_coords[:, 1].astype(jnp.int32), vol_block_coords[:, 2].astype(jnp.int32),
         v0, u0, lvl], axis=0,
    )  # (7, N)
    meta = meta.at[:, dst].set(rows, mode="drop")
    return meta, n_active


def _window_sample(win2, iv, iu, inb, S):
    """Sample win2 (WV, WU=256) at per-voxel (iv, iu) in (S, 128) layout.
    Returns (S, 128) f32; out-of-window voxels get 0.

    The native dynamic_gather works within 128 lanes, so the 256-wide window
    is gathered as two halves selected by iu's high bit; the v (sublane)
    select is a one-hot masked 64-term strided reduction.
    """
    ivc = jnp.clip(iv, 0, WV - 1)
    iul = jnp.clip(iu, 0, 127)
    iur = jnp.clip(iu - 128, 0, 127)

    def half(wh, idx_half):
        big = jnp.broadcast_to(wh[:, None, :], (WV, S, 128)).reshape(WV * S, 128)
        idx = jnp.broadcast_to(idx_half[None], (WV, S, 128)).reshape(WV * S, 128)
        return jnp.take_along_axis(big, idx, axis=1)

    g_l = half(win2[:, :128], iul)
    g_r = half(win2[:, 128:], iur)
    right = jnp.broadcast_to((iu >= 128)[None], (WV, S, 128)).reshape(WV * S, 128)
    g2 = jnp.where(right, g_r, g_l)

    rr = jax.lax.broadcasted_iota(jnp.int32, (WV * S, 128), 0) // S
    ivb = jnp.broadcast_to(ivc[None], (WV, S, 128)).reshape(WV * S, 128)
    sel = jnp.where(rr == ivb, g2, 0.0)
    acc = jnp.zeros((S, 128), jnp.float32)
    for r in range(WV):
        acc = acc + sel[r * S : (r + 1) * S]
    return jnp.where(inb, acc, 0.0)


def _make_kernel(R: int, intr: Intrinsics, cfg: TSDFConfig):
    V = R * R * R
    assert V % 128 == 0, "block_resolution^3 must be a multiple of 128"
    S = V // 128  # sublane rows when the block is viewed as (S, 128)

    trash_slot = cfg.block_capacity - 1

    def kernel(meta_ref, params_ref, p0_ref, p1_ref, p2_ref,
               t_in, w_in, c_in, t_out, w_out, c_out, win, sem):
        i = pl.program_id(0)
        is_pad = meta_ref[0, i] == trash_slot

        # padding steps write nothing (their in/out block is the trash row,
        # whose content is irrelevant) — skip the DMA and all compute.
        @pl.when(jnp.logical_not(is_pad))
        def _run():
            _kernel_body(i, meta_ref, params_ref, p0_ref, p1_ref, p2_ref,
                         t_in, w_in, c_in, t_out, w_out, c_out, win, sem)

    def _kernel_body(i, meta_ref, params_ref, p0_ref, p1_ref, p2_ref,
                     t_in, w_in, c_in, t_out, w_out, c_out, win, sem):
        bcx = meta_ref[1, i]
        bcy = meta_ref[2, i]
        bcz = meta_ref[3, i]
        # origins are align-down'ed in build_worklist; assert it to Mosaic
        v0 = pl.multiple_of(meta_ref[4, i], 8)
        u0 = pl.multiple_of(meta_ref[5, i], 128)
        lvl = meta_ref[6, i]

        for l, pref in ((0, p0_ref), (1, p1_ref), (2, p2_ref)):
            @pl.when(lvl == l)
            def _(pref=pref):
                cp = pltpu.make_async_copy(
                    pref.at[:, pl.ds(v0, WV), pl.ds(u0, WU)], win, sem
                )
                cp.start()
                cp.wait()

        P = lambda k: params_ref[0, k]
        # per-voxel coordinates in (S, 128) layout; voxel lin = x*R^2 + y*R + z
        srow = jax.lax.broadcasted_iota(jnp.int32, (S, 128), 0)
        lcol = jax.lax.broadcasted_iota(jnp.int32, (S, 128), 1)
        vox = srow * 128 + lcol
        ix = vox // (R * R)
        iy = (vox // R) % R
        iz = vox % R

        voxel = P(20)
        wx = (bcx * R + ix).astype(jnp.float32) * voxel + 0.5 * voxel
        wy = (bcy * R + iy).astype(jnp.float32) * voxel + 0.5 * voxel
        wz = (bcz * R + iz).astype(jnp.float32) * voxel + 0.5 * voxel

        cx_ = P(0) * wx + P(1) * wy + P(2) * wz + P(3)
        cy_ = P(4) * wx + P(5) * wy + P(6) * wz + P(7)
        cz_ = P(8) * wx + P(9) * wy + P(10) * wz + P(11)

        zsafe = jnp.maximum(cz_, 1e-6)
        u = cx_ / zsafe * P(16) + P(18)
        v = cy_ / zsafe * P(17) + P(19)
        scale = jnp.where(lvl == 0, 1.0, jnp.where(lvl == 1, 0.5, 0.25))
        iv = jnp.round(v * scale).astype(jnp.int32) - v0
        iu = jnp.round(u * scale).astype(jnp.int32) - u0
        # in-image test is in FULL-res pixel coords (mirrors the jnp path)
        ui = jnp.round(u).astype(jnp.int32)
        vi = jnp.round(v).astype(jnp.int32)
        inb = (
            (cz_ > 1e-4)
            & (ui >= 0) & (vi >= 0)
            & (ui < int(intr.width)) & (vi < int(intr.height))
            & (iv >= 0) & (iv < WV) & (iu >= 0) & (iu < WU)
        )

        d = _window_sample(win[0], iv, iu, inb, S)
        prgb = _window_sample(win[1], iv, iu, inb, S)
        pr = jnp.floor(prgb / 65536.0)
        pg = jnp.floor((prgb - pr * 65536.0) / 256.0)
        pb = prgb - pr * 65536.0 - pg * 256.0

        inv_trunc = P(21)
        sdf = d - cz_
        upd = inb & (d > 0.0) & (sdf > -P(22))
        tsdf_obs = jnp.minimum(sdf * inv_trunc, 1.0)

        w_old = w_in[0]
        t_old = t_in[0]
        inv = 1.0 / jnp.maximum(w_old + 1.0, 1.0)
        t_new = jnp.where(upd, (t_old * w_old + tsdf_obs) * inv, t_old)
        w_new = jnp.where(upd, jnp.minimum(w_old + 1.0, P(23)), w_old)
        t_out[0] = t_new
        w_out[0] = w_new

        for ch, val in ((0, pr), (1, pg), (2, pb)):
            c_old = c_in[0, ch]
            c_new = jnp.where(upd, (c_old * w_old + val / 255.0) * inv, c_old)
            c_out[0, ch] = c_new

    return kernel


@functools.lru_cache(maxsize=32)
def _integrate_fn(R: int, N: int, hash_cap: int, intr: Intrinsics, cfg: TSDFConfig,
                  M: int, interpret: bool):
    V = R * R * R
    kernel = _make_kernel(R, intr, cfg)
    shapes = [_pyr_shape(intr.height, intr.width, l) for l in range(N_LEVELS)]

    S = V // 128
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(M,),
        in_specs=[
            pl.BlockSpec((1, 24), lambda i, m: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec((1, S, 128), lambda i, m: (m[0, i], 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, S, 128), lambda i, m: (m[0, i], 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, S, 128), lambda i, m: (m[0, i], 0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, S, 128), lambda i, m: (m[0, i], 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, S, 128), lambda i, m: (m[0, i], 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, S, 128), lambda i, m: (m[0, i], 0, 0, 0), memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, WV, WU), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
    )

    S = V // 128

    def call(meta, params, p0, p1, p2, tsdf, weight, color):
        # pool arrays arrive kernel-native (N, S, 128): NO reshape here — a
        # reshape at this boundary breaks XLA's alias chain and copies the
        # whole pool per call (measured 9+ ms/frame)
        return pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=(
                jax.ShapeDtypeStruct((N, S, 128), jnp.float32),
                jax.ShapeDtypeStruct((N, S, 128), jnp.float32),
                jax.ShapeDtypeStruct((N, 3, S, 128), jnp.float32),
            ),
            input_output_aliases={5: 0, 6: 1, 7: 2},
            interpret=interpret,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=12 * 1024 * 1024,
            ),
        )(meta, params, p0, p1, p2, tsdf, weight, color)

    return jax.jit(call, donate_argnums=(5, 6, 7))


@functools.partial(jax.jit, static_argnames=("intr",))
def _params_array_jit(T_world_cam, intr: Intrinsics, extra):
    """Device-side params build (avoids host round-trip for traced poses)."""
    T_cw = se3.inverse(jnp.asarray(T_world_cam, jnp.float32))
    p = jnp.zeros((24,), jnp.float32)
    p = p.at[:12].set(T_cw[:3, :4].reshape(-1))
    p = p.at[16].set(intr.fx).at[17].set(intr.fy).at[18].set(intr.cx).at[19].set(intr.cy)
    p = p.at[20:24].set(extra)
    return p[None]


def integrate_worklist(vol, depth, color, T_world_cam, intr: Intrinsics,
                       cfg: TSDFConfig, worklist_size: int = None,
                       interpret: bool = None):
    """Pallas-accelerated integrate (update phase). Mirrors
    tsdf.volume.integrate semantics; call allocate() first."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    meta_full, n_active = build_worklist(
        vol.block_coords, vol.n_blocks, T_world_cam, intr, cfg
    )
    if worklist_size is None:
        na = int(n_active)
        worklist_size = next(
            (m for m in WORKLIST_SIZES if m >= na), meta_full.shape[1]
        )
    worklist_size = min(worklist_size, meta_full.shape[1])
    meta = meta_full[:, :worklist_size]
    p0, p1, p2 = prep_pyramids(jnp.asarray(depth), jnp.asarray(color),
                               intr.height, intr.width)
    extra = jnp.asarray(
        [cfg.voxel_size, 1.0 / cfg.sdf_trunc, cfg.sdf_trunc, cfg.max_integration_weight],
        jnp.float32,
    )
    params = _params_array_jit(T_world_cam, intr, extra)
    fn = _integrate_fn(cfg.block_resolution, vol.tsdf.shape[0], cfg.hash_capacity,
                       intr, cfg, worklist_size, interpret)
    tsdf, weight, colorv = fn(meta, params, p0, p1, p2, vol.tsdf, vol.weight, vol.color)
    return vol._replace(tsdf=tsdf, weight=weight, color=colorv,
                        overflow=vol.overflow | (n_active > worklist_size))


# ---------------------------------------------------------------------------
# fused per-frame step (zero host syncs — scan-able, donate-able)
# ---------------------------------------------------------------------------


def integrate_step(vol, depth, color, T_world_cam, rays, intr: Intrinsics,
                   cfg: TSDFConfig, worklist_size: int, stride: int = 2,
                   interpret: bool = False):
    """allocate + worklist + pyramids + Pallas integrate as pure traced ops.

    Unlike :func:`integrate_worklist`, there is NO host synchronization: the
    worklist size is a static budget and overflow just sets the sticky flag
    (callers poll it at their own cadence). Safe to wrap in jit / lax.scan —
    one device dispatch per *batch* of frames, which matters enormously when
    the host link is slow (and still saves launch overhead when it is not).
    """
    from azurekinect3dreconstruction_tpu.tsdf import volume as tsdf_volume

    depth = jnp.asarray(depth)
    color = jnp.asarray(color)
    vol = tsdf_volume.allocate(vol, depth, rays, T_world_cam, cfg, stride=stride)
    meta_full, n_active = build_worklist(
        vol.block_coords, vol.n_blocks, T_world_cam, intr, cfg
    )
    M = min(worklist_size, meta_full.shape[1])
    meta = meta_full[:, :M]
    p0, p1, p2 = prep_pyramids(depth, color, intr.height, intr.width)
    extra = jnp.asarray(
        [cfg.voxel_size, 1.0 / cfg.sdf_trunc, cfg.sdf_trunc, cfg.max_integration_weight],
        jnp.float32,
    )
    params = _params_array_jit(T_world_cam, intr, extra)
    fn = _integrate_fn(cfg.block_resolution, vol.tsdf.shape[0], cfg.hash_capacity,
                       intr, cfg, M, interpret)
    tsdf_a, weight_a, color_a = fn(meta, params, p0, p1, p2,
                                   vol.tsdf, vol.weight, vol.color)
    return vol._replace(
        tsdf=tsdf_a, weight=weight_a, color=color_a,
        overflow=vol.overflow | (n_active > M),
    )


@functools.lru_cache(maxsize=16)
def make_fused_frame_fn(intr: Intrinsics, cfg: TSDFConfig, worklist_size: int,
                        stride: int = 2, interpret: bool = False):
    """One-dispatch-per-frame fused step: (vol, depth, color, T, rays) -> vol."""

    def step(vol, depth, color, T, rays):
        return integrate_step(vol, depth, color, T, rays, intr, cfg,
                              worklist_size, stride, interpret)

    return jax.jit(step, donate_argnums=(0,))


@functools.lru_cache(maxsize=16)
def make_fused_batch_fn(intr: Intrinsics, cfg: TSDFConfig, worklist_size: int,
                        stride: int = 2, interpret: bool = False):
    """One-dispatch-per-BATCH fused step via lax.scan:
    (vol, depths (F,H,W), colors (F,H,W,3), poses (F,4,4), rays) -> vol."""

    def batch(vol, depths, colors, poses, rays):
        def body(v, frame):
            d, c, T = frame
            return integrate_step(v, d, c, T, rays, intr, cfg,
                                  worklist_size, stride, interpret), None

        vol, _ = jax.lax.scan(body, vol, (depths, colors, poses))
        return vol

    return jax.jit(batch, donate_argnums=(0,))
