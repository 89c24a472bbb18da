"""Fused Pallas warp-and-reduce kernel for dense RGB-D odometry on TPU.

The XLA odometry (tracking/odometry.py) is correct everywhere but its dense
warp does ~10M scalar image gathers per frame — ~3 s on TPU. This kernel
restructures one Gauss–Newton iteration the same way the TSDF integrate
kernel restructured fusion:

- the source image is processed in (32, 128) tiles (native VPU layout);
- a per-iteration XLA pre-pass warps all pixels (elementwise) and computes
  each tile's warped bounding box -> an aligned 64x256 target window per
  tile (tiles whose footprint exceeds the window mask those pixels out —
  they are exactly the pixels whose motion is untrackable at that level);
- inside the kernel the bilinear samples of target intensity/depth become
  lane-local ``take_along_axis`` gathers + one-hot row reductions on the
  VMEM-resident window (see tsdf_kernels._window_sample);
- image gradients come from the SOURCE pyramid (the standard
  forward-compositional "gradient swap": equal at convergence, and it turns
  4 more warped channels into 4 cheap blocked inputs);
- each tile reduces its pixels straight to the 6x6 normal equations
  (21 upper-triangle entries + 6 Jtr + counts), so the kernel's output is a
  few dozen floats per tile; XLA sums tiles, solves 6x6, updates the pose.

Parity: same residuals/weights/gates as tracking/odometry._level_step; the
gradient swap changes the GN *path* slightly but not the fixed point —
tests check converged poses against the XLA reference.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from azurekinect3dreconstruction_tpu.config import OdometryConfig
from azurekinect3dreconstruction_tpu.core.camera import Intrinsics
from azurekinect3dreconstruction_tpu.core import se3
from azurekinect3dreconstruction_tpu.ops.image import build_pyramid, sobel_gradients
from azurekinect3dreconstruction_tpu.tracking.odometry import OdometryResult

TV, TU = 32, 128  # source tile
WV, WU = 64, 256  # target window (origins 8/128-aligned)

_PP = jax.lax.Precision.HIGHEST


def _pad_dims(h: int, w: int) -> Tuple[int, int]:
    hp = max(-(-h // TV) * TV, WV)
    wp = max(-(-w // TU) * TU, WU)
    return hp, wp


def _window_sample_bilinear(win2, v, u, inb, S):
    """Bilinear sample of win2 (WV, WU) at float window coords (v, u) given
    in (S, 128) layout. Returns (S, 128) f32 (0 where ~inb)."""
    v0 = jnp.floor(v)
    u0 = jnp.floor(u)
    fv = v - v0
    fu = u - u0
    iv0 = v0.astype(jnp.int32)
    iu0 = u0.astype(jnp.int32)

    def nearest(iv, iu):
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
        return acc

    c00 = nearest(iv0, iu0)
    c01 = nearest(iv0, iu0 + 1)
    c10 = nearest(iv0 + 1, iu0)
    c11 = nearest(iv0 + 1, iu0 + 1)
    val = (c00 * (1 - fu) * (1 - fv) + c01 * fu * (1 - fv)
           + c10 * (1 - fu) * fv + c11 * fu * fv)
    return jnp.where(inb, val, 0.0)


def _make_kernel(cfg: OdometryConfig, ntj: int, width: int, height: int,
                 hp: int, wp: int):
    def kernel(params_ref, tgt_ref, src_ref, out_ref, win, sem):
        i = pl.program_id(0)

        P = lambda k: params_ref[0, k]
        # source pixel coordinates of this tile
        ti = i // ntj
        tj = i % ntj
        vs = (ti * TV + jax.lax.broadcasted_iota(jnp.int32, (TV, TU), 0)
              ).astype(jnp.float32)
        us = (tj * TU + jax.lax.broadcasted_iota(jnp.int32, (TV, TU), 1)
              ).astype(jnp.float32)

        i_s = src_ref[0]
        d_s = src_ref[1]
        gx = src_ref[2]
        gy = src_ref[3]
        gdx = src_ref[4]
        gdy = src_ref[5]

        fx, fy, cx, cy = P(16), P(17), P(18), P(19)
        z = d_s
        xs = (us - cx) / fx * z
        ys = (vs - cy) / fy * z
        valid_s = (z > P(20)) & (z < P(21))

        px = P(0) * xs + P(1) * ys + P(2) * z + P(3)
        py = P(4) * xs + P(5) * ys + P(6) * z + P(7)
        pz = P(8) * xs + P(9) * ys + P(10) * z + P(11)
        zs = jnp.maximum(pz, 1e-6)
        ut = px / zs * fx + cx
        vt = py / zs * fy + cy

        # window origin from THIS tile's warped bbox (no host/XLA pre-pass):
        # align down to the DMA tiling and clip to the padded image
        ok0 = (z > P(20)) & (pz > P(20))
        big = jnp.float32(1e9)
        vmin = jnp.min(jnp.where(ok0, vt, big))
        umin = jnp.min(jnp.where(ok0, ut, big))
        vmin = jnp.minimum(vmin, big - 1.0)
        umin = jnp.minimum(umin, big - 1.0)
        v0 = jnp.clip((jnp.floor(vmin / 8.0).astype(jnp.int32) - 1) * 8, 0, hp - WV)
        u0 = jnp.clip(jnp.floor(umin / 128.0).astype(jnp.int32) * 128, 0, wp - WU)
        v0 = pl.multiple_of(v0, 8)
        u0 = pl.multiple_of(u0, 128)

        cp = pltpu.make_async_copy(
            tgt_ref.at[:, pl.ds(v0, WV), pl.ds(u0, WU)], win, sem
        )
        cp.start()
        cp.wait()

        wv = vt - v0.astype(jnp.float32)
        wu = ut - u0.astype(jnp.float32)
        inb = ((pz > P(20)) & (wv >= 0) & (wv < WV - 1) & (wu >= 0) & (wu < WU - 1)
               & (ut >= 0) & (ut < width - 1) & (vt >= 0) & (vt < height - 1))

        it_w = _window_sample_bilinear(win[0], wv, wu, inb, TV)
        dt_w = _window_sample_bilinear(win[1], wv, wu, inb, TV)

        r_i = it_w - i_s
        r_d = dt_w - pz
        valid = valid_s & inb & (dt_w > P(20)) & (jnp.abs(r_d) < P(22))

        inv_z = 1.0 / zs
        ju = (fx * inv_z, jnp.zeros_like(pz), -fx * px * inv_z * inv_z)
        jv = (jnp.zeros_like(pz), fy * inv_z, -fy * py * inv_z * inv_z)

        def dp_dxi(jx, jy, jz):
            return (jx, jy, jz,
                    -jy * pz + jz * py,
                    jx * pz - jz * px,
                    -jx * py + jy * px)

        # photometric rows (source-gradient swap)
        jpi = tuple(gx * a + gy * b for a, b in zip(ju, jv))
        J_i = dp_dxi(*jpi)
        jpd = tuple(gdx * a + gdy * b for a, b in zip(ju, jv))
        ez = (jnp.zeros_like(pz), jnp.zeros_like(pz), jnp.ones_like(pz))
        J_d = dp_dxi(*(a - e for a, e in zip(jpd, ez)))

        s_i, s_d, delta = P(23), P(24), P(25)
        vf = valid.astype(jnp.float32)

        def huber(r, s):
            a = jnp.abs(r * s)
            return jnp.where(a <= delta, 1.0, delta / jnp.maximum(a, 1e-12))

        w_i = huber(r_i, s_i) * vf
        w_d = huber(r_d, s_d) * vf
        w_i = w_i * P(26)  # term switches: 1/0
        w_d = w_d * P(27)
        wi2 = w_i * w_i * s_i * s_i
        wd2 = w_d * w_d * s_d * s_d

        # reduce straight to the normal equations: place the 30 scalars on
        # distinct lanes via one-hot masks (in-kernel scatter is unsupported)
        lane = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
        row = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
        out = jnp.zeros((8, 128), jnp.float32)

        def put(out, k, val):
            mask = (row == (k // 128)) & (lane == (k % 128))
            return out + jnp.where(mask, val, 0.0)

        k = 0
        for a in range(6):
            for b in range(a, 6):
                out = put(out, k, jnp.sum(J_i[a] * J_i[b] * wi2
                                          + J_d[a] * J_d[b] * wd2))
                k += 1
        for a in range(6):
            out = put(out, k, jnp.sum(J_i[a] * r_i * wi2 + J_d[a] * r_d * wd2))
            k += 1
        out = put(out, k, jnp.sum(vf))
        k += 1
        out = put(out, k, jnp.sum(jnp.where(valid, (r_i * s_i) ** 2
                                            + (r_d * s_d) ** 2, 0.0)))
        k += 1
        out = put(out, k, jnp.sum(valid_s.astype(jnp.float32)))
        out_ref[0] = out

    return kernel


@functools.lru_cache(maxsize=64)
def _iteration_fn(intr: Intrinsics, cfg: OdometryConfig, lvl: int,
                  interpret: bool):
    """One GN iteration at pyramid level lvl: (T, tgt_planes, src_planes) -> T'."""
    li = intr.scaled(1.0 / (1 << lvl))
    hp, wp = _pad_dims(li.height, li.width)
    nti, ntj = hp // TV, wp // TU
    n_tiles = nti * ntj
    kernel = _make_kernel(cfg, ntj, li.width, li.height, hp, wp)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((1, 32), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.HBM),  # target planes (2, hp, wp)
            pl.BlockSpec((6, TV, TU), lambda i: (0, i // ntj, i % ntj),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, WV, WU), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
    )

    def iteration(T, tgt_planes, src_planes, term_i, term_d):
        params = jnp.zeros((1, 32), jnp.float32)
        params = params.at[0, :12].set(T[:3, :4].reshape(-1))
        params = params.at[0, 16].set(li.fx).at[0, 17].set(li.fy)
        params = params.at[0, 18].set(li.cx).at[0, 19].set(li.cy)
        params = params.at[0, 20].set(cfg.min_depth).at[0, 21].set(cfg.max_depth)
        params = params.at[0, 22].set(cfg.max_depth_diff)
        params = params.at[0, 23].set(1.0 / cfg.sigma_intensity)
        params = params.at[0, 24].set(1.0 / cfg.sigma_depth)
        params = params.at[0, 25].set(cfg.huber_delta)
        params = params.at[0, 26].set(term_i).at[0, 27].set(term_d)

        (tile_out,) = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=(jax.ShapeDtypeStruct((n_tiles, 8, 128), jnp.float32),),
            interpret=interpret,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=10 * 1024 * 1024),
        )(params, tgt_planes, src_planes)

        sums = jnp.sum(tile_out.reshape(n_tiles, 8 * 128), axis=0)  # (1024,)
        JtJ = jnp.zeros((6, 6), jnp.float32)
        k = 0
        for a in range(6):
            for b in range(a, 6):
                JtJ = JtJ.at[a, b].set(sums[k]).at[b, a].set(sums[k])
                k += 1
        Jtr = sums[k : k + 6]
        k += 6
        n_valid = sums[k]
        sq = sums[k + 1]
        n_src = sums[k + 2]

        delta = jnp.linalg.solve(
            JtJ + cfg.damping * jnp.eye(6, dtype=jnp.float32), -Jtr)
        okd = jnp.all(jnp.isfinite(delta))
        delta = jnp.where(okd, delta, jnp.zeros_like(delta))
        T_new = jnp.matmul(se3.se3_exp(delta), T, precision=_PP)
        fitness = n_valid / jnp.maximum(n_src, 1)
        rmse = jnp.sqrt(sq / jnp.maximum(n_valid, 1))
        return T_new, fitness, rmse, n_valid

    return iteration


@functools.partial(jax.jit, static_argnames=("intr", "cfg", "interpret"))
def compute_odometry_tpu(intensity_s, depth_s, intensity_t, depth_t,
                         intr: Intrinsics, cfg: OdometryConfig = OdometryConfig(),
                         init=None, interpret: bool = False) -> OdometryResult:
    """Pallas-accelerated hybrid odometry (API mirrors
    tracking.odometry.compute_odometry)."""
    levels = len(cfg.pyramid_iters)
    pyr_s = build_pyramid(jnp.asarray(intensity_s), jnp.asarray(depth_s), levels)
    pyr_t = build_pyramid(jnp.asarray(intensity_t), jnp.asarray(depth_t), levels)

    term_i = jnp.float32(0.0 if cfg.term == "depth" else 1.0)
    term_d = jnp.float32(0.0 if cfg.term == "color" else 1.0)

    T = jnp.eye(4, dtype=jnp.float32) if init is None else jnp.asarray(init, jnp.float32)
    fitness = jnp.zeros(())
    rmse = jnp.zeros(())
    n_valid = jnp.zeros(())

    for lvl in reversed(range(levels)):
        li = intr.scaled(1.0 / (1 << lvl))
        hp, wp = _pad_dims(li.height, li.width)
        i_s, d_s = pyr_s[lvl]
        i_t, d_t = pyr_t[lvl]

        def padto(a):
            return jnp.pad(a, ((0, hp - a.shape[0]), (0, wp - a.shape[1])))

        gx, gy = sobel_gradients(i_s)
        gdx, gdy = sobel_gradients(d_s)
        dv = d_s > 0
        okg = (dv & jnp.roll(dv, 1, 0) & jnp.roll(dv, -1, 0)
               & jnp.roll(dv, 1, 1) & jnp.roll(dv, -1, 1))
        gdx = jnp.where(okg, gdx, 0.0)
        gdy = jnp.where(okg, gdy, 0.0)
        src_planes = jnp.stack([padto(i_s), padto(d_s), padto(gx), padto(gy),
                                padto(gdx), padto(gdy)])
        tgt_planes = jnp.stack([padto(i_t), padto(d_t)])

        it_fn = _iteration_fn(intr, cfg, lvl, interpret)

        def body(_, carry):
            T, f, r, n = carry
            T, f, r, n = it_fn(T, tgt_planes, src_planes, term_i, term_d)
            return T, f, r, n

        T, fitness, rmse, n_valid = jax.lax.fori_loop(
            0, cfg.pyramid_iters[lvl], body, (T, fitness, rmse, n_valid))

    return OdometryResult(T_target_source=T, fitness=fitness, rmse=rmse,
                          inliers=n_valid.astype(jnp.int32))
