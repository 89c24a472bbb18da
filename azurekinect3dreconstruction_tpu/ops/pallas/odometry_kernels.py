"""Fused Pallas warp-and-reduce kernel for dense RGB-D odometry on TPU.

The XLA odometry (tracking/odometry.py) is correct everywhere but its dense
warp does ~10M scalar image gathers per frame — ~3 s on TPU. This kernel
restructures the whole Gauss–Newton pyramid the TPU way:

- ONE pallas_call per pyramid LEVEL runs ALL its GN iterations: grid
  (iters, n_tiles + 1). The pose lives in VMEM scratch; the extra grid step
  per iteration solves the 6x6 normal equations (unrolled scalar Cholesky
  with Jacobi equilibration), applies the scalar se3 exp, and composes the
  pose — all as in-kernel machine instructions. At the XLA level those
  ~180 tiny scalar HLO ops cost ~2 ms PER ITERATION (TPU pays ~10 us per
  tiny op); in-kernel they are free.
- source tiles are (32, image_width) — full-width, because grid steps have
  ~10 us fixed overhead — and each tile DMAs a rows-only 64-row target
  window computed from its own warped bbox (no host/XLA pre-pass);
- each 128-lane u-group slices its own 256-wide sub-window (aligned dynamic
  VMEM slice) and bilinearly samples it with lane-local ``take_along_axis``
  over row-broadcast copies; the v-interpolation is fused into the row
  reduction as a hat weight (see _window_sample_bilinear_pair);
- image gradients come from the SOURCE pyramid (the standard
  forward-compositional "gradient swap": equal at convergence, and it turns
  4 more warped channels into 4 cheap blocked inputs);
- each tile reduces its pixels straight to the 6x6 normal equations
  (21 upper-triangle entries + 6 Jtr + counts) accumulated in VMEM scratch.

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
from azurekinect3dreconstruction_tpu.core import linalg
from azurekinect3dreconstruction_tpu.core import se3
from azurekinect3dreconstruction_tpu.ops.image import build_pyramid, sobel_gradients
from azurekinect3dreconstruction_tpu.tracking.odometry import OdometryResult

TV = 32   # tile rows; a tile spans the FULL padded image width (grid steps
          # have ~10 us fixed overhead on TPU, so fewer/fatter tiles win)
E = 24   # skew taps: per-group v-flow spread tolerance (rows)
WV = TV + E  # per-group target window rows (origin 8-aligned)
GW = 256  # per-128-lane-group window width (128 lanes of u margin)
PT = 40  # target-plane TOP pad rows (8-aligned). Window origins anchored on
         # in-bounds pixels satisfy dvming >= -(j*TV + TV - 1), so the
         # 8-floored origin is >= -(TV + 6) = -38 > -PT and never clamps —
         # without it, any upward v-flow in tile 0 (even f32 noise at
         # identity) clipped the origin to 0 and dropped valid pixels.

_PP = jax.lax.Precision.HIGHEST


def _pad_dims(h: int, w: int) -> Tuple[int, int]:
    hp = max(-(-h // TV) * TV, 2 * TV)
    wp = max(-(-w // 128) * 128, GW)
    return hp, wp


def _skew_sample_pair(winA, winB, e, u, inb, S):
    """Bilinear sample of two (WV, GW) window refs at per-pixel row offset
    ``e`` and window column ``u``, both (S, 128). The window is
    SKEW-ANCHORED: pixel row s samples window rows s + e with e in [0, E)
    — dense RGB-D flow varies slowly, so per-group anchoring keeps e tiny.
    Each of the E candidate offsets d is a misaligned static row slice of
    the window (2D refs only: slicing higher-rank scratch this way crashes
    the Mosaic layout pass), weighted by the bilinear hat
    max(0, 1 - |e - d|); all take_along_axis gathers run on (S, 128)
    arrays. The naive alternative — broadcasting all window rows against
    all pixel rows — moves WV/E times more data through the gather unit.

    Returns two (S, 128) f32 maps (0 where ~inb)."""
    u0 = jnp.floor(u)
    fu = u - u0
    iu0 = u0.astype(jnp.int32)
    iu1 = iu0 + 1
    il0 = jnp.clip(iu0, 0, 127)
    ir0 = jnp.clip(iu0 - 128, 0, 127)
    r0 = iu0 >= 128
    il1 = jnp.clip(iu1, 0, 127)
    ir1 = jnp.clip(iu1 - 128, 0, 127)
    r1 = iu1 >= 128

    accs = [jnp.zeros((S, 128), jnp.float32) for _ in range(4)]
    for d in range(E):
        wd = jnp.maximum(1.0 - jnp.abs(e - d), 0.0)
        for c, wref in enumerate((winA, winB)):
            wsl = wref[d : d + S, :]  # (S, GW) misaligned slice
            wl = wsl[:, :128]
            wr = wsl[:, 128:]
            g0 = jnp.where(r0, jnp.take_along_axis(wr, ir0, axis=1),
                           jnp.take_along_axis(wl, il0, axis=1))
            g1 = jnp.where(r1, jnp.take_along_axis(wr, ir1, axis=1),
                           jnp.take_along_axis(wl, il1, axis=1))
            accs[2 * c] = accs[2 * c] + wd * g0
            accs[2 * c + 1] = accs[2 * c + 1] + wd * g1

    valA = accs[0] * (1 - fu) + accs[1] * fu
    valB = accs[2] * (1 - fu) + accs[3] * fu
    return jnp.where(inb, valA, 0.0), jnp.where(inb, valB, 0.0)


def _chol_solve6(A, b):
    """Unrolled scalar Cholesky solve of a damped 6x6 SPD system.

    A: 6x6 nested lists of traced scalars; b: list of 6. Runs INSIDE the
    kernel: each op is a machine instruction. (At the XLA level the same
    ~120-op scalar DAG costs ~1.2 ms per solve — TPU pays ~10 us per tiny
    HLO op — which is why the whole GN update lives in the kernel.)"""
    L = [[None] * 6 for _ in range(6)]
    for i in range(6):
        for j in range(i + 1):
            s = A[i][j]
            for k in range(j):
                s = s - L[i][k] * L[j][k]
            if i == j:
                L[i][j] = jnp.sqrt(jnp.maximum(s, 1e-30))
            else:
                L[i][j] = s / L[j][j]
    y = [None] * 6
    for i in range(6):
        s = b[i]
        for k in range(i):
            s = s - L[i][k] * y[k]
        y[i] = s / L[i][i]
    x = [None] * 6
    for i in reversed(range(6)):
        s = y[i]
        for k in range(i + 1, 6):
            s = s - L[k][i] * x[k]
        x[i] = s / L[i][i]
    return x


def _se3_exp_scalars(d):
    """In-kernel scalar se3 exp: twist list (vx vy vz wx wy wz) -> 3x4
    nested lists [R | t]. Mirrors core.se3.se3_exp (same series thresholds)."""
    vx, vy, vz, wx, wy, wz = d
    t2 = wx * wx + wy * wy + wz * wz
    th = jnp.sqrt(t2 + 1e-32)
    big = t2 > 1e-6
    sn, cs = jnp.sin(th), jnp.cos(th)
    sa = jnp.where(big, sn / th, 1.0 - t2 / 6.0)
    sb = jnp.where(big, (1.0 - cs) / jnp.maximum(t2, 1e-32), 0.5 - t2 / 24.0)
    sc = jnp.where(big, (th - sn) / jnp.maximum(t2 * th, 1e-32),
                   1.0 / 6.0 - t2 / 120.0)
    zero = vx * 0.0
    W = [[zero, -wz, wy], [wz, zero, -wx], [-wy, wx, zero]]
    W2 = [[sum(W[i][k] * W[k][j] for k in range(3)) for j in range(3)]
          for i in range(3)]
    R = [[(1.0 if i == j else 0.0) + sa * W[i][j] + sb * W2[i][j]
          for j in range(3)] for i in range(3)]
    V = [[(1.0 if i == j else 0.0) + sb * W[i][j] + sc * W2[i][j]
          for j in range(3)] for i in range(3)]
    v = [vx, vy, vz]
    t = [sum(V[i][k] * v[k] for k in range(3)) for i in range(3)]
    return [[R[i][0], R[i][1], R[i][2], t[i]] for i in range(3)]


def _make_level_kernel(cfg: OdometryConfig, n_tiles: int,
                       width: int, height: int, hp: int, wp: int):
    """One whole pyramid LEVEL per pallas_call: grid (iters, n_tiles + 1).

    Steps j < n_tiles accumulate the tile normal equations into VMEM
    scratch; step j == n_tiles does the 6x6 Cholesky solve, the se3 exp and
    the pose composition as in-kernel scalar arithmetic, updating the pose
    scratch the next iteration's tiles read. One kernel replaces
    iters x (pallas_call + ~2 ms of XLA scalar glue).

    Tiles are (TV, wp) — full image width — so the window DMA is rows-only
    and each 128-lane u-group picks its own GW-wide sub-window (aligned
    dynamic VMEM slice) for the bilinear gather."""

    ngroups = wp // 128

    def kernel(params_ref, tgt_ref, src_ref, out_ref, *scr):
        # scr: ngroups*2 window buffers (2D — see _skew_sample_pair), then
        # acc, pose, DMA semaphores
        wins = scr[: 2 * ngroups]
        acc, pose, sem = scr[2 * ngroups], scr[2 * ngroups + 1], scr[-1]
        it = pl.program_id(0)
        j = pl.program_id(1)
        P = lambda k: params_ref[0, k]
        lane1 = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)

        def onehot_row(pairs):
            row = jnp.zeros((1, 128), jnp.float32)
            for k, val in pairs:
                row = row + jnp.where(lane1 == k, val, 0.0)
            return row

        @pl.when((it == 0) & (j == 0))
        def _init_pose():
            pose[:, :] = onehot_row([(k, P(k)) for k in range(12)])

        # pose lane 31 is the convergence flag: once a GN step's norm drops
        # below tol (params lane 30), remaining iterations of this level
        # skip all tile/solve work (out_ref keeps the converged values —
        # unwritten output blocks are revisited, not cleared)
        not_conv = pose[0, 31] == 0.0

        @pl.when((j == 0) & not_conv)
        def _zero_acc():
            acc[:, :] = jnp.zeros((8, 128), jnp.float32)

        @pl.when((j < n_tiles) & not_conv)
        def _tile():
            Tp = lambda k: pose[0, k]
            vs = (j * TV + jax.lax.broadcasted_iota(jnp.int32, (TV, wp), 0)
                  ).astype(jnp.float32)
            us = jax.lax.broadcasted_iota(jnp.int32, (TV, wp), 1
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

            px = Tp(0) * xs + Tp(1) * ys + Tp(2) * z + Tp(3)
            py = Tp(4) * xs + Tp(5) * ys + Tp(6) * z + Tp(7)
            pz = Tp(8) * xs + Tp(9) * ys + Tp(10) * z + Tp(11)
            zs = jnp.maximum(pz, 1e-6)
            ut = px / zs * fx + cx
            vt = py / zs * fy + cy

            # per-128-lane-group windows, anchored on the group's own warped
            # bbox: u origin from min warped column, v origin SKEWED by the
            # group's min v-flow (window row for pixel row s is s + e with
            # e in [0, E)). All DMAs start before any group is sampled.
            ok0 = (z > P(20)) & (pz > P(20))
            big = jnp.float32(1e9)
            inb0 = ((pz > P(20)) & (ut >= 0) & (ut < width - 1)
                    & (vt >= 0) & (vt < height - 1))
            # v-flow, materialized BEFORE the per-group lane slices: slicing
            # a pure broadcasted-iota (vs) crashes the Mosaic layout pass
            dv = vt - vs

            # window anchoring uses IN-BOUNDS pixels only: out-of-frustum
            # pixels (vt < 0 / ut < 0) can never be sampled but would drag
            # the window origin away from the pixels that can
            anc = ok0 & inb0
            copies, origins = [], []
            for g in range(ngroups):
                sl = slice(g * 128, (g + 1) * 128)
                okg = anc[:, sl]
                utg = ut[:, sl]
                uming = jnp.minimum(jnp.min(jnp.where(okg, utg, big)),
                                    big - 1.0)
                u0g = jnp.clip(jnp.floor(uming / 128.0).astype(jnp.int32)
                               * 128, 0, wp - GW)
                u0g = pl.multiple_of(u0g, 128)
                dvg = dv[:, sl]
                dvming = jnp.clip(jnp.min(jnp.where(okg, dvg, big)),
                                  -1e6, 1e6)
                # target planes carry PT pad rows on TOP and TV on the
                # bottom so the skew window never clips at either image
                # edge (clipping breaks skew alignment and masks pixels:
                # see PT above); v0g is in PADDED coordinates
                v0g = jnp.clip(j * TV + PT
                               + jnp.floor(dvming / 8.0).astype(jnp.int32) * 8,
                               0, PT + hp + TV - WV)
                v0g = pl.multiple_of(v0g, 8)
                cps = []
                for c in range(2):
                    cp = pltpu.make_async_copy(
                        tgt_ref.at[c, pl.ds(v0g, WV), pl.ds(u0g, GW)],
                        wins[2 * g + c], sem.at[g, c],
                    )
                    cp.start()
                    cps.append(cp)
                copies.append(cps)
                origins.append((u0g, v0g))

            sloc = jax.lax.broadcasted_iota(jnp.int32, (TV, 128), 0
                                            ).astype(jnp.float32)
            its, dts, inbs = [], [], []
            for g in range(ngroups):
                sl = slice(g * 128, (g + 1) * 128)
                u0g, v0g = origins[g]
                copies[g][0].wait()
                copies[g][1].wait()
                ulg = ut[:, sl] - u0g.astype(jnp.float32)
                # vt is in image coords, v0g in padded (top-pad PT) coords
                eg = vt[:, sl] + PT - v0g.astype(jnp.float32) - sloc
                inbg = (inb0[:, sl] & (ulg >= 0) & (ulg < GW - 1)
                        & (eg >= 0) & (eg < E - 1))
                itg, dtg = _skew_sample_pair(wins[2 * g], wins[2 * g + 1],
                                             eg, ulg, inbg, TV)
                its.append(itg)
                dts.append(dtg)
                inbs.append(inbg)
            it_w = jnp.concatenate(its, axis=1)
            dt_w = jnp.concatenate(dts, axis=1)
            inb = jnp.concatenate(inbs, axis=1)

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

            # reduce straight to the normal equations: place the 30 scalars
            # on distinct lanes via one-hot masks (in-kernel scatter is
            # unsupported)
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
                out = put(out, k, jnp.sum(J_i[a] * r_i * wi2
                                          + J_d[a] * r_d * wd2))
                k += 1
            out = put(out, k, jnp.sum(vf))
            k += 1
            out = put(out, k, jnp.sum(jnp.where(valid, (r_i * s_i) ** 2
                                                + (r_d * s_d) ** 2, 0.0)))
            k += 1
            out = put(out, k, jnp.sum(valid_s.astype(jnp.float32)))
            acc[:, :] = acc[:, :] + out

        @pl.when((j == n_tiles) & not_conv)
        def _solve():
            s = lambda k: acc[0, k]
            damp = P(28)
            A = [[s(_JTJ_K[a][b]) + (damp if a == b else 0.0)
                  for b in range(6)] for a in range(6)]
            rhs = [-s(21 + a) for a in range(6)]
            # Jacobi equilibration: odometry JtJ mixes pixel^2 (fx^2 ~ 1e5)
            # and metric units, cond ~ 1e6+ — unpivoted f32 Cholesky alone
            # loses ~cond*eps of the step. Symmetric diagonal scaling brings
            # the solve back to XLA-LU accuracy for ~30 scalar ops.
            d = [jax.lax.rsqrt(jnp.maximum(A[a][a], 1e-30)) for a in range(6)]
            As = [[A[a][b] * d[a] * d[b] for b in range(6)] for a in range(6)]
            rs = [rhs[a] * d[a] for a in range(6)]
            ys = _chol_solve6(As, rs)
            delta = [ys[a] * d[a] for a in range(6)]
            okd = jnp.isfinite(delta[0])
            for dcomp in delta[1:]:
                okd = okd & jnp.isfinite(dcomp)
            delta = [jnp.where(okd, dcomp, 0.0) for dcomp in delta]
            E = _se3_exp_scalars(delta)
            Tk = lambda r, c: pose[0, r * 4 + c]
            Tn = [[E[r][0] * Tk(0, c) + E[r][1] * Tk(1, c)
                   + E[r][2] * Tk(2, c) + (E[r][3] if c == 3 else 0.0)
                   for c in range(4)] for r in range(3)]
            n_valid = s(27)
            fitness = n_valid / jnp.maximum(s(29), 1.0)
            rmse = jnp.sqrt(s(28) / jnp.maximum(n_valid, 1.0))

            pose_pairs = [(r * 4 + c, Tn[r][c]) for r in range(3)
                          for c in range(4)]
            # convergence: flag lane 31 once this step's norm^2 < tol^2
            # (tol = 0 disables — lane 30 carries tol^2)
            dn2 = sum(dcomp * dcomp for dcomp in delta)
            tol2 = P(30)
            conv = jnp.where((tol2 > 0.0) & (dn2 < tol2), 1.0, 0.0)
            lane1_ = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
            prow = jnp.zeros((1, 128), jnp.float32)
            for k, val in pose_pairs + [(31, conv)]:
                prow = prow + jnp.where(lane1_ == k, val, 0.0)
            pose[:, :] = prow
            orow = prow
            for k, val in ((16, fitness), (17, rmse), (18, n_valid)):
                orow = orow + jnp.where(lane1_ == k, val, 0.0)
            row8 = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
            out_ref[:, :] = jnp.where(row8 == 0,
                                      jnp.broadcast_to(orow, (8, 128)), 0.0)

    return kernel


# JtJ upper-triangle packing: (a, b) -> flat k
_JTJ_K = [[0] * 6 for _ in range(6)]
_k = 0
for _a in range(6):
    for _b in range(_a, 6):
        _JTJ_K[_a][_b] = _k
        _JTJ_K[_b][_a] = _k
        _k += 1


@functools.lru_cache(maxsize=64)
def _level_fn(intr: Intrinsics, cfg: OdometryConfig, lvl: int, iters: int,
              interpret: bool):
    """All GN iterations at pyramid level lvl in ONE pallas_call:
    (T, tgt_planes, src_planes) -> (T', fitness, rmse, n_valid)."""
    li = intr.scaled(1.0 / (1 << lvl))
    hp, wp = _pad_dims(li.height, li.width)
    n_tiles = hp // TV
    kernel = _make_level_kernel(cfg, n_tiles, li.width, li.height, hp, wp)

    def src_map(i, j):
        return (0, jnp.minimum(j, n_tiles - 1), 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(iters, n_tiles + 1),
        in_specs=[
            pl.BlockSpec((1, 32), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.HBM),  # target planes (2, hp, wp)
            pl.BlockSpec((6, TV, wp), src_map, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((8, 128), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=(
            [pltpu.VMEM((WV, GW), jnp.float32)
             for _ in range(2 * (wp // 128))]            # group windows (2D)
            + [pltpu.VMEM((8, 128), jnp.float32),        # accumulated NEs
               pltpu.VMEM((1, 128), jnp.float32),        # pose (3x4 flat)
               pltpu.SemaphoreType.DMA((wp // 128, 2))]
        ),
    )

    def level(T, tgt_planes, src_planes, term_i, term_d):
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
        params = params.at[0, 28].set(cfg.damping)
        params = params.at[0, 30].set(cfg.convergence_delta ** 2)

        (out,) = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=(jax.ShapeDtypeStruct((8, 128), jnp.float32),),
            interpret=interpret,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=64 * 1024 * 1024),
        )(params, tgt_planes, src_planes)

        row = out[0]
        T_new = jnp.concatenate(
            [row[:12].reshape(3, 4),
             jnp.asarray([[0.0, 0.0, 0.0, 1.0]], jnp.float32)], axis=0)
        return T_new, row[16], row[17], row[18]

    return level


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

        gx, gy = sobel_gradients(i_s)
        gdx, gdy = sobel_gradients(d_s)
        dv = d_s > 0
        okg = (dv & jnp.roll(dv, 1, 0) & jnp.roll(dv, -1, 0)
               & jnp.roll(dv, 1, 1) & jnp.roll(dv, -1, 1))
        gdx = jnp.where(okg, gdx, 0.0)
        gdy = jnp.where(okg, gdy, 0.0)
        # stack THEN pad: one fused copy each, instead of 8 separate
        # pad kernels feeding a concat (measured XLA glue cost, r3)
        h, w = i_s.shape
        src_planes = jnp.pad(jnp.stack([i_s, d_s, gx, gy, gdx, gdy]),
                             ((0, 0), (0, hp - h), (0, wp - w)))
        tgt_planes = jnp.pad(jnp.stack([i_t, d_t]),
                             ((0, 0), (PT, hp + TV - h), (0, wp - w)))

        lvl_fn = _level_fn(intr, cfg, lvl, cfg.pyramid_iters[lvl], interpret)
        T, fitness, rmse, n_valid = lvl_fn(T, tgt_planes, src_planes,
                                           term_i, term_d)

    return OdometryResult(T_target_source=T, fitness=fitness, rmse=rmse,
                          inliers=n_valid.astype(jnp.int32))
