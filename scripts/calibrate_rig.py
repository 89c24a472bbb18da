#!/usr/bin/env python
"""Checkerboard rig calibration: N board views per camera -> per-camera
Zhang/LM intrinsics -> stereo extrinsic -> rig JSON (serial-validated).

Entry-point parity: reference azure-kinect-DK/Reconstruction/
InitialReconstruction-CUDA-2cam:306-487 (capture board views, calibrate
each camera, stereoCalibrate the pair) and :542-623 (calibration JSON saved
per rig with device serials; loading auto-picks the newest matching file).
`dual_fusion.py --rig-calib <dir>` consumes the output.

Sources:
  synthetic      rendered board views with a known ground-truth baseline
                 (no hardware; validates the whole flow end-to-end)
  replay:<dir>   image pairs cam0_XX.npy / cam1_XX.npy saved earlier
  k4a            two live Azure Kinects; grabs a view every --interval
                 frames while you move the board (pyk4a required)
"""

import argparse
import glob
import os
import sys

import numpy as np

from common import apply_backend_overrides

from azurekinect3dreconstruction_tpu.calib.checkerboard import (
    calibrate_intrinsics,
    calibrate_stereo,
    render_board_view,
)
from azurekinect3dreconstruction_tpu.calib.extrinsics import RigCalibration
from azurekinect3dreconstruction_tpu.utils.telemetry import log_error, log_info


def synthetic_views(args):
    """Board-view pairs from a simulated rig: camera 1 sits 10 cm right of
    camera 0 with a slight toe-in (the reference author's simulated-camera
    idea, CreateMesh.py:548-551, applied to calibration)."""
    import jax.numpy as jnp

    from azurekinect3dreconstruction_tpu.core import se3

    K = np.array([[520.0, 0, 320], [0, 520, 240], [0, 0, 1]])
    T10 = np.asarray(se3.se3_exp(jnp.asarray(
        [0.10, 0.01, 0.0, 0.0, 0.08, 0.0], jnp.float32)), np.float64)
    rng = np.random.RandomState(args.seed)
    views0, views1 = [], []
    for i in range(args.views):
        xi = np.concatenate([
            [0.04 * i - 0.15, 0.015 * i - 0.06, 0.55 + 0.04 * i],
            rng.uniform(-0.22, 0.22, 3)])
        T_b0 = np.asarray(se3.se3_exp(jnp.asarray(xi, jnp.float32)), np.float64)
        views0.append(render_board_view(K, T_b0, args.pattern, args.square))
        views1.append(render_board_view(K, np.linalg.inv(T10) @ T_b0,
                                        args.pattern, args.square))
    return views0, views1, ["SYNTH0", "SYNTH1"], T10


def replay_views(args, directory):
    views0, views1 = [], []
    for f0 in sorted(glob.glob(os.path.join(directory, "cam0_*.npy"))):
        f1 = f0.replace("cam0_", "cam1_")
        if os.path.exists(f1):
            views0.append(np.load(f0))
            views1.append(np.load(f1))
    serials = ["REPLAY0", "REPLAY1"]
    sfile = os.path.join(directory, "serials.txt")
    if os.path.exists(sfile):
        serials = open(sfile).read().split()
    return views0, views1, serials, None


def k4a_views(args):
    from azurekinect3dreconstruction_tpu.io.k4a_live import (
        K4ALiveSource,
        detect_cameras,
    )
    from azurekinect3dreconstruction_tpu.io.streams import MultiCameraRig

    ids = detect_cameras()
    if len(ids) < 2:
        raise SystemExit("need two Azure Kinect devices for --source k4a")
    sources = [K4ALiveSource(device_id=i) for i in ids[:2]]
    serials = [s.serial for s in sources]
    rig = MultiCameraRig([s.capture for s in sources])
    rig.start()
    rig.install_sigint_handler()
    views0, views1 = [], []
    try:
        n = 0
        log_info(f"capturing {args.views} board views, one every "
                 f"{args.interval} frames — move the board between views")
        while len(views0) < args.views:
            frames = rig.get_synchronized_frames()
            if frames is None:
                continue
            n += 1
            if n % args.interval:
                continue
            views0.append(np.asarray(frames[0][1]))  # color images
            views1.append(np.asarray(frames[1][1]))
            log_info(f"view {len(views0)}/{args.views}")
    finally:
        rig.stop()
    return views0, views1, serials, None


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--source", default="synthetic",
                    help="synthetic | replay:<dir> | k4a")
    ap.add_argument("--views", type=int, default=10,
                    help="board views per camera")
    ap.add_argument("--pattern", default="9x6",
                    help="inner-corner grid, e.g. 9x6")
    ap.add_argument("--square", type=float, default=0.025,
                    help="checker square size (m)")
    ap.add_argument("--interval", type=int, default=30,
                    help="k4a: frames between captured views")
    ap.add_argument("--calib-dir", default="calibration",
                    help="output directory for the rig JSON")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU JAX backend")
    args = ap.parse_args()
    apply_backend_overrides(args)
    args.pattern = tuple(int(x) for x in args.pattern.split("x"))

    if args.source == "synthetic":
        views0, views1, serials, T_true = synthetic_views(args)
    elif args.source.startswith("replay:"):
        views0, views1, serials, T_true = replay_views(
            args, args.source.split(":", 1)[1])
    elif args.source.startswith("k4a"):
        views0, views1, serials, T_true = k4a_views(args)
    else:
        log_error(f"unknown source {args.source!r}")
        raise SystemExit(2)
    if len(views0) < 3:
        log_error(f"only {len(views0)} view pairs — need >= 3")
        raise SystemExit(1)

    # per-camera intrinsics (reference :417), then the stereo extrinsic
    # camera-1 -> camera-0 (reference :461-470)
    out0 = calibrate_intrinsics(views0, args.pattern, args.square)
    out1 = calibrate_intrinsics(views1, args.pattern, args.square)
    if out0 is None or out1 is None:
        log_error("intrinsic calibration failed (not enough detected boards)")
        raise SystemExit(1)
    intr0, dist0, rms0 = out0
    intr1, dist1, rms1 = out1
    st = calibrate_stereo(views0, views1, intr0, dist0, intr1, dist1,
                          args.pattern, args.square)
    if st is None:
        log_error("stereo calibration failed")
        raise SystemExit(1)
    T10, rms_st = st

    cal = RigCalibration(serials, [np.eye(4), T10], meta={
        "rms_intrinsics": [rms0, rms1],
        "rms_stereo": rms_st,
        "pattern": list(args.pattern),
        "square_size": args.square,
        "intrinsics": [[intr0.fx, intr0.fy, intr0.cx, intr0.cy],
                       [intr1.fx, intr1.fy, intr1.cx, intr1.cy]],
    })
    path = cal.save(args.calib_dir)

    # round-trip + serial validation, exactly what dual_fusion will do
    loaded = RigCalibration.load_newest(args.calib_dir,
                                        expected_serials=serials)
    assert loaded is not None, "saved calibration failed to reload"
    log_info(f"baseline {np.linalg.norm(T10[:3, 3]):.4f} m, "
             f"stereo rms {rms_st:.3f} px -> {path}")
    if T_true is not None:
        err = np.linalg.norm(T10[:3, 3] - T_true[:3, 3])
        log_info(f"synthetic ground-truth baseline error: {err * 1000:.1f} mm")
        if err > 0.05:
            log_error("calibration error exceeds 5 cm on synthetic data")
            raise SystemExit(1)


if __name__ == "__main__":
    main()
