#!/usr/bin/env python
"""Depth -> point-cloud converter with record/replay tooling.

Entry-point parity: reference CodeThatKindaWorks/Depth2PC.py — live streaming
with per-frame PLY + npz saves, and the offline ``process_frame_file`` /
``process_directory`` npz replay converters (:224-303).
"""

import argparse
import os

import numpy as np

from common import add_common_args, make_source

from azurekinect3dreconstruction_tpu.core.camera import pixel_rays
from azurekinect3dreconstruction_tpu.core.types import PointCloudHost, RGBDFrame
from azurekinect3dreconstruction_tpu.io.replay import FrameRecorder
from azurekinect3dreconstruction_tpu.ops.backproject import backproject_depth
from azurekinect3dreconstruction_tpu.utils.telemetry import log_info
from azurekinect3dreconstruction_tpu.viz.savers import ResultSaver, write_ply_point_cloud


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    add_common_args(ap)
    ap.add_argument("--record", action="store_true",
                    help="also dump npz frame logs (frames/ subdir)")
    ap.add_argument("--save-every", type=int, default=10,
                    help="write a PLY every N frames")
    args = ap.parse_args()

    frames, intr = make_source(args)
    rays = pixel_rays(intr)
    saver = ResultSaver(args.output)
    rec = FrameRecorder(os.path.join(args.output, "frames")) if args.record else None

    for i, (depth, color) in enumerate(frames):
        frame = RGBDFrame.from_raw(depth, color)
        pts = np.asarray(backproject_depth(frame.depth, rays)).reshape(-1, 3)
        cols = np.asarray(frame.color).reshape(-1, 3)
        m = pts[:, 2] > 0
        if rec is not None:
            rec.write(depth, color)
        if i % args.save_every == 0:
            path = saver.save_point_cloud(
                PointCloudHost(points=pts[m], colors=cols[m]), kind="cloud")
            log_info(f"frame {i}: {int(m.sum())} points -> {path}")


if __name__ == "__main__":
    main()
