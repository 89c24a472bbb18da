#!/usr/bin/env python
"""Plain live RGB point-cloud viewer.

Entry-point parity: reference CodeThatWorks/Visualizer-base.py (and the
Spanish-commented Visualizer-blue.py): stream frames, backproject, color by
RGB or by XYZ position (colorize_pcd :50-67), window-close detection.
"""

import argparse

import numpy as np

from common import add_common_args, make_source, make_viewer

from azurekinect3dreconstruction_tpu.core.camera import pixel_rays
from azurekinect3dreconstruction_tpu.core.types import PointCloudHost, RGBDFrame
from azurekinect3dreconstruction_tpu.ops.backproject import backproject_depth


def colorize_by_position(pts: np.ndarray) -> np.ndarray:
    """XYZ -> RGB position coloring (reference colorize_pcd)."""
    lo, hi = pts.min(0), pts.max(0)
    return np.clip((pts - lo) / np.maximum(hi - lo, 1e-6), 0, 1).astype(np.float32)


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    add_common_args(ap)
    ap.add_argument("--position-colors", action="store_true")
    args = ap.parse_args()

    frames, intr = make_source(args)
    rays = pixel_rays(intr)
    viewer = make_viewer(args, "live viewer")
    for depth, color in frames:
        frame = RGBDFrame.from_raw(depth, color)
        pts = np.asarray(backproject_depth(frame.depth, rays)).reshape(-1, 3)
        m = pts[:, 2] > 0
        cols = (colorize_by_position(pts[m]) if args.position_colors
                else np.asarray(frame.color).reshape(-1, 3)[m])
        viewer.update_cloud("live", PointCloudHost(points=pts[m], colors=cols))
        if not viewer.tick():
            break
    viewer.close()


if __name__ == "__main__":
    main()
