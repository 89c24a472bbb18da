#!/usr/bin/env python
"""Calibration-pattern generator.

Entry-point parity: reference azure-kinect-DK/Reconstruction/
generate_checkerboard.py:5-38 (10x7 board at three print sizes).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import os

import numpy as np

from azurekinect3dreconstruction_tpu.calib.checkerboard import generate_checkerboard
from azurekinect3dreconstruction_tpu.utils.telemetry import log_info


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--cols", type=int, default=10)
    ap.add_argument("--rows", type=int, default=7)
    ap.add_argument("--sizes", type=int, nargs="+", default=[60, 100, 140],
                    help="square sizes in px (one file each)")
    ap.add_argument("--output", default="calibration")
    args = ap.parse_args()

    os.makedirs(args.output, exist_ok=True)
    for s in args.sizes:
        img = generate_checkerboard(args.cols, args.rows, s)
        path = os.path.join(args.output, f"checkerboard_{args.cols}x{args.rows}_{s}px.png")
        try:
            import cv2

            cv2.imwrite(path, img)
        except ImportError:
            path = path.replace(".png", ".npy")
            np.save(path, img)
        log_info(f"wrote {path} ({img.shape[1]}x{img.shape[0]})")


if __name__ == "__main__":
    main()
