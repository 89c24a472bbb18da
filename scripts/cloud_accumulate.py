#!/usr/bin/env python
"""Point-cloud accumulation reconstructor (no TSDF).

Entry-point parity: reference azure-kinect-DK/Reconstruction/Reconstruction.py
(and Reconstruction-ResourceEfficient.py) — keyframe-interval frame-to-frame
registration (FPFH+RANSAC coarse stage + point-to-plane ICP), the global
model grown by merge + periodic re-downsample, and on save a normal-oriented
colored cloud (plus an optional host Poisson mesh with color transfer,
Reconstruction.py:227-267).
"""

import argparse
import dataclasses

from common import add_common_args, make_source, make_viewer

from azurekinect3dreconstruction_tpu.config import PipelineConfig
from azurekinect3dreconstruction_tpu.core.types import PointCloudHost
from azurekinect3dreconstruction_tpu.pipelines import CloudAccumulator
from azurekinect3dreconstruction_tpu.utils.telemetry import log_info


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    add_common_args(ap)
    ap.add_argument("--keyframe-interval", type=int, default=None,
                    help="register every N frames (default: config's 10, "
                         "reference GoodColorReconstruction.py:57)")
    ap.add_argument("--no-coarse", action="store_true",
                    help="skip the FPFH+RANSAC bootstrap entirely (smooth "
                         "dense streams where projective ICP suffices)")
    ap.add_argument("--poisson", action="store_true",
                    help="also save a Poisson mesh with transferred colors "
                         "on exit (requires the optional open3d host dep)")
    args = ap.parse_args()

    frames, intr = make_source(args)
    cfg = PipelineConfig()
    if args.keyframe_interval:
        cfg = dataclasses.replace(cfg,
                                  keyframe_interval=args.keyframe_interval)
    pipe = CloudAccumulator(intr, cfg, output_dir=args.output,
                            coarse=not args.no_coarse)
    viewer = make_viewer(args, "cloud accumulation")
    viewer.register_key("S", pipe.save_model, "save model cloud")

    for i, (depth, color) in enumerate(frames):
        pipe.process_frame(depth, color)
        if (i % cfg.vis_update_interval == 0 and not viewer.headless
                and len(pipe.model_points)):
            viewer.update_cloud("model", PointCloudHost(
                points=pipe.model_points, colors=pipe.model_colors))
        if not viewer.tick():
            break
    paths = pipe.save_model(poisson=args.poisson)
    log_info(f"saved model: {', '.join(sorted(paths))} "
             f"({pipe.model_points.shape[0]} points)")
    viewer.close()


if __name__ == "__main__":
    main()
