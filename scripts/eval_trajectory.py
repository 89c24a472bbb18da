#!/usr/bin/env python
"""Score an estimated camera trajectory against ground truth (ATE / RPE).

The reference saves trajectories (GoodColorReconstruction.py:548-559) but
has no way to QUANTIFY them — tracking quality is judged by watching the
live window. This CLI closes that loop with the two standard TUM RGB-D
measures (utils/evaluation): ATE (global drift after rigid alignment) and
RPE (local per-step error).

Files are the framework's trajectory format (viz/savers.ResultSaver: one
flattened 4x4 per line). Synthetic runs save ground truth next to the
estimate (live_mono.py --source synthetic writes latest_gt_trajectory.txt),
so a full accuracy check is:

    python scripts/live_mono.py --source synthetic --frames 60 --headless
    python scripts/eval_trajectory.py results/latest_trajectory.txt \\
                                      results/latest_gt_trajectory.txt
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("estimate", help="estimated trajectory txt (ResultSaver)")
    ap.add_argument("ground_truth", help="ground-truth trajectory txt")
    ap.add_argument("--delta", type=int, default=1,
                    help="RPE frame gap (default 1 = per-step error)")
    ap.add_argument("--no-align", action="store_true",
                    help="skip the rigid ATE alignment (compare in the "
                         "shared world frame directly)")
    ap.add_argument("--json", action="store_true",
                    help="print one machine-readable JSON line instead")
    args = ap.parse_args()

    from azurekinect3dreconstruction_tpu.utils.evaluation import ate, rpe
    from azurekinect3dreconstruction_tpu.viz.savers import ResultSaver

    est = ResultSaver.load_trajectory(args.estimate)
    gt = ResultSaver.load_trajectory(args.ground_truth)
    if len(est) != len(gt):
        sys.exit(f"trajectory lengths differ: estimate {len(est)} vs "
                 f"ground truth {len(gt)} poses")

    a = ate(est, gt, align=not args.no_align)
    r = rpe(est, gt, delta=args.delta)
    if args.json:
        print(json.dumps({"n_poses": len(est),
                          "ate_rmse_m": a["rmse"],
                          "ate_mean_m": a["mean"],
                          "ate_median_m": a["median"],
                          "ate_max_m": a["max"],
                          "final_drift_m": a["final_drift"],
                          "rpe_delta": args.delta,
                          "rpe_trans_rmse_m": r["trans_rmse"],
                          "rpe_rot_rmse_deg": float(
                              np.degrees(r["rot_rmse"]))}))
        return
    print(f"poses:        {len(est)}")
    print(f"ATE rmse:     {a['rmse'] * 1000:8.2f} mm"
          f"   (mean {a['mean'] * 1000:.2f}, median {a['median'] * 1000:.2f},"
          f" max {a['max'] * 1000:.2f})")
    print(f"final drift:  {a['final_drift'] * 1000:8.2f} mm  (unaligned, "
          f"last pose)")
    print(f"RPE (d={args.delta}):    {r['trans_rmse'] * 1000:8.2f} mm  "
          f"{np.degrees(r['rot_rmse']):.4f} deg  per step")


if __name__ == "__main__":
    main()
