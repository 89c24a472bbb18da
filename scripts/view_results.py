#!/usr/bin/env python
"""Offline result browsers.

Entry-point parity for three reference viewers:
  --mode choose  : ChooseReconstruction.py (list results, pick, view)
  --mode latest  : LastReconstructionVisualizer.py (newest .ply)
  --mode mesh    : MeshReconstructionVisualizer.py (newest mesh .ply/.obj)
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


from azurekinect3dreconstruction_tpu.utils.telemetry import log_info, log_warning
from azurekinect3dreconstruction_tpu.viz.browsers import (
    ReconstructionBrowser,
    load_latest_mesh,
    load_latest_reconstruction,
)
from azurekinect3dreconstruction_tpu.viz.o3d_bridge import view_geometry


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--mode", choices=["choose", "latest", "mesh"], default="latest")
    ap.add_argument("--dir", default="results")
    ap.add_argument("--list-only", action="store_true")
    ap.add_argument("--html", default=None, metavar="OUT.html",
                    help="export the result to a self-contained interactive "
                         "WebGL viewer instead of opening a window "
                         "(viz/html_export.py; works headless)")
    args = ap.parse_args()

    if args.mode == "choose":
        browser = ReconstructionBrowser(args.dir)
        if args.list_only:
            browser.list()
            return
        if not args.html:
            browser.run_interactive()
            return
        # --html in choose mode: prompt for the index, then fall through to
        # the shared export tail instead of opening a window.
        files = browser.list()
        if not files:
            return
        try:
            choice = int(input("export which result? ") or "0")
        except ValueError:
            choice = 0
        if choice >= len(files):
            log_warning("no such result")
            return
        path = files[choice]
    elif args.mode == "latest":
        hit = load_latest_reconstruction(args.dir)
        if hit is None:
            return
        path, kind = hit
        log_info(f"newest result: {path} ({kind})")
    else:
        path = load_latest_mesh(args.dir)
        if path is None:
            log_warning("no mesh results")
            return
        log_info(f"newest mesh: {path}")
    if args.html:
        from azurekinect3dreconstruction_tpu.core.types import (
            PointCloudHost,
            TriangleMeshHost,
        )
        from azurekinect3dreconstruction_tpu.viz.html_export import (
            save_html_viewer,
        )
        from azurekinect3dreconstruction_tpu.viz.savers import read_geometry

        verts, cols, faces = read_geometry(path)
        geom = (TriangleMeshHost(vertices=verts, triangles=faces,
                                 vertex_colors=cols)
                if faces is not None and len(faces)
                else PointCloudHost(points=verts, colors=cols))
        out = save_html_viewer(args.html, geom,
                               title=os.path.basename(path))
        log_info(f"HTML viewer written: {out}")
        return
    if not args.list_only:
        view_geometry(path)


if __name__ == "__main__":
    main()
