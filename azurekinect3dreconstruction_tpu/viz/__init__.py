from azurekinect3dreconstruction_tpu.viz.browsers import (
    ReconstructionBrowser,
    list_results,
    load_latest_mesh,
    load_latest_reconstruction,
)
from azurekinect3dreconstruction_tpu.viz.html_export import save_html_viewer
from azurekinect3dreconstruction_tpu.viz.live_server import (
    BrowserLiveViewer,
    LiveViewerServer,
)
from azurekinect3dreconstruction_tpu.viz.o3d_bridge import LiveViewer, view_geometry
from azurekinect3dreconstruction_tpu.viz.savers import (
    ResultSaver,
    read_geometry,
    read_obj,
    read_ply,
    write_obj_mesh,
    write_ply_mesh,
    write_ply_point_cloud,
)
