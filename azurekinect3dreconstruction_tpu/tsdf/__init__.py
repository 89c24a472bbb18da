from azurekinect3dreconstruction_tpu.tsdf import hash, mc_tables
from azurekinect3dreconstruction_tpu.tsdf.marching_cubes import (
    extract_mesh,
    extract_mesh_arrays,
    weld_vertices,
)
from azurekinect3dreconstruction_tpu.tsdf.volume import (
    TSDFVolume,
    allocate,
    create,
    extract_point_cloud,
    integrate,
    integrate_frame,
    reset,
    sample_tsdf,
)
from azurekinect3dreconstruction_tpu.tsdf.streaming import StreamingTSDF  # noqa: E402 (needs volume/marching_cubes above)
