from azurekinect3dreconstruction_tpu.meshing.ball_pivot import (
    ball_pivot,
    ball_pivot_mesh,
)
from azurekinect3dreconstruction_tpu.meshing.poisson import (
    ball_pivot_mesh_from_cloud,
    mesh_with_fallback,
    poisson_mesh_from_cloud,
)
from azurekinect3dreconstruction_tpu.meshing.sampling import sample_points_uniformly
from azurekinect3dreconstruction_tpu.meshing.sdf_mesh import sdf_mesh_from_cloud
