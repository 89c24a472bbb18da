from azurekinect3dreconstruction_tpu.ops.backproject import (
    backproject_depth,
    backproject_intrinsics,
    bilinear_sample,
    flatten_organized,
    nearest_sample,
    project_points,
)
from azurekinect3dreconstruction_tpu.ops.depth_to_color import transformed_depth
from azurekinect3dreconstruction_tpu.ops.image import (
    bgra_to_rgb,
    build_pyramid,
    depth_gradient_colors,
    downsample2,
    flip_ud,
    rgb_to_intensity,
    sobel_gradients,
)
from azurekinect3dreconstruction_tpu.ops.neighbors import (
    build_cell_lists,
    estimate_normals_knn,
    knn,
    knn_gather,
    remove_statistical_outliers,
    voxel_downsample_arrays,
)
from azurekinect3dreconstruction_tpu.ops.normals import organized_normals, pca_normal
