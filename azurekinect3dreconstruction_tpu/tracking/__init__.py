from azurekinect3dreconstruction_tpu.tracking.features import compute_fpfh
from azurekinect3dreconstruction_tpu.tracking.icp import (
    ICPResult,
    TargetMaps,
    colored_icp,
    evaluate_registration,
    icp_grid,
    icp_point_to_plane,
    icp_projective,
)
from azurekinect3dreconstruction_tpu.tracking.motion import MotionModel
from azurekinect3dreconstruction_tpu.tracking.odometry import (
    OdometryResult,
    compute_odometry,
    compute_odometry_frames,
)
from azurekinect3dreconstruction_tpu.tracking.posegraph import (
    PoseGraph,
    PoseGraphEdge,
    find_loop_closures,
    optimize,
)
from azurekinect3dreconstruction_tpu.tracking.ransac import (
    RANSACResult,
    global_registration,
    match_features,
    ransac_registration,
)
