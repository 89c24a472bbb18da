from azurekinect3dreconstruction_tpu.calib.checkerboard import (
    calibrate_intrinsics,
    calibrate_stereo,
    find_corners,
    generate_checkerboard,
)
from azurekinect3dreconstruction_tpu.calib.extrinsics import RigCalibration
