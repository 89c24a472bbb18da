"""Alias package: the framework's "model families" are its reconstruction
pipelines (mono odometry+TSDF, colored-ICP recorder, dual-camera fusion,
offline bundle, fragments). Re-exported here for discoverability."""
from azurekinect3dreconstruction_tpu.pipelines import *  # noqa: F401,F403
