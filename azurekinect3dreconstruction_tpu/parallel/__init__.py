from azurekinect3dreconstruction_tpu.parallel.sharded_volume import (
    create_sharded,
    gather_volume,
    make_mesh,
    make_sharded_step,
)
