from azurekinect3dreconstruction_tpu.utils.telemetry import (
    Telemetry,
    log_error,
    log_info,
    log_warning,
    process_map_count,
    release_jit_maps_if_crowded,
)
