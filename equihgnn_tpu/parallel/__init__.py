from equihgnn_tpu.parallel.mesh import (  # noqa: F401
    get_data_mesh,
    stack_microbatches,
    group_for_devices,
)
