from equihgnn_tpu.ops.pallas.segment_sum import (  # noqa: F401
    sorted_segment_sum,
    sorted_segment_sum_reference,
)
