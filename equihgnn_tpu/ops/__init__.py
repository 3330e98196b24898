from equihgnn_tpu.ops.segment import (  # noqa: F401
    segment_sum,
    segment_mean,
    segment_max,
    segment_softmax,
    masked_segment_reduce,
)
from equihgnn_tpu.ops.knn import knn_graph, pairwise_sq_dists  # noqa: F401
