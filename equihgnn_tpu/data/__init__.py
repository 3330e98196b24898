from equihgnn_tpu.data.structures import (  # noqa: F401
    HyperGraphBatch,
    GraphBatch,
    HyperGraphSample,
    GraphSample,
)
from equihgnn_tpu.data.batching import (  # noqa: F401
    BatchSpec,
    pad_hypergraph_batch,
    pad_graph_batch,
    spec_for_samples,
)
