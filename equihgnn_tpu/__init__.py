"""EquiHGNN-TPU: a TPU-native molecular hypergraph learning framework.

A from-scratch JAX/XLA/Pallas re-design with the capabilities of
HySonLab/EquiHGNN (reference mounted at /root/reference): molecules are
lifted to hypergraphs (atoms = nodes; bonds + conjugated pi-systems =
hyperedges), optionally pre-encoded by a rotation-equivariant 3-D encoder
(EGNN, Equiformer, SE(3)-Transformer, ViSNet, FAFormer), then run through
bipartite hypergraph message passing and regressed to scalar targets.

Design stance (not a port):
  * static-shape padded hypergraph batches (jraph-style) instead of PyG
    ragged collation (`reference equihgnn/data/utils.py:172-178`)
  * `jax.ops.segment_sum` / Pallas segment kernels instead of torch-scatter
  * per-molecule static-k neighborhoods instead of torch-cluster
  * functional `apply(params, batch)` models (flax linen), optax optimizers,
    orbax checkpoints, `shard_map` data parallelism over a device mesh.
"""

__version__ = "0.1.0"

from equihgnn_tpu.common.registry import registry  # noqa: F401

def create_model(name: str, *args, **kwargs):
    """Resolve a registered model name and instantiate it.

    Mirrors `reference equihgnn/utils/create.py:5-11`.
    """
    import equihgnn_tpu.models  # noqa: F401  (triggers registration)

    cls = registry.get_model_class(name)
    if cls is None:
        raise ValueError(f"Unknown model name: {name!r}")
    return cls(*args, **kwargs)


def create_data(name: str, *args, **kwargs):
    """Resolve a registered dataset name and instantiate it.

    Mirrors `reference equihgnn/utils/create.py:13-18`.
    """
    import equihgnn_tpu.data.datasets  # noqa: F401  (triggers registration)

    cls = registry.get_data_class(name)
    if cls is None:
        raise ValueError(f"Unknown dataset name: {name!r}")
    return cls(*args, **kwargs)
