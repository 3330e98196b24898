"""Device-mesh utilities for data-parallel training.

The reference's only parallelism is Lightning DDP over NCCL
(`reference main.py:274,281`). The TPU-native equivalent: a 1-D
`jax.sharding.Mesh` over all chips, `shard_map`ped train steps with
`psum` gradient reduction riding the ICI, and host-side microbatch
stacking replacing the DistributedSampler.
"""

from __future__ import annotations

from typing import Sequence

import jax
import numpy as np
from jax.sharding import Mesh


def maybe_init_distributed() -> bool:
    """Multi-host wiring (reference DDP is multi-node by construction,
    `reference main.py:281`): call `jax.distributed.initialize` when the
    standard cluster env is present (JAX_COORDINATOR_ADDRESS [+
    JAX_NUM_PROCESSES/JAX_PROCESS_ID], or a TPU-pod metadata environment).
    After it, `jax.devices()` is GLOBAL and the 1-D data mesh below spans
    hosts — gradients psum over ICI within a slice and DCN across slices.

    Exercised by `tests/test_multihost.py`: two spawned processes form a
    real 2-process CPU cluster through this function (coordinator on
    localhost, 2 virtual devices per process) and run a shard_map DP step
    with a cross-process grad psum. Real multi-slice TPU hardware is still
    unavailable in this image (DECISIONS.md).
    """
    import os

    if os.environ.get("EQUIHGNN_TPU_NO_DISTRIBUTED"):
        return False
    coord = os.environ.get("JAX_COORDINATOR_ADDRESS")
    if not coord:
        return False
    try:
        jax.distributed.initialize(
            coordinator_address=coord,
            num_processes=int(os.environ["JAX_NUM_PROCESSES"])
            if "JAX_NUM_PROCESSES" in os.environ
            else None,
            process_id=int(os.environ["JAX_PROCESS_ID"])
            if "JAX_PROCESS_ID" in os.environ
            else None,
        )
        return True
    except Exception as e:  # pragma: no cover - cluster-only path
        print(f"[mesh] jax.distributed.initialize failed: {e}")
        return False


def get_data_mesh(num_devices: int | None = None, axis: str = "data") -> Mesh:
    devs = jax.devices()
    if num_devices is not None:
        devs = devs[:num_devices]
    return Mesh(np.array(devs), (axis,))


def local_batch_indices(n: int) -> np.ndarray:
    """Host-sharded data selection: each process loads its contiguous 1/P of
    the dataset (replaces the reference's DistributedSampler)."""
    p, pid = jax.process_count(), jax.process_index()
    per = (n + p - 1) // p
    return np.arange(pid * per, min((pid + 1) * per, n))


def stack_microbatches(batches: Sequence):
    """Stack per-device padded batches into one [ndev, ...] pytree."""
    return jax.tree.map(lambda *xs: np.stack(xs, axis=0), *batches)


def group_for_devices(batch_iter, ndev: int, make_empty=None):
    """Group a stream of padded batches into [ndev, ...] stacks.

    Tail groups are padded with all-padding-graph batches (zero contribution
    to the masked loss/metrics). Groups are formed per static shape, so
    bucketed loaders (several specs per epoch) work: a shape change flushes
    the open group.
    """
    from equihgnn_tpu.data.batching import empty_like

    def flush(group):
        while len(group) < ndev:
            group.append(empty_like(group[-1]) if make_empty is None
                         else make_empty())
        return stack_microbatches(group)

    group = []
    shape_of = lambda b: jax.tree.map(lambda x: getattr(x, "shape", None), b)
    sig = None
    for b in batch_iter:
        s = shape_of(b)
        if group and s != sig:
            yield flush(group)
            group = []
        sig = s
        group.append(b)
        if len(group) == ndev:
            yield stack_microbatches(group)
            group = []
    if group:
        yield flush(group)
