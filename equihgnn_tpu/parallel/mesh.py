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


def get_data_mesh(num_devices: int | None = None, axis: str = "data") -> Mesh:
    devs = jax.devices()
    if num_devices is not None:
        devs = devs[:num_devices]
    return Mesh(np.array(devs), (axis,))


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
