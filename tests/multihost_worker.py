"""Worker for the two-process fake-cluster test (`test_multihost.py`).

Spawned twice with JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES /
JAX_PROCESS_ID set; each process exposes 2 virtual CPU devices so the
global mesh spans 2 hosts x 2 devices — the same topology shape as the
reference's multi-node DDP (`reference main.py:274,281`), with the DCN leg
exercised by the cross-process psum.
"""

import os
import sys

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=2"
)
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax import shard_map  # noqa: E402
from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: E402

from equihgnn_tpu.parallel.mesh import (  # noqa: E402
    get_data_mesh,
    local_batch_indices,
    maybe_init_distributed,
)


def main():
    assert maybe_init_distributed(), "env-driven jax.distributed.initialize failed"
    assert jax.process_count() == 2, jax.process_count()
    assert jax.device_count() == 4, jax.device_count()
    assert jax.local_device_count() == 2

    # host-side data split is a disjoint cover (DistributedSampler equivalent)
    mine = set(local_batch_indices(10).tolist())
    if jax.process_index() == 0:
        assert mine == {0, 1, 2, 3, 4}
    else:
        assert mine == {5, 6, 7, 8, 9}

    mesh = get_data_mesh()
    assert mesh.devices.size == 4

    # the trainer's DP pattern (train/trainer.py:155-171): per-device
    # microbatch in, grads psum'd over the 'data' axis, replicated update
    rng = np.random.default_rng(0)
    X = rng.normal(size=(4, 8, 16)).astype(np.float32)
    Y = rng.normal(size=(4, 8)).astype(np.float32)
    w0 = np.zeros((16,), np.float32)

    pid = jax.process_index()
    shard = lambda a: jax.make_array_from_process_local_data(
        NamedSharding(mesh, P("data")), a[2 * pid : 2 * pid + 2], a.shape
    )
    gx, gy = shard(X), shard(Y)

    def body(w, x, y):
        x, y = x[0], y[0]

        def loss(w):
            r = x @ w - y
            return jnp.sum(r * r)

        g = jax.lax.psum(jax.grad(loss)(w), "data")
        return w - 0.01 * g

    step = jax.jit(
        shard_map(
            body,
            mesh=mesh,
            in_specs=(P(), P("data"), P("data")),
            out_specs=P(),
            check_vma=False,
        )
    )
    w1 = np.asarray(jax.device_get(step(jnp.asarray(w0), gx, gy)))

    # reference: full-batch gradient on one host
    g_ref = sum(
        2.0 * X[d].T @ (X[d] @ w0 - Y[d]) for d in range(4)
    )
    np.testing.assert_allclose(w1, w0 - 0.01 * g_ref, rtol=2e-5, atol=1e-6)
    print(f"MULTIHOST_OK process={pid}", flush=True)


if __name__ == "__main__":
    sys.exit(main())
