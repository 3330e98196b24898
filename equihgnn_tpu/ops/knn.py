"""Static-shape k-nearest-neighbor selection for geometric encoders.

TPU-native replacement for `torch_cluster.radius_graph` (used by ViSNet,
`reference equihgnn/models/layers/visnet_layer.py:336-342`) and for the dense
topk neighbor selection done inside EGNN / Equiformer / SE(3)-T / FAFormer
(e.g. `reference equihgnn/models/layers/egnn_layer.py:258-291`). Everything is
fixed-k with masking so shapes stay static under `jit`.

Semantics notes (replicating the reference where it matters):
  * EGNN ranks by **squared** distance and compares `valid_radius` against the
    squared distance (`egnn_layer.py:256,283-285`) — callers opt into that via
    `squared_radius=True`.
  * The reference feeds the whole collated batch to most encoders as a single
    point cloud, so cross-molecule neighbors are possible (SURVEY §2.7). The
    TPU rebuild makes per-molecule neighborhoods explicit by passing
    `graph_id`; pass `graph_id=None` to reproduce the point-cloud behavior.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

BIG = 1e5  # matches the reference's masked-fill value (`egnn_layer.py:262`)


def pairwise_sq_dists(pos_i, pos_j=None):
    """[N, 3] → [N, N] squared Euclidean distances."""
    if pos_j is None:
        pos_j = pos_i
    diff = pos_i[:, None, :] - pos_j[None, :, :]
    return jnp.sum(diff * diff, axis=-1)


def knn_graph(
    pos,
    k: int,
    mask=None,
    graph_id=None,
    valid_radius: float | None = None,
    squared_radius: bool = False,
    exclude_self: bool = False,
):
    """Select the k nearest neighbors of every point.

    Args:
      pos: [N, 3] coordinates (padded rows allowed).
      k: static neighbor count.
      mask: [N] bool validity of each point.
      graph_id: [N] int molecule assignment; neighbors restricted to the same
        molecule when given.
      valid_radius: optional cutoff. Compared against the **squared** distance
        when `squared_radius=True` (EGNN parity), else against the Euclidean
        distance.
      exclude_self: drop the self edge (the reference EGNN keeps it; ViSNet's
        radius_graph drops it).

    Returns:
      (nbr_idx [N, k] int32, nbr_mask [N, k] bool, nbr_sqdist [N, k] float).
    """
    n = pos.shape[0]
    sq = pairwise_sq_dists(pos)
    ranking = sq

    invalid = jnp.zeros((n, n), dtype=bool)
    if mask is not None:
        pair_ok = mask[:, None] & mask[None, :]
        invalid |= ~pair_ok
    if graph_id is not None:
        invalid |= graph_id[:, None] != graph_id[None, :]
    if exclude_self:
        invalid |= jnp.eye(n, dtype=bool)

    ranking = jnp.where(invalid, BIG, ranking)

    # top_k on negative ranking == smallest distances first
    neg_rank, nbr_idx = jax.lax.top_k(-ranking, k)
    nbr_rank = -neg_rank
    nbr_mask = nbr_rank < BIG / 2
    if valid_radius is not None:
        cutoff = valid_radius if squared_radius else valid_radius**2
        nbr_mask &= nbr_rank <= cutoff
    nbr_sqdist = jnp.take_along_axis(sq, nbr_idx, axis=1)
    return nbr_idx.astype(jnp.int32), nbr_mask, nbr_sqdist


def gather_neighbors(values, nbr_idx):
    """values [N, ...] + nbr_idx [N, k] → [N, k, ...]."""
    return values[nbr_idx]


def knn_dense(
    pos_d,  # [R, A, 3] row-major coordinates
    slot_mask,  # [R, A] bool
    k: int,
    valid_radius: float | None = None,
    squared_radius: bool = False,
    exclude_self: bool = False,
    slot_gid=None,  # [R, A] molecule id per slot (packed rows)
):
    """Per-molecule kNN in the dense [R, A] slot layout.

    The TPU-first alternative to whole-batch O(N²) ranking: distances are
    O(R·A²) and every op batches over rows. With packed rows (several
    molecules per row), `slot_gid` restricts neighbors to the same molecule.
    Returns slot-indexed neighbors (idx [R, A, k] into the A axis, mask).
    """
    g, a, _ = pos_d.shape
    k_eff = min(k, a)
    diff = pos_d[:, :, None, :] - pos_d[:, None, :, :]
    sq = jnp.sum(diff * diff, axis=-1)  # [R, A, A]
    invalid = ~(slot_mask[:, :, None] & slot_mask[:, None, :])
    if slot_gid is not None:
        invalid |= slot_gid[:, :, None] != slot_gid[:, None, :]
    if exclude_self:
        invalid |= jnp.eye(a, dtype=bool)[None]
    ranking = jnp.where(invalid, BIG, sq)
    neg_rank, nbr_idx = jax.lax.top_k(-ranking, k_eff)
    nbr_rank = -neg_rank
    nbr_mask = nbr_rank < BIG / 2
    if valid_radius is not None:
        cutoff = valid_radius if squared_radius else valid_radius**2
        nbr_mask &= nbr_rank <= cutoff
    if k_eff < k:  # pad neighbor axis to the static k
        pad = [(0, 0), (0, 0), (0, k - k_eff)]
        nbr_idx = jnp.pad(nbr_idx, pad)
        nbr_mask = jnp.pad(nbr_mask, pad)
        nbr_rank = jnp.pad(nbr_rank, pad, constant_values=BIG)
    return nbr_idx.astype(jnp.int32), nbr_mask, nbr_rank
