"""The universal static-shape molecular (hyper)graph batch.

Replaces PyG's ragged `HData` collation (`reference equihgnn/data/utils.py:150-178`):
the `__inc__` index-offset contract becomes precomputed dense segment-id arrays,
and the per-forward Python `e_batch` loop in every reference model
(`reference equihgnn/models/mhnn.py:59-62` et al.) becomes the precomputed
`hedge_graph_id` field.

Padding convention (jraph-style): a batch holds `num_graphs` slots; the LAST
slot is always a padding graph that absorbs all padded atoms / hyperedges /
incidence entries, so every index array stays in-range and every reduction is
exact after masking. `graph_mask` marks real graphs.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp
import numpy as np
from flax import struct

# OGB-compatible feature vocabularies (reimplemented; the reference gets these
# from `ogb.utils.features` — see `reference equihgnn/data/utils.py:3`).
ATOM_FEATURE_DIMS = (119, 4, 12, 12, 10, 6, 6, 2, 2)
BOND_FEATURE_DIMS = (5, 6, 2)
NUM_ATOM_FEATURES = len(ATOM_FEATURE_DIMS)  # 9
NUM_BOND_FEATURES = len(BOND_FEATURE_DIMS)  # 3
# Hyperedge feature: bond type 0..4 (OGB bond-type vocab) or 5 for a
# conjugated-group hyperedge (`reference equihgnn/data/utils.py:96-103`).
NUM_HEDGE_TYPES = 6
CONJ_HEDGE_TYPE = 5


@dataclass
class HyperGraphSample:
    """One molecule as a hypergraph (host-side, numpy, ragged)."""

    atom_feat: np.ndarray  # [n_atoms, 9] int
    vertex_idx: np.ndarray  # [nnz] int   incidence: which atom
    hedge_idx: np.ndarray  # [nnz] int    incidence: which hyperedge
    hedge_feat: np.ndarray  # [n_hedges] int (bond type / 5=conjugated)
    y: np.ndarray  # [num_targets] float
    pos: np.ndarray | None = None  # [n_atoms, 3] float
    z: np.ndarray | None = None  # [n_atoms] int atomic numbers
    smi: str | None = None

    @property
    def n_atoms(self) -> int:
        return int(self.atom_feat.shape[0])

    @property
    def n_hedges(self) -> int:
        return int(self.hedge_feat.shape[0])

    @property
    def nnz(self) -> int:
        return int(self.vertex_idx.shape[0])

    def e_order(self) -> np.ndarray:
        """Member count per hyperedge (`reference equihgnn/data/utils.py:57-61`)."""
        return np.bincount(self.hedge_idx, minlength=self.n_hedges).astype(np.int32)


@dataclass
class GraphSample:
    """One molecule as a plain directed-both-ways graph (host-side, ragged).

    Mirrors `mol2graph` output (`reference equihgnn/data/utils.py:192-238`).
    """

    atom_feat: np.ndarray  # [n_atoms, 9] int
    edge_src: np.ndarray  # [n_edges] int
    edge_dst: np.ndarray  # [n_edges] int
    edge_feat: np.ndarray  # [n_edges, 3] int
    y: np.ndarray  # [num_targets] float
    pos: np.ndarray | None = None
    z: np.ndarray | None = None
    smi: str | None = None

    @property
    def n_atoms(self) -> int:
        return int(self.atom_feat.shape[0])

    @property
    def n_edges(self) -> int:
        return int(self.edge_src.shape[0])


@struct.dataclass
class HyperGraphBatch:
    """Static-shape padded batch of molecular hypergraphs (device-side pytree)."""

    atom_feat: jnp.ndarray  # [N_pad, 9] int32
    atom_mask: jnp.ndarray  # [N_pad] bool
    atom_graph_id: jnp.ndarray  # [N_pad] int32 (padding → num_graphs - 1)
    vertex_idx: jnp.ndarray  # [nnz_pad] int32 into atoms
    hedge_idx: jnp.ndarray  # [nnz_pad] int32 into hyperedges
    inc_mask: jnp.ndarray  # [nnz_pad] bool
    hedge_feat: jnp.ndarray  # [E_pad] int32
    hedge_mask: jnp.ndarray  # [E_pad] bool
    hedge_graph_id: jnp.ndarray  # [E_pad] int32
    e_order: jnp.ndarray  # [E_pad] int32
    y: jnp.ndarray  # [num_graphs] float32 (single target)
    graph_mask: jnp.ndarray  # [num_graphs] bool
    pos: jnp.ndarray | None = None  # [N_pad, 3] float32
    z: jnp.ndarray | None = None  # [N_pad] int32
    # Dense slot view for geometric encoders: instead of the reference's
    # O(N²) whole-batch pairwise tensors (SURVEY §2.7), kNN and attention run
    # on [R, A_max] row-major layouts — O(R·A²) memory and MXU-batchable.
    # Default: one row per molecule (R = num_graphs). With row packing
    # (`pack_slots=True`), several small molecules share a row and
    # `slot_gid` disambiguates them for neighbor masking (~2× fewer wasted
    # slots on QM9-like size distributions).
    slot_index: jnp.ndarray | None = None  # [R, A_max] int32 flat atom index
    slot_mask: jnp.ndarray | None = None  # [R, A_max] bool
    slot_gid: jnp.ndarray | None = None  # [R, A_max] int32 molecule id (-1 pad)
    atom_slot: jnp.ndarray | None = None  # [N_pad] int32 slot within row
    atom_row: jnp.ndarray | None = None  # [N_pad] int32 row index
    # Dense slot-incidence view (round 3): hyperedges and incidence entries
    # get per-row slots too, so the hypergraph conv's segment scatters become
    # batched one-hot matmuls (XLA TPU scatters run near-serially — PERF.md).
    hedge_row: jnp.ndarray | None = None  # [E_pad] int32 row per hyperedge
    hedge_slot: jnp.ndarray | None = None  # [E_pad] int32 slot within row
    hedge_slot_index: jnp.ndarray | None = None  # [R, He] int32 flat hedge id
    hedge_slot_mask: jnp.ndarray | None = None  # [R, He] bool
    inc_slot_atom: jnp.ndarray | None = None  # [R, Ni] int32 atom slot
    inc_slot_hedge: jnp.ndarray | None = None  # [R, Ni] int32 hedge slot
    inc_slot_mask: jnp.ndarray | None = None  # [R, Ni] bool
    rows_are_molecules: bool = struct.field(pytree_node=False, default=True)

    @property
    def num_atoms(self) -> int:
        return self.atom_feat.shape[-2]

    @property
    def num_hedges(self) -> int:
        return self.hedge_feat.shape[-1]

    @property
    def num_graphs(self) -> int:
        return self.y.shape[-1]

    @property
    def nnz(self) -> int:
        return self.vertex_idx.shape[-1]

    def count_real_graphs(self):
        return jnp.sum(self.graph_mask)


@struct.dataclass
class GraphBatch:
    """Static-shape padded batch of plain molecular graphs (device-side pytree)."""

    atom_feat: jnp.ndarray  # [N_pad, 9] int32
    atom_mask: jnp.ndarray  # [N_pad] bool
    atom_graph_id: jnp.ndarray  # [N_pad] int32
    edge_src: jnp.ndarray  # [M_pad] int32
    edge_dst: jnp.ndarray  # [M_pad] int32
    edge_mask: jnp.ndarray  # [M_pad] bool
    edge_feat: jnp.ndarray  # [M_pad, 3] int32
    y: jnp.ndarray  # [num_graphs] float32
    graph_mask: jnp.ndarray  # [num_graphs] bool
    pos: jnp.ndarray | None = None
    z: jnp.ndarray | None = None
    # dense per-molecule view (present when spec.max_atoms_per_graph > 0):
    # atoms get per-graph slots, edges get per-graph edge slots — the GAT
    # attention then runs as molecule-batched dense softmax (no scatters)
    slot_index: jnp.ndarray | None = None  # [G, A] atom idx per slot
    slot_mask: jnp.ndarray | None = None  # [G, A]
    atom_slot: jnp.ndarray | None = None  # [N] slot within own graph
    eslot_src: jnp.ndarray | None = None  # [G, Me] src atom slot
    eslot_dst: jnp.ndarray | None = None  # [G, Me] dst atom slot
    eslot_edge: jnp.ndarray | None = None  # [G, Me] flat edge index
    eslot_mask: jnp.ndarray | None = None  # [G, Me]

    @property
    def num_atoms(self) -> int:
        return self.atom_feat.shape[-2]

    @property
    def num_graphs(self) -> int:
        return self.y.shape[-1]


def incidence_slots(batch):
    """The dense slot-incidence view as the canonical 11-tuple consumed by
    `nn/hgconv.py`, or None when the batch lacks it (flat segment fallback)."""
    need = (
        batch.slot_index, batch.slot_mask, batch.atom_row, batch.atom_slot,
        batch.hedge_slot_index, batch.hedge_slot_mask, batch.hedge_row,
        batch.hedge_slot, batch.inc_slot_atom, batch.inc_slot_hedge,
        batch.inc_slot_mask,
    )
    return None if any(v is None for v in need) else need
