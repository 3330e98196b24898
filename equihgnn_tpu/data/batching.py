"""Padding / packing of ragged molecule samples into static-shape batches.

This is the TPU replacement for the PyG DataLoader + `HData.__inc__` offset
collation (`reference equihgnn/data/utils.py:172-178`) and for the per-forward
Python `e_batch` loop (`reference equihgnn/models/mhnn.py:59-62`): graph
assignment vectors are precomputed here, on the host, once per batch.

A `BatchSpec` fixes (num_graphs, N_pad, E_pad, nnz_pad) so every batch of a
loader compiles exactly once. The LAST graph slot is reserved as the padding
graph (jraph convention): padded atoms/hyperedges/incidence all point into it.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Iterable, Iterator, Sequence

import numpy as np

from equihgnn_tpu.data.structures import (
    GraphBatch,
    GraphSample,
    HyperGraphBatch,
    HyperGraphSample,
    NUM_ATOM_FEATURES,
    NUM_BOND_FEATURES,
)


@dataclass(frozen=True)
class BatchSpec:
    """Static capacities of a padded batch (all compile-time constants)."""

    num_graphs: int  # including the reserved padding graph
    num_atoms: int
    num_hedges: int  # hyperedge slots (hypergraph) / edge slots (graph)
    nnz: int  # incidence entries (hypergraph only)
    max_atoms_per_graph: int = 0  # A_max for the dense slot view
    num_slot_rows: int = 0  # static row count for packed slot view (0 = G rows)
    # per-row capacities for the dense slot-incidence view (0 = disabled).
    # Rigorous bounds: a row holds ≤ A_max atoms, and per molecule
    # hedges ≤ atoms·max(hedges/atoms), nnz ≤ atoms·max(nnz/atoms).
    num_hedge_slots: int = 0
    num_inc_slots: int = 0

    @property
    def max_real_graphs(self) -> int:
        return self.num_graphs - 1


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def spec_for_samples(
    samples: Sequence[HyperGraphSample | GraphSample],
    batch_size: int,
    atom_multiple: int = 8,
    headroom: float = 1.05,
) -> BatchSpec:
    """Derive a safe static spec from dataset statistics.

    Capacities are sized so that `batch_size` average molecules fit with
    `headroom`, but never below `batch_size` * max-single-molecule for atoms
    (a single molecule must always fit).
    """
    n_atoms = np.array([s.n_atoms for s in samples])
    if hasattr(samples[0], "nnz"):
        n_edge = np.array([s.n_hedges for s in samples])
        nnz = np.array([s.nnz for s in samples])
    else:
        n_edge = np.array([s.n_edges for s in samples])
        nnz = n_edge
    mean_atoms = float(n_atoms.mean())
    cap = lambda arr, mean: _round_up(
        max(int(batch_size * mean * headroom), int(arr.max()) + 1), atom_multiple
    )
    a_max = _round_up(int(n_atoms.max()), atom_multiple)
    num_atoms = cap(n_atoms, mean_atoms)
    return BatchSpec(
        num_graphs=batch_size + 1,
        num_atoms=num_atoms,
        num_hedges=cap(n_edge, float(n_edge.mean())),
        nnz=cap(nnz, float(nnz.mean())),
        max_atoms_per_graph=a_max,
        # FFD bin packing is within 11/9·OPT + 1 of optimal; OPT ≥ atoms/A.
        # On near-uniform molecule sizes FFD lands within a few % of OPT, so
        # 1.15 headroom suffices — every all-padding row costs HBM in every
        # dense [R, A, ...] encoder tensor.
        # rounded to a multiple of 4: the vis_mix kernels block rows in
                # fours; an unaligned R pad-copies every kernel operand
                num_slot_rows=-(-(int(num_atoms / a_max * 1.15) + 3) // 4) * 4,
        num_hedge_slots=int(np.ceil(a_max * float((n_edge / np.maximum(n_atoms, 1)).max()))) + 1,
        num_inc_slots=int(np.ceil(a_max * float((nnz / np.maximum(n_atoms, 1)).max()))) + 1,
    )


def pad_hypergraph_batch(
    samples: Sequence[HyperGraphSample],
    spec: BatchSpec,
    target: int | None = None,
    with_pos: bool = False,
    pack_slots: bool = False,
) -> HyperGraphBatch:
    """Pack molecules into one padded `HyperGraphBatch` (host-side numpy).

    `target` selects a single column of `y` (the `OneTarget` transform,
    `reference equihgnn/data/utils.py:181-189`); pass None if `y` is already
    scalar per molecule.
    """
    assert len(samples) <= spec.max_real_graphs, (
        f"{len(samples)} molecules > spec capacity {spec.max_real_graphs}"
    )
    G, N, E, Z = spec.num_graphs, spec.num_atoms, spec.num_hedges, spec.nnz
    pad_gid = G - 1

    atom_feat = np.zeros((N, NUM_ATOM_FEATURES), dtype=np.int32)
    atom_mask = np.zeros((N,), dtype=bool)
    atom_graph_id = np.full((N,), pad_gid, dtype=np.int32)
    vertex_idx = np.full((Z,), N - 1, dtype=np.int32)
    hedge_idx = np.full((Z,), E - 1, dtype=np.int32)
    inc_mask = np.zeros((Z,), dtype=bool)
    hedge_feat = np.zeros((E,), dtype=np.int32)
    hedge_mask = np.zeros((E,), dtype=bool)
    hedge_graph_id = np.full((E,), pad_gid, dtype=np.int32)
    e_order = np.zeros((E,), dtype=np.int32)
    y = np.zeros((G,), dtype=np.float32)
    graph_mask = np.zeros((G,), dtype=bool)
    pos = np.zeros((N, 3), dtype=np.float32) if with_pos else None
    z = np.zeros((N,), dtype=np.int32) if with_pos else None
    A = spec.max_atoms_per_graph
    if A and pack_slots:
        if not spec.num_slot_rows:
            raise ValueError("pack_slots=True needs spec.num_slot_rows > 0")
        n_rows = spec.num_slot_rows
        # first-fit-decreasing row assignment (independent of flat layout)
        row_of = np.zeros(len(samples), dtype=np.int64)
        start_of = np.zeros(len(samples), dtype=np.int64)
        row_fill = np.zeros(n_rows, dtype=np.int64)
        for g in sorted(range(len(samples)), key=lambda i: -samples[i].n_atoms):
            na = samples[g].n_atoms
            fits = np.where(row_fill + na <= A)[0]
            if len(fits) == 0:
                raise ValueError(
                    f"row packing overflow: {len(samples)} molecules need more "
                    f"than {n_rows} rows of {A} slots"
                )
            row_of[g] = fits[0]
            start_of[g] = row_fill[fits[0]]
            row_fill[fits[0]] += na
    else:
        n_rows = G
    slot_index = np.zeros((n_rows, A), dtype=np.int32) if A else None
    slot_mask = np.zeros((n_rows, A), dtype=bool) if A else None
    slot_gid = np.full((n_rows, A), -1, dtype=np.int32) if A else None
    # padded atoms point at the padding row (matches the native packer, which
    # leaves them at atom_graph_id = pad_gid); never at molecule 0's slots
    atom_slot = np.zeros((N,), dtype=np.int32) if A else None
    atom_row = np.full((N,), n_rows - 1, dtype=np.int32) if A else None

    a0 = e0 = z0 = 0
    for g, s in enumerate(samples):
        na, ne, nz = s.n_atoms, s.n_hedges, s.nnz
        if a0 + na > N or e0 + ne > E or z0 + nz > Z:
            raise ValueError(
                f"Batch overflows spec {spec}: graph {g} needs "
                f"(+{na} atoms, +{ne} hedges, +{nz} nnz) at offsets ({a0},{e0},{z0})"
            )
        atom_feat[a0 : a0 + na] = s.atom_feat
        atom_mask[a0 : a0 + na] = True
        atom_graph_id[a0 : a0 + na] = g
        if A:
            if na > A:
                raise ValueError(f"Molecule with {na} atoms exceeds A_max={A}")
            if pack_slots:
                row, s0 = int(row_of[g]), int(start_of[g])
            else:
                row, s0 = g, 0
            slot_index[row, s0 : s0 + na] = np.arange(a0, a0 + na)
            slot_mask[row, s0 : s0 + na] = True
            slot_gid[row, s0 : s0 + na] = g
            atom_slot[a0 : a0 + na] = np.arange(s0, s0 + na)
            atom_row[a0 : a0 + na] = row
        vertex_idx[z0 : z0 + nz] = s.vertex_idx + a0
        hedge_idx[z0 : z0 + nz] = s.hedge_idx + e0
        inc_mask[z0 : z0 + nz] = True
        hedge_feat[e0 : e0 + ne] = s.hedge_feat
        hedge_mask[e0 : e0 + ne] = True
        hedge_graph_id[e0 : e0 + ne] = g
        e_order[e0 : e0 + ne] = s.e_order()
        yv = s.y if target is None else np.asarray(s.y).reshape(-1)[target]
        y[g] = np.asarray(yv, dtype=np.float32).reshape(())
        graph_mask[g] = True
        if with_pos:
            if s.pos is None:
                raise ValueError("with_pos=True but sample has no coordinates")
            pos[a0 : a0 + na] = s.pos
            if s.z is not None:
                z[a0 : a0 + na] = s.z
        a0, e0, z0 = a0 + na, e0 + ne, z0 + nz

    tables = (
        incidence_slot_tables(
            spec, n_rows, slot_gid, atom_slot, vertex_idx, hedge_idx,
            inc_mask, hedge_graph_id, hedge_mask,
        )
        if A
        else None
    )
    return HyperGraphBatch(
        atom_feat=atom_feat,
        atom_mask=atom_mask,
        atom_graph_id=atom_graph_id,
        vertex_idx=vertex_idx,
        hedge_idx=hedge_idx,
        inc_mask=inc_mask,
        hedge_feat=hedge_feat,
        hedge_mask=hedge_mask,
        hedge_graph_id=hedge_graph_id,
        e_order=e_order,
        y=y,
        graph_mask=graph_mask,
        pos=pos,
        z=z,
        slot_index=slot_index,
        slot_mask=slot_mask,
        slot_gid=slot_gid,
        atom_slot=atom_slot,
        atom_row=atom_row,
        rows_are_molecules=not pack_slots,
        **(tables or {}),
    )



def _cumcount_by_row(rows):
    """Positions 0..k-1 within each row group, preserving input order."""
    order = np.argsort(rows, kind="stable")
    sr = rows[order]
    n = len(sr)
    if n == 0:
        return np.zeros(0, np.int32), order
    starts = np.r_[0, np.nonzero(np.diff(sr))[0] + 1]
    lengths = np.diff(np.r_[starts, n])
    pos = np.arange(n) - np.repeat(starts, lengths)
    out = np.empty(n, np.int64)
    out[order] = pos
    return out.astype(np.int32), order


def incidence_slot_tables(
    spec: BatchSpec,
    n_rows: int,
    slot_gid,
    atom_slot,
    vertex_idx,
    hedge_idx,
    inc_mask,
    hedge_graph_id,
    hedge_mask,
):
    """Derive the dense slot-incidence view from a flat assembled batch.

    Hyperedges and incidence entries are assigned per-row slots (flat order
    within each row); the hypergraph conv then runs its gathers/scatters as
    batched [Ni, A]/[Ni, He] one-hot matmuls instead of XLA segment scatters.
    Returns a dict of arrays, or None when the spec has no capacities or a
    row overflows them (callers fall back to the flat segment path).
    """
    He, Ni = spec.num_hedge_slots, spec.num_inc_slots
    if not He or not Ni:
        return None
    E, Z = len(hedge_mask), len(inc_mask)

    row_of_graph = np.full(spec.num_graphs, n_rows - 1, np.int32)
    rr, ss = np.nonzero(slot_gid >= 0)
    row_of_graph[slot_gid[rr, ss]] = rr

    hedge_row = np.where(
        hedge_mask, row_of_graph[hedge_graph_id], n_rows - 1
    ).astype(np.int32)
    hedge_slot = np.zeros(E, np.int32)
    hv = np.nonzero(hedge_mask)[0]
    pos, _ = _cumcount_by_row(hedge_row[hv])
    if len(pos) and pos.max() >= He:
        return None
    hedge_slot[hv] = pos
    hedge_slot_index = np.zeros((n_rows, He), np.int32)
    hedge_slot_mask = np.zeros((n_rows, He), bool)
    hedge_slot_index[hedge_row[hv], pos] = hv
    hedge_slot_mask[hedge_row[hv], pos] = True

    zv = np.nonzero(inc_mask)[0]
    inc_row = hedge_row[hedge_idx[zv]]
    zpos, _ = _cumcount_by_row(inc_row)
    if len(zpos) and zpos.max() >= Ni:
        return None
    inc_slot_atom = np.zeros((n_rows, Ni), np.int32)
    inc_slot_hedge = np.zeros((n_rows, Ni), np.int32)
    inc_slot_mask = np.zeros((n_rows, Ni), bool)
    inc_slot_atom[inc_row, zpos] = atom_slot[vertex_idx[zv]]
    inc_slot_hedge[inc_row, zpos] = hedge_slot[hedge_idx[zv]]
    inc_slot_mask[inc_row, zpos] = True

    return dict(
        hedge_row=hedge_row,
        hedge_slot=hedge_slot,
        hedge_slot_index=hedge_slot_index,
        hedge_slot_mask=hedge_slot_mask,
        inc_slot_atom=inc_slot_atom,
        inc_slot_hedge=inc_slot_hedge,
        inc_slot_mask=inc_slot_mask,
    )


def pad_graph_batch(
    samples: Sequence[GraphSample],
    spec: BatchSpec,
    target: int | None = None,
    with_pos: bool = False,
    edge_feat_width: int | None = None,
) -> GraphBatch:
    """Pack plain molecular graphs into one padded `GraphBatch`."""
    assert len(samples) <= spec.max_real_graphs
    G, N, M = spec.num_graphs, spec.num_atoms, spec.num_hedges
    pad_gid = G - 1
    # QM9 graph variants store a 1-dim bond-type feature, mol2graph stores 3
    # (`reference equihgnn/data/qm9.py:309-319` vs `data/utils.py:205-218`)
    ef_width = edge_feat_width or (
        samples[0].edge_feat.shape[1] if samples and samples[0].edge_feat.size
        else NUM_BOND_FEATURES
    )

    atom_feat = np.zeros((N, NUM_ATOM_FEATURES), dtype=np.int32)
    atom_mask = np.zeros((N,), dtype=bool)
    atom_graph_id = np.full((N,), pad_gid, dtype=np.int32)
    edge_src = np.full((M,), N - 1, dtype=np.int32)
    edge_dst = np.full((M,), N - 1, dtype=np.int32)
    edge_mask = np.zeros((M,), dtype=bool)
    edge_feat = np.zeros((M, ef_width), dtype=np.int32)
    y = np.zeros((G,), dtype=np.float32)
    graph_mask = np.zeros((G,), dtype=bool)
    pos = np.zeros((N, 3), dtype=np.float32) if with_pos else None
    z = np.zeros((N,), dtype=np.int32) if with_pos else None
    A, Me = spec.max_atoms_per_graph, spec.num_hedge_slots
    dense = A > 0 and Me > 0
    if dense:
        slot_index = np.zeros((G, A), np.int32)
        slot_mask = np.zeros((G, A), bool)
        atom_slot = np.zeros((N,), np.int32)
        eslot_src = np.zeros((G, Me), np.int32)
        eslot_dst = np.zeros((G, Me), np.int32)
        eslot_edge = np.full((G, Me), M - 1, np.int32)
        eslot_mask = np.zeros((G, Me), bool)

    a0 = m0 = 0
    for g, s in enumerate(samples):
        na, nm = s.n_atoms, s.n_edges
        if a0 + na > N or m0 + nm > M:
            raise ValueError(f"Batch overflows spec {spec} at graph {g}")
        atom_feat[a0 : a0 + na] = s.atom_feat
        atom_mask[a0 : a0 + na] = True
        atom_graph_id[a0 : a0 + na] = g
        edge_src[m0 : m0 + nm] = s.edge_src + a0
        edge_dst[m0 : m0 + nm] = s.edge_dst + a0
        edge_mask[m0 : m0 + nm] = True
        edge_feat[m0 : m0 + nm] = s.edge_feat
        yv = s.y if target is None else np.asarray(s.y).reshape(-1)[target]
        y[g] = np.asarray(yv, dtype=np.float32).reshape(())
        graph_mask[g] = True
        if with_pos:
            if s.pos is None:
                raise ValueError("with_pos=True but sample has no coordinates")
            pos[a0 : a0 + na] = s.pos
            if s.z is not None:
                z[a0 : a0 + na] = s.z
        if dense:
            if na > A or nm > Me:
                raise ValueError(
                    f"Graph {g} overflows dense view ({na}>{A} or {nm}>{Me})"
                )
            slot_index[g, :na] = np.arange(a0, a0 + na)
            slot_mask[g, :na] = True
            atom_slot[a0 : a0 + na] = np.arange(na)
            eslot_src[g, :nm] = s.edge_src
            eslot_dst[g, :nm] = s.edge_dst
            eslot_edge[g, :nm] = np.arange(m0, m0 + nm)
            eslot_mask[g, :nm] = True
        a0, m0 = a0 + na, m0 + nm

    extra = {}
    if dense:
        extra = dict(
            slot_index=slot_index, slot_mask=slot_mask, atom_slot=atom_slot,
            eslot_src=eslot_src, eslot_dst=eslot_dst, eslot_edge=eslot_edge,
            eslot_mask=eslot_mask,
        )
    return GraphBatch(
        atom_feat=atom_feat,
        atom_mask=atom_mask,
        atom_graph_id=atom_graph_id,
        edge_src=edge_src,
        edge_dst=edge_dst,
        edge_mask=edge_mask,
        edge_feat=edge_feat,
        y=y,
        graph_mask=graph_mask,
        pos=pos,
        z=z,
        **extra,
    )


def make_size_buckets(
    samples: Sequence,
    batch_size: int,
    atom_boundaries: Sequence[int] = (16,),
    atom_multiple: int = 8,
    headroom: float = 1.05,
):
    """Split molecules into size buckets with tight per-bucket specs.

    Padding waste in the dense [G, A_max] view is the main throughput loss
    when molecule sizes vary (QM9: 4–29 atoms → ~54% slot utilization with a
    single A_max=32 spec). Bucketing by atom count gives each bucket its own
    (A_max, N, E, nnz) capacities; the compile cost is one program per bucket.

    Returns a list of (indices, BatchSpec).
    """
    n_atoms = np.array([s.n_atoms for s in samples])
    bounds = list(atom_boundaries) + [int(n_atoms.max())]
    buckets = []
    lo = 0
    for hi in bounds:
        sel = np.where((n_atoms > lo) & (n_atoms <= hi))[0]
        if len(sel):
            spec = spec_for_samples(
                [samples[i] for i in sel], batch_size,
                atom_multiple=atom_multiple, headroom=headroom,
            )
            buckets.append((sel, spec))
        lo = hi
    return buckets


def iter_bucketed_batches(
    samples: Sequence,
    buckets,
    *,
    target: int | None = None,
    with_pos: bool = False,
    shuffle: bool = False,
    rng: np.random.Generator | None = None,
):
    """Iterate padded batches over size buckets (batch order interleaved)."""
    rng = rng or np.random.default_rng()
    iters = []
    for sel, spec in buckets:
        idx = sel.copy()
        if shuffle:
            rng.shuffle(idx)
        iters.append(
            iter_batches(
                [samples[i] for i in idx], spec,
                target=target, with_pos=with_pos, shuffle=False,
            )
        )
    batches = [b for it in iters for b in it]
    if shuffle:
        order = rng.permutation(len(batches))
        batches = [batches[i] for i in order]
    yield from batches


def iter_batches(
    samples: Sequence,
    spec: BatchSpec,
    *,
    hyper: bool = True,
    target: int | None = None,
    with_pos: bool = False,
    shuffle: bool = False,
    rng: np.random.Generator | None = None,
    drop_last: bool = False,
    pack_slots: bool = False,
) -> Iterator:
    """Greedy packer: fill each batch until a capacity would overflow.

    Replaces the PyG DataLoader (`reference main.py:227-229`). With shuffle,
    order is re-drawn each epoch from `rng`. `pack_slots` packs several small
    molecules into shared dense slot rows (hypergraph only; ~25% faster
    geometric encoders, unsupported by faformer_* — see DECISIONS.md).
    """
    order = np.arange(len(samples))
    if shuffle:
        (rng or np.random.default_rng()).shuffle(order)
    if hyper:
        pad = lambda c, sp, target, with_pos: pad_hypergraph_batch(
            c, sp, target=target, with_pos=with_pos, pack_slots=pack_slots
        )
    else:
        pad = lambda c, sp, target, with_pos: pad_graph_batch(
            c, sp, target=target, with_pos=with_pos
        )

    cur: list = []
    a = e = z = 0
    for i in order:
        s = samples[int(i)]
        if hyper:
            na, ne, nz = s.n_atoms, s.n_hedges, s.nnz
        else:
            na, ne, nz = s.n_atoms, s.n_edges, s.n_edges
        over = (
            len(cur) >= spec.max_real_graphs
            or a + na > spec.num_atoms
            or e + ne > spec.num_hedges
            or (hyper and z + nz > spec.nnz)
        )
        if over and cur:
            yield pad(cur, spec, target, with_pos)
            cur, a, e, z = [], 0, 0, 0
        cur.append(s)
        a, e, z = a + na, e + ne, z + nz
    if cur and not drop_last:
        yield pad(cur, spec, target, with_pos)


def empty_like(batch):
    """All-padding batch with the same static shapes as `batch`.

    Zeroed masks make every reduction/loss contribution vanish; index arrays
    keep their (in-range) values. Lets data-parallel tail groups pad with ANY
    spec's batches — no fixed `make_empty` closure needed (bucketed loaders
    yield several specs per epoch).
    """
    import dataclasses

    masks = {"atom_mask", "inc_mask", "hedge_mask", "graph_mask", "slot_mask",
             "edge_mask", "hedge_slot_mask", "inc_slot_mask"}
    updates = {}
    for f in dataclasses.fields(batch):
        v = getattr(batch, f.name)
        if v is None or not hasattr(v, "dtype"):
            continue
        if f.name in masks or f.name == "y":
            updates[f.name] = np.zeros_like(v)
        elif f.name == "slot_gid":
            updates[f.name] = np.full_like(v, -1)
    return batch.replace(**updates)
