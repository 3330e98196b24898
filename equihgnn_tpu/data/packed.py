"""Packed (structure-of-arrays) dataset representation + native fast packer.

`PackedSamples` stores an entire dataset as a handful of concatenated arrays
with per-molecule offsets — the same layout the dataset cache uses on disk
(`equihgnn_tpu/data/datasets/base.py`). Batch assembly then becomes a single
C++ call (`equihgnn_tpu/native/packer.cpp`) that fills the padded buffers,
replacing the per-molecule Python copy loop. Falls back to the pure-Python
packer when no compiler is available.
"""

from __future__ import annotations

import ctypes
from dataclasses import dataclass
from typing import Iterator, Sequence

import numpy as np

from equihgnn_tpu.data.batching import BatchSpec, pad_hypergraph_batch
from equihgnn_tpu.data.structures import HyperGraphBatch, HyperGraphSample


def _c_ptr(arr, typ):
    return arr.ctypes.data_as(ctypes.POINTER(typ))


@dataclass
class PackedSamples:
    af: np.ndarray  # [sum_atoms, 9] int32
    af_off: np.ndarray  # [n+1] int64
    vi: np.ndarray  # [sum_nnz] int64
    vi_off: np.ndarray
    hi: np.ndarray  # [sum_nnz] int64
    hi_off: np.ndarray
    hf: np.ndarray  # [sum_hedges] int64
    hf_off: np.ndarray
    y: np.ndarray  # [n, T] float32
    pos: np.ndarray | None = None  # [sum_atoms, 3] float32
    z: np.ndarray | None = None  # [sum_atoms] int32

    @property
    def n(self) -> int:
        return len(self.af_off) - 1

    @classmethod
    def from_samples(cls, samples: Sequence[HyperGraphSample]) -> "PackedSamples":
        off = lambda arrs: np.cumsum([0] + [a.shape[0] for a in arrs]).astype(np.int64)
        afs = [s.atom_feat for s in samples]
        vis = [s.vertex_idx for s in samples]
        his = [s.hedge_idx for s in samples]
        hfs = [s.hedge_feat for s in samples]
        y = np.stack(
            [np.atleast_1d(np.asarray(s.y, dtype=np.float32)) for s in samples]
        )
        pos = (
            np.concatenate([s.pos for s in samples]).astype(np.float32)
            if samples[0].pos is not None
            else None
        )
        z = (
            np.concatenate([s.z for s in samples]).astype(np.int32)
            if samples[0].z is not None
            else None
        )
        return cls(
            af=np.ascontiguousarray(np.concatenate(afs), dtype=np.int32),
            af_off=off(afs),
            vi=np.ascontiguousarray(np.concatenate(vis), dtype=np.int64),
            vi_off=off(vis),
            hi=np.ascontiguousarray(np.concatenate(his), dtype=np.int64),
            hi_off=off(his),
            hf=np.ascontiguousarray(np.concatenate(hfs), dtype=np.int64),
            hf_off=off(hfs),
            y=np.ascontiguousarray(y),
            pos=None if pos is None else np.ascontiguousarray(pos),
            z=None if z is None else np.ascontiguousarray(z),
        )

    # per-molecule sizes (for greedy grouping)
    def sizes(self):
        return (
            np.diff(self.af_off),
            np.diff(self.hf_off),
            np.diff(self.vi_off),
        )

    def view_sample(self, i: int) -> HyperGraphSample:
        a0, a1 = self.af_off[i], self.af_off[i + 1]
        z0, z1 = self.vi_off[i], self.vi_off[i + 1]
        e0, e1 = self.hf_off[i], self.hf_off[i + 1]
        return HyperGraphSample(
            atom_feat=self.af[a0:a1],
            vertex_idx=self.vi[z0:z1],
            hedge_idx=self.hi[z0:z1],
            hedge_feat=self.hf[e0:e1],
            y=self.y[i],
            pos=None if self.pos is None else self.pos[a0:a1],
            z=None if self.z is None else self.z[a0:a1],
        )


def pack_batch(
    packed: PackedSamples,
    members: np.ndarray,
    spec: BatchSpec,
    target: int | None = None,
    with_pos: bool = False,
    pack_slots: bool = False,
) -> HyperGraphBatch:
    """Fill one padded batch from packed arrays (native if available)."""
    from equihgnn_tpu.native import get_packer_lib

    lib = get_packer_lib()
    if lib is None:  # pure-Python fallback
        return pad_hypergraph_batch(
            [packed.view_sample(int(i)) for i in members],
            spec,
            target=target,
            with_pos=with_pos,
            pack_slots=pack_slots,
        )

    G, N, E, Z = spec.num_graphs, spec.num_atoms, spec.num_hedges, spec.nnz
    A = spec.max_atoms_per_graph
    if pack_slots and not spec.num_slot_rows:
        raise ValueError("pack_slots=True needs spec.num_slot_rows > 0")
    R = spec.num_slot_rows if pack_slots else G
    i32, i64, u8, f32 = (
        ctypes.c_int32, ctypes.c_int64, ctypes.c_uint8, ctypes.c_float,
    )
    out = {
        "atom_feat": np.empty((N, 9), np.int32),
        "atom_mask": np.empty((N,), np.uint8),
        "atom_graph_id": np.empty((N,), np.int32),
        "vertex_idx": np.empty((Z,), np.int32),
        "hedge_idx": np.empty((Z,), np.int32),
        "inc_mask": np.empty((Z,), np.uint8),
        "hedge_feat": np.empty((E,), np.int32),
        "hedge_mask": np.empty((E,), np.uint8),
        "hedge_graph_id": np.empty((E,), np.int32),
        "e_order": np.empty((E,), np.int32),
        "y": np.empty((G,), np.float32),
        "graph_mask": np.empty((G,), np.uint8),
    }
    pos_out = np.empty((N, 3), np.float32) if with_pos else None
    z_out = np.empty((N,), np.int32) if (with_pos and packed.z is not None) else None
    si = np.empty((R, A), np.int32) if A else None
    sm = np.empty((R, A), np.uint8) if A else None
    sgid = np.empty((R, A), np.int32) if A else None
    aslot = np.empty((N,), np.int32) if A else None
    arow = np.empty((N,), np.int32) if A else None
    members = np.ascontiguousarray(members, dtype=np.int64)

    n_targets = packed.y.shape[1] if packed.y.ndim == 2 else 1
    if target is None and n_targets > 1:
        raise ValueError(
            f"target=None with {n_targets} target columns — select one "
            "(the Python path errors here too; no silent column-0 default)"
        )
    tgt = -1 if target is None else int(target)

    null32 = ctypes.POINTER(i32)()
    nullf = ctypes.POINTER(f32)()
    null8 = ctypes.POINTER(u8)()
    rc = lib.pack_hypergraph_batch(
        _c_ptr(packed.af, i32), _c_ptr(packed.af_off, i64),
        _c_ptr(packed.vi, i64), _c_ptr(packed.vi_off, i64),
        _c_ptr(packed.hi, i64), _c_ptr(packed.hi_off, i64),
        _c_ptr(packed.hf, i64), _c_ptr(packed.hf_off, i64),
        _c_ptr(packed.y, f32), i64(n_targets), i64(tgt),
        _c_ptr(packed.pos, f32) if (with_pos and packed.pos is not None) else nullf,
        _c_ptr(packed.z, i32) if (with_pos and packed.z is not None) else null32,
        _c_ptr(members, i64), i64(len(members)),
        i64(G), i64(N), i64(E), i64(Z), i64(A),
        i64(R if pack_slots else 0),
        _c_ptr(out["atom_feat"], i32), _c_ptr(out["atom_mask"], u8),
        _c_ptr(out["atom_graph_id"], i32),
        _c_ptr(out["vertex_idx"], i32), _c_ptr(out["hedge_idx"], i32),
        _c_ptr(out["inc_mask"], u8),
        _c_ptr(out["hedge_feat"], i32), _c_ptr(out["hedge_mask"], u8),
        _c_ptr(out["hedge_graph_id"], i32), _c_ptr(out["e_order"], i32),
        _c_ptr(out["y"], f32), _c_ptr(out["graph_mask"], u8),
        _c_ptr(pos_out, f32) if pos_out is not None else nullf,
        _c_ptr(z_out, i32) if z_out is not None else null32,
        _c_ptr(si, i32) if si is not None else null32,
        _c_ptr(sm, u8) if sm is not None else null8,
        _c_ptr(sgid, i32) if sgid is not None else null32,
        _c_ptr(aslot, i32) if aslot is not None else null32,
        _c_ptr(arow, i32) if arow is not None else null32,
    )
    if rc != 0:
        raise ValueError(f"native packer failed (code {rc}) for spec {spec}")

    tables = None
    He, Ni = spec.num_hedge_slots, spec.num_inc_slots
    if si is not None and He and Ni:
        rr = R if pack_slots else G
        if hasattr(lib, "build_incidence_slot_tables"):
            t = {
                "hedge_row": np.empty(E, np.int32),
                "hedge_slot": np.empty(E, np.int32),
                "hedge_slot_index": np.empty((rr, He), np.int32),
                "hedge_slot_mask": np.empty((rr, He), np.uint8),
                "inc_slot_atom": np.empty((rr, Ni), np.int32),
                "inc_slot_hedge": np.empty((rr, Ni), np.int32),
                "inc_slot_mask": np.empty((rr, Ni), np.uint8),
            }
            rc2 = lib.build_incidence_slot_tables(
                _c_ptr(out["vertex_idx"], i32), _c_ptr(out["hedge_idx"], i32),
                _c_ptr(out["inc_mask"], u8), i64(Z),
                _c_ptr(out["hedge_mask"], u8), i64(E),
                _c_ptr(aslot, i32),
                _c_ptr(out["hedge_graph_id"], i32),
                _c_ptr(sgid, i32), i64(A), i64(G),
                i64(rr), i64(He), i64(Ni),
                _c_ptr(t["hedge_row"], i32), _c_ptr(t["hedge_slot"], i32),
                _c_ptr(t["hedge_slot_index"], i32),
                _c_ptr(t["hedge_slot_mask"], u8),
                _c_ptr(t["inc_slot_atom"], i32),
                _c_ptr(t["inc_slot_hedge"], i32),
                _c_ptr(t["inc_slot_mask"], u8),
            )
            if rc2 == 0:
                t["hedge_slot_mask"] = t["hedge_slot_mask"].astype(bool)
                t["inc_slot_mask"] = t["inc_slot_mask"].astype(bool)
                tables = t
        else:  # stale cached library without the symbol
            from equihgnn_tpu.data.batching import incidence_slot_tables

            tables = incidence_slot_tables(
                spec, rr, sgid, aslot,
                out["vertex_idx"], out["hedge_idx"],
                out["inc_mask"].astype(bool),
                out["hedge_graph_id"], out["hedge_mask"].astype(bool),
            )
    return HyperGraphBatch(
        atom_feat=out["atom_feat"],
        atom_mask=out["atom_mask"].astype(bool),
        atom_graph_id=out["atom_graph_id"],
        vertex_idx=out["vertex_idx"],
        hedge_idx=out["hedge_idx"],
        inc_mask=out["inc_mask"].astype(bool),
        hedge_feat=out["hedge_feat"],
        hedge_mask=out["hedge_mask"].astype(bool),
        hedge_graph_id=out["hedge_graph_id"],
        e_order=out["e_order"],
        y=out["y"],
        graph_mask=out["graph_mask"].astype(bool),
        pos=pos_out,
        z=z_out,
        slot_index=si,
        slot_mask=None if sm is None else sm.astype(bool),
        slot_gid=sgid,
        atom_slot=aslot,
        atom_row=arow,
        rows_are_molecules=not pack_slots,
        **(tables or {}),
    )


def iter_packed_batches(
    packed: PackedSamples,
    spec: BatchSpec,
    target: int | None = None,
    with_pos: bool = False,
    shuffle: bool = False,
    rng: np.random.Generator | None = None,
    indices: np.ndarray | None = None,
    pack_slots: bool = False,
) -> Iterator[HyperGraphBatch]:
    """Greedy grouping (Python, cheap) + native batch fill (C++, hot)."""
    na, ne, nz = packed.sizes()
    order = np.arange(packed.n) if indices is None else np.asarray(indices)
    if shuffle:
        order = order.copy()
        (rng or np.random.default_rng()).shuffle(order)

    cur: list[int] = []
    a = e = z = 0
    for i in order:
        i = int(i)
        over = (
            len(cur) >= spec.max_real_graphs
            or a + na[i] > spec.num_atoms
            or e + ne[i] > spec.num_hedges
            or z + nz[i] > spec.nnz
        )
        if over and cur:
            yield pack_batch(packed, np.array(cur), spec, target, with_pos, pack_slots)
            cur, a, e, z = [], 0, 0, 0
        cur.append(i)
        a, e, z = a + na[i], e + ne[i], z + nz[i]
    if cur:
        yield pack_batch(packed, np.array(cur), spec, target, with_pos, pack_slots)


# --------------------------------------------------------------- scale path
def packed_from_cache(path: str) -> PackedSamples:
    """Load a MolDataset npz cache directly as PackedSamples — no per-sample
    Python objects (SURVEY Phase 5: PCQM4Mv2 ~3.7M molecules, the reference
    handles it via InMemoryDataset, `reference equihgnn/data/pcqm4.py:57-114`).
    """
    data = np.load(path)
    if not bool(data["hyper"]):
        raise ValueError("packed loading supports hypergraph caches only")
    return PackedSamples(
        af=np.ascontiguousarray(data["af"], dtype=np.int32),
        af_off=np.ascontiguousarray(data["af_off"], dtype=np.int64),
        vi=np.ascontiguousarray(data["vi"], dtype=np.int64),
        vi_off=np.ascontiguousarray(data["vi_off"], dtype=np.int64),
        hi=np.ascontiguousarray(data["hi"], dtype=np.int64),
        hi_off=np.ascontiguousarray(data["hi_off"], dtype=np.int64),
        hf=np.ascontiguousarray(data["hf"], dtype=np.int64),
        hf_off=np.ascontiguousarray(data["hf_off"], dtype=np.int64),
        y=np.ascontiguousarray(data["y"], dtype=np.float32),
        pos=(np.ascontiguousarray(data["pos"], dtype=np.float32)
             if "pos" in data else None),
        z=(np.ascontiguousarray(data["z"], dtype=np.int32)
           if "z" in data else None),
    )


_DIR_FIELDS = ("af", "af_off", "vi", "vi_off", "hi", "hi_off",
               "hf", "hf_off", "y", "pos", "z")


def save_packed_dir(packed: PackedSamples, path: str) -> None:
    """Write each array as a raw .npy so loads can be memory-mapped —
    a multi-million-molecule dataset costs no RSS until batches touch it."""
    import os

    os.makedirs(path, exist_ok=True)
    for f in _DIR_FIELDS:
        arr = getattr(packed, f)
        if arr is not None:
            np.save(os.path.join(path, f + ".npy"), arr)


def packed_from_dir(path: str, mmap: bool = True) -> PackedSamples:
    import os

    mode = "r" if mmap else None
    load = lambda f: (
        np.load(os.path.join(path, f + ".npy"), mmap_mode=mode)
        if os.path.exists(os.path.join(path, f + ".npy"))
        else None
    )
    kw = {f: load(f) for f in _DIR_FIELDS}
    # offsets are tiny and indexed constantly — always materialize
    for f in ("af_off", "vi_off", "hi_off", "hf_off"):
        kw[f] = np.asarray(kw[f])
    return PackedSamples(**kw)


def make_packed_buckets(
    packed: PackedSamples,
    batch_size: int,
    atom_boundaries: Sequence[int] = (16,),
    atom_multiple: int = 8,
    headroom: float = 1.05,
):
    """Size buckets with tight per-bucket specs, from offsets alone.

    Returns [(indices, BatchSpec)]. Padding waste in the dense [R, A_max]
    view is the main throughput loss when sizes vary (`make_size_buckets`);
    this is the object-free equivalent for the packed/streaming path.
    """
    from equihgnn_tpu.data.batching import BatchSpec, _round_up

    na, ne, nz = packed.sizes()
    bounds = list(atom_boundaries) + [int(na.max())]
    buckets = []
    lo = 0
    for hi_b in bounds:
        sel = np.where((na > lo) & (na <= hi_b))[0]
        if len(sel):
            cap = lambda arr: _round_up(
                max(int(batch_size * float(arr.mean()) * headroom),
                    int(arr.max()) + 1),
                atom_multiple,
            )
            a_max = _round_up(int(na[sel].max()), atom_multiple)
            num_atoms = cap(na[sel])
            spec = BatchSpec(
                num_graphs=batch_size + 1,
                num_atoms=num_atoms,
                num_hedges=cap(ne[sel]),
                nnz=cap(nz[sel]),
                max_atoms_per_graph=a_max,
                # rounded to a multiple of 4: the vis_mix kernels block rows in
                # fours; an unaligned R pad-copies every kernel operand
                num_slot_rows=-(-(int(num_atoms / a_max * 1.15) + 3) // 4) * 4,
            )
            buckets.append((sel, spec))
        lo = hi_b
    return buckets


def padding_waste_stats(packed: PackedSamples, buckets) -> dict:
    """Slot-utilization diagnostics per bucket (logged by the CLI)."""
    na, _, _ = packed.sizes()
    out = {}
    for bi, (sel, spec) in enumerate(buckets):
        atoms = int(na[sel].sum())
        batches = max(1, int(np.ceil(atoms / spec.num_atoms)))
        slot_cap = spec.num_slot_rows * spec.max_atoms_per_graph
        out[f"bucket{bi}"] = {
            "molecules": int(len(sel)),
            "a_max": spec.max_atoms_per_graph,
            "atom_capacity_util": round(atoms / (batches * spec.num_atoms), 3),
            "slot_rows": spec.num_slot_rows,
            "slot_util_bound": round(spec.num_atoms / slot_cap, 3),
        }
    return out


def iter_bucketed_packed_batches(
    packed: PackedSamples,
    buckets,
    *,
    target: int | None = None,
    with_pos: bool = False,
    shuffle: bool = False,
    rng: np.random.Generator | None = None,
    pack_slots: bool = False,
) -> Iterator[HyperGraphBatch]:
    """Generator over per-bucket packed batches — bounded memory, no batch
    list is ever materialized (unlike `iter_bucketed_batches`' eager list).
    Bucket order is shuffled per epoch; batches stream within each bucket."""
    rng = rng or np.random.default_rng()
    order = rng.permutation(len(buckets)) if shuffle else np.arange(len(buckets))
    for bi in order:
        sel, spec = buckets[int(bi)]
        yield from iter_packed_batches(
            packed, spec, target=target, with_pos=with_pos,
            shuffle=shuffle, rng=rng, indices=sel, pack_slots=pack_slots,
        )
