"""Dataset base: offline featurize-once-and-cache, like PyG InMemoryDataset.

The reference datasets download raw archives and featurize with RDKit once,
caching a collated `.pt` (`reference equihgnn/data/qm9.py:115-230` et al.).
Here `process()` produces a list of ragged `HyperGraphSample`/`GraphSample`
and caches them as a compressed `.npz` bundle; batching to static shapes
happens at load time (the TPU-native boundary).
"""

from __future__ import annotations

import os
from typing import List

import numpy as np

from equihgnn_tpu.data.structures import GraphSample, HyperGraphSample


class MolDataset:
    """Featurize-once dataset of ragged molecule samples."""

    name: str = "base"
    hyper: bool = True
    has_pos: bool = False
    num_targets: int = 1
    partitioned: bool = False  # OPV-style pre-split train/valid/test

    def __init__(self, root: str, partition: str | None = None, **kwargs):
        self.root = root
        self.partition = partition
        self.kwargs = kwargs
        os.makedirs(self.processed_dir, exist_ok=True)
        path = self.processed_path
        if not os.path.exists(path):
            samples = self.process()
            self._save(samples, path)
        self.samples = self._load(path)

    # ------------------------------------------------------------------ paths
    @property
    def processed_dir(self) -> str:
        return os.path.join(self.root, "processed_tpu")

    @property
    def processed_path(self) -> str:
        part = f"_{self.partition}" if self.partition else ""
        extra = "".join(
            f"_{k}-{v}" for k, v in sorted(self.kwargs.items()) if v is not None
        )
        return os.path.join(self.processed_dir, f"{self.name}{part}{extra}.npz")

    # ------------------------------------------------------------- serialization
    # Packed format: all ragged fields concatenated + per-molecule offsets, so
    # a 3.7M-molecule dataset is a handful of big arrays (mmap-friendly), not
    # millions of tiny ones.
    def _save(self, samples: List, path: str):
        flat: dict[str, np.ndarray] = {
            "count": np.array(len(samples)),
            "hyper": np.array(self.hyper),
        }
        if self.hyper:
            ragged = {
                "af": [s.atom_feat for s in samples],
                "vi": [s.vertex_idx for s in samples],
                "hi": [s.hedge_idx for s in samples],
                "hf": [s.hedge_feat for s in samples],
            }
        else:
            ragged = {
                "af": [s.atom_feat for s in samples],
                "es": [s.edge_src for s in samples],
                "ed": [s.edge_dst for s in samples],
                "ef": [s.edge_feat for s in samples],
            }
        for key, arrs in ragged.items():
            flat[key] = np.concatenate(arrs, axis=0) if arrs else np.zeros((0,))
            flat[f"{key}_off"] = np.cumsum([0] + [a.shape[0] for a in arrs])
        flat["y"] = np.stack([np.asarray(s.y, dtype=np.float32) for s in samples])
        if samples and samples[0].pos is not None:
            flat["pos"] = np.concatenate([s.pos for s in samples], axis=0)
        if samples and samples[0].z is not None:
            flat["z"] = np.concatenate([s.z for s in samples], axis=0)
        if samples and samples[0].smi is not None:
            flat["smi"] = np.asarray([s.smi for s in samples], dtype=np.str_)
        np.savez_compressed(path + ".tmp.npz", **flat)
        os.replace(path + ".tmp.npz", path)

    def _load(self, path: str) -> List:
        data = np.load(path)
        n = int(data["count"])
        hyper = bool(data["hyper"])
        keys = ("af", "vi", "hi", "hf") if hyper else ("af", "es", "ed", "ef")
        arrs = {k: data[k] for k in keys}
        offs = {k: data[f"{k}_off"] for k in keys}
        y = data["y"]
        pos = data["pos"] if "pos" in data else None
        z = data["z"] if "z" in data else None
        smi = data["smi"] if "smi" in data else None
        out = []
        for i in range(n):
            sl = lambda k: arrs[k][offs[k][i] : offs[k][i + 1]]
            a0, a1 = offs["af"][i], offs["af"][i + 1]
            p = pos[a0:a1] if pos is not None else None
            zz = z[a0:a1] if z is not None else None
            sm = str(smi[i]) if smi is not None else None
            if hyper:
                out.append(
                    HyperGraphSample(
                        atom_feat=sl("af"), vertex_idx=sl("vi"), hedge_idx=sl("hi"),
                        hedge_feat=sl("hf"), y=y[i], pos=p, z=zz, smi=sm,
                    )
                )
            else:
                out.append(
                    GraphSample(
                        atom_feat=sl("af"), edge_src=sl("es"), edge_dst=sl("ed"),
                        edge_feat=sl("ef"), y=y[i], pos=p, z=zz, smi=sm,
                    )
                )
        return out

    # ------------------------------------------------------------------ hooks
    def process(self) -> List:
        raise NotImplementedError

    def __len__(self):
        return len(self.samples)

    def __getitem__(self, i):
        return self.samples[i]
