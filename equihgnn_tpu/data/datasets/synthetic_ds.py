"""Registered synthetic datasets (RDKit-free, offline-capable).

Stand-ins with the same interface as the real dataset families, for
environments without RDKit/network (tests, benchmarks, smoke runs). QM9-like
size statistics; 16 random regression targets.
"""

from __future__ import annotations

from equihgnn_tpu.common.registry import registry
from equihgnn_tpu.data.datasets.base import MolDataset
from equihgnn_tpu.data.synthetic import make_synthetic_dataset


class _SyntheticBase(MolDataset):
    num_targets: int = 16
    default_size: int = 4096

    def process(self):
        return make_synthetic_dataset(
            int(self.kwargs.get("size") or self.default_size),
            seed=int(self.kwargs.get("seed") or 0),
            hyper=self.hyper,
            with_pos=self.has_pos,
            num_targets=self.num_targets,
        )


@registry.register_data("synthetic_hg")
class SyntheticHGraph(_SyntheticBase):
    name = "synthetic_hg"
    hyper = True
    has_pos = False


@registry.register_data("synthetic_hg_3d")
class SyntheticHGraph3D(_SyntheticBase):
    name = "synthetic_hg_3d"
    hyper = True
    has_pos = True


@registry.register_data("synthetic_g")
class SyntheticGraph(_SyntheticBase):
    name = "synthetic_g"
    hyper = False
    has_pos = False


@registry.register_data("synthetic_g_3d")
class SyntheticGraph3D(_SyntheticBase):
    name = "synthetic_g_3d"
    hyper = False
    has_pos = True
