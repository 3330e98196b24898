"""Object-free packed/streaming data path (SURVEY Phase 5, VERDICT r1 #5):
cache loading without sample objects, mmap dir format, packed bucketing,
shape-agnostic empty batches for DP tail groups."""

import numpy as np

from equihgnn_tpu.data.batching import empty_like, spec_for_samples
from equihgnn_tpu.data.packed import (
    PackedSamples,
    iter_bucketed_packed_batches,
    make_packed_buckets,
    packed_from_cache,
    packed_from_dir,
    padding_waste_stats,
    save_packed_dir,
)
from equihgnn_tpu.data.synthetic import make_synthetic_dataset, make_synthetic_packed
from equihgnn_tpu.parallel.mesh import group_for_devices


def _assert_packed_equal(a, b):
    for f in ("af", "af_off", "vi", "vi_off", "hi", "hi_off", "hf", "hf_off",
              "y", "pos", "z"):
        x, y_ = getattr(a, f), getattr(b, f)
        if x is None or y_ is None:
            assert x is None and y_ is None, f
        else:
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y_), err_msg=f)


def test_packed_from_cache_matches_objects(tmp_path):
    from equihgnn_tpu.data.datasets.synthetic_ds import SyntheticHGraph3D

    ds = SyntheticHGraph3D(root=str(tmp_path), size=64, seed=11)
    via_objects = PackedSamples.from_samples(ds.samples)
    via_cache = packed_from_cache(ds.processed_path)
    _assert_packed_equal(via_objects, via_cache)


def test_packed_dir_roundtrip_mmap(tmp_path):
    packed = make_synthetic_packed(128, seed=4, num_targets=2)
    save_packed_dir(packed, str(tmp_path / "pk"))
    loaded = packed_from_dir(str(tmp_path / "pk"), mmap=True)
    assert isinstance(loaded.af, np.memmap)
    _assert_packed_equal(packed, loaded)
    # mmap-backed arrays must feed the native packer
    from equihgnn_tpu.data.packed import iter_packed_batches

    spec = spec_for_samples(make_synthetic_dataset(128, seed=4), batch_size=16)
    total = 0
    for b in iter_packed_batches(loaded, spec, target=0, with_pos=True):
        total += int(b.graph_mask.sum())
    assert total == 128


def test_packed_buckets_cover_and_bound(rng):
    packed = make_synthetic_packed(400, seed=7, num_targets=1)
    buckets = make_packed_buckets(packed, batch_size=32, atom_boundaries=(16,))
    assert len(buckets) == 2
    na = packed.sizes()[0]
    covered = np.concatenate([sel for sel, _ in buckets])
    assert sorted(covered.tolist()) == list(range(packed.n))
    # tight A_max per bucket
    (sel0, spec0), (sel1, spec1) = buckets
    assert na[sel0].max() <= spec0.max_atoms_per_graph < spec1.max_atoms_per_graph
    stats = padding_waste_stats(packed, buckets)
    assert set(stats) == {"bucket0", "bucket1"}
    # molecules stream through with per-bucket specs, generator (no list)
    it = iter_bucketed_packed_batches(
        packed, buckets, target=0, with_pos=True, shuffle=True,
        rng=np.random.default_rng(0),
    )
    total = 0
    shapes = set()
    for b in it:
        total += int(b.graph_mask.sum())
        shapes.add(b.atom_feat.shape)
    assert total == packed.n
    assert len(shapes) == 2  # two specs


def test_empty_like_zero_contribution():
    from equihgnn_tpu.data.batching import pad_hypergraph_batch

    samples = make_synthetic_dataset(6, seed=3)
    spec = spec_for_samples(samples, batch_size=6)
    b = pad_hypergraph_batch(samples, spec, target=0, with_pos=True)
    e = empty_like(b)
    assert not e.graph_mask.any() and not e.atom_mask.any()
    assert not e.inc_mask.any() and not e.slot_mask.any()
    assert (e.slot_gid == -1).all()
    assert e.atom_feat.shape == b.atom_feat.shape


def test_group_for_devices_handles_mixed_specs():
    samples = make_synthetic_dataset(40, seed=5)
    spec_a = spec_for_samples(samples, batch_size=4)
    spec_b = spec_for_samples(samples, batch_size=8)
    from equihgnn_tpu.data.batching import iter_batches

    stream = list(iter_batches(samples[:20], spec_a, target=0, with_pos=True)) + \
        list(iter_batches(samples[20:], spec_b, target=0, with_pos=True))
    groups = list(group_for_devices(iter(stream), ndev=4))
    # every group is homogeneous in shape and [4, ...]-stacked
    total = 0
    for g in groups:
        assert g.atom_feat.shape[0] == 4
        total += int(np.asarray(g.graph_mask).sum())
    assert total == 40


def test_streaming_buckets_dp_cli(tmp_path, monkeypatch):
    """--streaming --buckets --data_parallel end-to-end on the virtual mesh
    (the full scale path: packed splits, per-bucket specs, shape-aware DP
    grouping with empty_like tails)."""
    monkeypatch.chdir(tmp_path)
    from equihgnn_tpu.main import build_parser, run

    args = build_parser().parse_args(
        [
            "--streaming", "--data", "synthetic_hg_3d", "--synthetic_size",
            "300", "--method", "egnn_equihnns", "--epochs", "1",
            "--batch_size", "16", "--buckets", "16", "--target", "0",
            "--data_parallel", "--pack_slots", "--MLP_hidden", "8",
            "--output_hidden", "8", "--All_num_layers", "1", "--debug",
        ]
    )
    result = run(args)
    assert np.isfinite(result["test_mae_mean"])
