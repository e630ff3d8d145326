"""Grain-backed input pipeline option."""

import numpy as np
import pytest

pytest.importorskip("grain")

from im2im_uq_tpu.data.grain_pipeline import grain_batches
from im2im_uq_tpu.data.synthetic import SyntheticDataset


def test_grain_batches_contract():
    ds = SyntheticDataset(num_examples=10, image_size=16)
    batches = list(grain_batches(ds, 4, shuffle=False))
    assert len(batches) == 3
    for x, y, m in batches:
        assert x.shape == (4, 16, 16, 1) and m.shape == (4,)
    assert batches[-1].mask.tolist() == [1, 1, 0, 0]
    np.testing.assert_array_equal(batches[0].x[0], ds[0][0])


def test_grain_shuffle_deterministic():
    ds = SyntheticDataset(num_examples=12, image_size=16)
    a = [b.x for b in grain_batches(ds, 4, shuffle=True, seed=5)]
    b = [b.x for b in grain_batches(ds, 4, shuffle=True, seed=5)]
    c = [b.x for b in grain_batches(ds, 4, shuffle=True, seed=6)]
    for xa, xb in zip(a, b):
        np.testing.assert_array_equal(xa, xb)
    assert any(not np.array_equal(xa, xc) for xa, xc in zip(a, c))


def test_grain_sharding_partitions():
    ds = SyntheticDataset(num_examples=12, image_size=16)
    s0 = np.concatenate([b.x[b.mask.astype(bool)] for b in grain_batches(ds, 4, shard_index=0, shard_count=2)])
    s1 = np.concatenate([b.x[b.mask.astype(bool)] for b in grain_batches(ds, 4, shard_index=1, shard_count=2)])
    assert s0.shape[0] + s1.shape[0] == 12
    full = np.stack([ds[i][0] for i in range(12)])
    got = np.concatenate([s0, s1])
    # every example appears exactly once across shards
    assert sorted(map(lambda r: r.tobytes(), got)) == sorted(map(lambda r: r.tobytes(), full))


def test_checkpointable_iterator_resumes_mid_epoch():
    import json

    from im2im_uq_tpu.data.grain_pipeline import CheckpointableBatchIterator

    ds = SyntheticDataset(num_examples=12, image_size=16)
    make = lambda: CheckpointableBatchIterator(ds, 4, shuffle=True, seed=7)
    it = make()
    next(it)
    next(it)
    state = it.get_state()
    expected = next(it)  # third batch

    fresh = make()
    fresh.set_state(json.loads(json.dumps(state)))  # state is serializable
    resumed = next(fresh)
    np.testing.assert_array_equal(resumed.x, expected.x)
    np.testing.assert_array_equal(resumed.y, expected.y)
    np.testing.assert_array_equal(resumed.mask, expected.mask)


def test_checkpointable_iterator_pads_final_batch():
    from im2im_uq_tpu.data.grain_pipeline import CheckpointableBatchIterator

    ds = SyntheticDataset(num_examples=10, image_size=16)
    batches = list(CheckpointableBatchIterator(ds, 4, shuffle=False))
    assert len(batches) == 3
    assert batches[-1].x.shape == (4, 16, 16, 1)
    assert batches[-1].mask.tolist() == [1, 1, 0, 0]
