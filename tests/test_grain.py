"""Grain-backed input pipeline option."""

import os

import numpy as np
import pytest

pytest.importorskip("grain")

from im2im_uq_tpu.data.grain_pipeline import grain_batches
from im2im_uq_tpu.data.synthetic import SyntheticDataset

pytestmark = pytest.mark.full  # compile-heavy: excluded from -m smoke


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


class _IndexDataset:
    """(x, y) pairs whose pixel values encode the example index."""

    def __init__(self, n, size=16):
        self.n, self.size = n, size

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        x = np.full((self.size, self.size, 1), float(i), np.float32)
        return x, x


class _FailOnIndex:
    """Wrapper raising on one example index — simulates a preemption."""

    def __init__(self, dataset, bad_index):
        self.dataset, self.bad_index = dataset, bad_index

    def __len__(self):
        return len(self.dataset)

    def __getitem__(self, i):
        if i == self.bad_index:
            raise RuntimeError("injected preemption")
        return self.dataset[i]


def test_train_net_grain_midepoch_resume(tmp_path, capsys):
    """A preempted grain-pipeline epoch resumes exactly: the interrupted+
    resumed run reproduces the uninterrupted run's final parameters, and the
    resume goes through the mid-epoch checkpoint (not from scratch)."""
    import jax
    import jax.numpy as jnp

    from im2im_uq_tpu.data.grain_pipeline import CheckpointableBatchIterator
    from im2im_uq_tpu.data.synthetic import SyntheticDataset
    from im2im_uq_tpu.models.assembly import add_uncertainty, build_trunk
    from im2im_uq_tpu.training.checkpoint import midepoch_checkpoint_path
    from im2im_uq_tpu.training.train import train_net

    cfg = {
        "dataset": "synthetic", "model": "UNet", "uncertainty_type": "quantiles",
        "batch_size": 4, "lr": 1e-3, "epochs": 1, "input_normalization": "standard",
        "output_normalization": "min-max", "q_lo": 0.05, "q_hi": 0.95,
        "q_lo_weight": 1.0, "q_hi_weight": 1.0, "mse_weight": 1.0,
        "input_pipeline": "grain", "checkpoint_every_steps": 1,
        # checkpoint_every > epochs: no whole-epoch checkpoints, so any
        # resume must come from the mid-epoch file
        "checkpoint_every": 10,
    }
    ds = SyntheticDataset(num_examples=8, image_size=16, seed=0)

    def fresh_state():
        return add_uncertainty(
            build_trunk(cfg), cfg, rng=jax.random.key(0),
            example_input=jnp.zeros((1, 16, 16, 1)),
        )

    # uninterrupted run (no checkpointing side effects)
    clean_cfg = {k: v for k, v in cfg.items() if k != "checkpoint_every_steps"}
    ref = train_net(fresh_state(), ds, ds, None, epochs=1, batch_size=4,
                    lr=1e-3, validate_every=10, config=clean_cfg)

    # which example indices land in the SECOND batch of epoch 0? train_net
    # uses seed + 1000*epoch + 1 = 1 for epoch 0 (seed default 0)
    probe = CheckpointableBatchIterator(_IndexDataset(8), 4, shuffle=True, seed=1)
    next(probe)
    second = next(probe)
    bad = int(second.x[0, 0, 0, 0])

    # interrupted run: step 1 checkpoints, step 2's data raises
    with pytest.raises(RuntimeError, match="injected preemption"):
        train_net(fresh_state(), _FailOnIndex(ds, bad), ds, None, epochs=1,
                  batch_size=4, lr=1e-3, checkpoint_dir=str(tmp_path),
                  checkpoint_every=10, validate_every=10, config=cfg)
    assert os.path.exists(midepoch_checkpoint_path(str(tmp_path), cfg))

    # resume finishes the epoch from the mid-epoch state
    capsys.readouterr()
    resumed = train_net(fresh_state(), ds, ds, None, epochs=1, batch_size=4,
                        lr=1e-3, load_from_checkpoint=True,
                        checkpoint_dir=str(tmp_path), checkpoint_every=10,
                        validate_every=10, config=cfg)
    assert "Resumed mid-epoch" in capsys.readouterr().out

    ref_k = np.asarray(ref.variables["params"]["trunk"]["inc"]["conv0"]["kernel"])
    res_k = np.asarray(resumed.variables["params"]["trunk"]["inc"]["conv0"]["kernel"])
    np.testing.assert_allclose(res_k, ref_k, rtol=1e-6, atol=1e-7)


def test_checkpointable_iterator_pads_final_batch():
    from im2im_uq_tpu.data.grain_pipeline import CheckpointableBatchIterator

    ds = SyntheticDataset(num_examples=10, image_size=16)
    batches = list(CheckpointableBatchIterator(ds, 4, shuffle=False))
    assert len(batches) == 3
    assert batches[-1].x.shape == (4, 16, 16, 1)
    assert batches[-1].mask.tolist() == [1, 1, 0, 0]


def test_pad_mode_wrap_repeats_real_examples():
    from im2im_uq_tpu.data.grain_pipeline import CheckpointableBatchIterator

    ds = SyntheticDataset(num_examples=10, image_size=16)
    last = list(CheckpointableBatchIterator(ds, 4, shuffle=False, pad_mode="wrap"))[-1]
    assert last.mask.tolist() == [1, 1, 0, 0]
    # padding wraps the real examples instead of zeros (BN stats stay real)
    np.testing.assert_array_equal(last.x[2], last.x[0])
    np.testing.assert_array_equal(last.x[3], last.x[1])
