"""Data layer: splits, batch iteration, padding/masking, normalization."""

import numpy as np
import pytest

from im2im_uq_tpu.data.core import Subset, iterate_batches, random_split, split_lengths
from im2im_uq_tpu.data.normalize import (
    RunningMoments,
    compute_norm_params,
    normalize_array,
    normalize_dataset,
)
from im2im_uq_tpu.data.synthetic import SyntheticDataset


class _Pairs:
    def __init__(self, n=10, shape=(4, 4, 1), seed=0):
        rng = np.random.RandomState(seed)
        self.x = rng.randn(n, *shape).astype(np.float32)
        self.y = rng.randn(n, *shape).astype(np.float32)
        self.cache_path = None
        self.norm_params = {}

    def __len__(self):
        return self.x.shape[0]

    def __getitem__(self, i):
        return self.x[i], self.y[i]


def test_split_lengths_matches_reference_arithmetic():
    # round(n*p) with remainder absorbed by the last split (router.py:101-103)
    assert split_lengths(100, [0.8, 0.1, 0.1, 0.0]) == [80, 10, 10, 0]
    assert sum(split_lengths(97, [0.8, 0.1, 0.1, 0.0])) == 97
    assert sum(split_lengths(10000, [0.008, 0.0001, 0.0001, 0.9918])) == 10000


def test_random_split_partitions():
    ds = _Pairs(10)
    a, b, c = random_split(ds, [6, 2, 2], np.random.RandomState(0))
    seen = sorted(a.indices + b.indices + c.indices)
    assert seen == list(range(10))
    assert len(a) == 6 and isinstance(a, Subset)
    with pytest.raises(ValueError):
        random_split(ds, [5, 2, 2], np.random.RandomState(0))


def test_iterate_batches_padding_and_mask():
    ds = _Pairs(10)
    batches = list(iterate_batches(ds, 4, shuffle=False))
    assert len(batches) == 3
    for x, y, m in batches:
        assert x.shape[0] == 4 and m.shape == (4,)
    assert batches[-1].mask.tolist() == [1, 1, 0, 0]
    # zero padding by default
    assert np.all(batches[-1].x[2:] == 0)
    # order preserved without shuffle
    np.testing.assert_array_equal(batches[0].x, ds.x[:4])


def test_iterate_batches_wrap_padding():
    ds = _Pairs(10)
    batches = list(iterate_batches(ds, 4, shuffle=False, pad_mode="wrap"))
    np.testing.assert_array_equal(batches[-1].x[2], batches[-1].x[0])
    assert batches[-1].mask.tolist() == [1, 1, 0, 0]


def test_iterate_batches_shuffle_deterministic():
    ds = _Pairs(8)
    a = [b.x for b in iterate_batches(ds, 4, shuffle=True, rng=np.random.RandomState(3))]
    b = [b.x for b in iterate_batches(ds, 4, shuffle=True, rng=np.random.RandomState(3))]
    for xa, xb in zip(a, b):
        np.testing.assert_array_equal(xa, xb)


def test_iterate_batches_propagates_worker_errors():
    class Bad(_Pairs):
        def __getitem__(self, i):
            raise RuntimeError("boom")

    with pytest.raises(RuntimeError, match="boom"):
        list(iterate_batches(Bad(4), 2))


def test_running_moments_matches_reference_recurrence():
    """Oracle: the reference RunningStats recurrence (datasets/utils.py:71-103)."""
    rng = np.random.RandomState(0)
    xs = [rng.randn(3, 3).astype(np.float64) for _ in range(7)]

    # reference-semantics oracle, written against the published recurrence
    n, old_m, new_m, old_s, new_s = 0, 0.0, 0.0, 0.0, 0.0
    for x in xs:
        n += 1
        if n == 1:
            old_m = new_m = x.mean()
            old_s = 0.0
        else:
            new_m = old_m + (x.mean() - old_m) / n
            new_s = old_s + (x - old_m) * (x - new_m)
            old_m, old_s = new_m, new_s
    expected_mean = new_m
    expected_varmean = (new_s / (n - 1)).mean()

    rm = RunningMoments()
    for x in xs:
        rm.push(x)
    assert rm.mean() == pytest.approx(expected_mean)
    assert rm.variance_mean() == pytest.approx(expected_varmean)


def test_compute_norm_params_keys_and_values():
    ds = _Pairs(12)
    p = compute_norm_params(ds)
    assert set(p) == {
        "input_max", "input_min", "input_mean", "input_std",
        "output_max", "output_min", "output_mean", "output_std",
    }
    assert p["input_max"] == pytest.approx(ds.x.max())
    assert p["input_mean"] == pytest.approx(
        np.mean([ds.x[i].mean() for i in range(len(ds))])
    )


def test_normalize_dataset_cache(tmp_path):
    ds = _Pairs(6)
    ds.cache_path = str(tmp_path)
    normalize_dataset(ds)
    first = dict(ds.norm_params)
    ds2 = _Pairs(6, seed=99)  # different data, same cache → params come from cache
    ds2.cache_path = str(tmp_path)
    normalize_dataset(ds2)
    assert ds2.norm_params == first


def test_normalize_array_modes():
    x = np.random.RandomState(0).randn(5, 3, 3, 1).astype(np.float32)
    z, p = normalize_array(x, "standard", per_pixel=False, tag="input")
    assert abs(z.mean()) < 1e-6 and abs(z.std() - 1) < 1e-5
    z, p = normalize_array(x, "min-max", per_pixel=False, tag="output")
    assert z.min() == 0 and z.max() == pytest.approx(1.0)
    with pytest.raises(NotImplementedError):
        normalize_array(x, "bogus", False, "input")


def test_synthetic_dataset_deterministic():
    a = SyntheticDataset(num_examples=4, image_size=16)
    b = SyntheticDataset(num_examples=4, image_size=16)
    xa, ya = a[2]
    xb, yb = b[2]
    np.testing.assert_array_equal(xa, xb)
    np.testing.assert_array_equal(ya, yb)
    assert xa.shape == (16, 16, 1) and ya.shape == (16, 16, 1)
    assert 0 <= ya.min() and ya.max() <= 1.0


def test_subset_pickles_and_deepcopies():
    import copy
    import pickle

    ds = _Pairs(6)
    sub = random_split(ds, [4, 2], np.random.RandomState(0))[0]
    again = pickle.loads(pickle.dumps(sub))
    np.testing.assert_array_equal(again[0][0], sub[0][0])
    dup = copy.deepcopy(sub)
    np.testing.assert_array_equal(dup[1][1], sub[1][1])


def test_iterate_batches_early_exit_stops_producer():
    import threading
    import time

    ds = _Pairs(64)
    before = threading.active_count()
    for _ in range(3):
        it = iterate_batches(ds, 4, prefetch=1)
        next(it)
        it.close()  # early exit — producer must not stay parked on the queue
    deadline = time.time() + 5
    while threading.active_count() > before and time.time() < deadline:
        time.sleep(0.05)
    assert threading.active_count() <= before


def test_fastmri_dataset_pickles(tmp_path):
    """The dataset ships to worker processes (h5py handle re-imported)."""
    import pickle

    from im2im_uq_tpu.data.fastmri import FastMRIDataset, write_synthetic_volume

    write_synthetic_volume(str(tmp_path / "v.h5"), num_slices=4,
                           enc_shape=(64, 40), recon_shape=(32, 32), seed=0)
    ds = FastMRIDataset(str(tmp_path), normalize_input="standard",
                        normalize_output="min-max",
                        mask_info={"type": "equispaced",
                                   "center_fraction": [0.08],
                                   "acceleration": [4]})
    clone = pickle.loads(pickle.dumps(ds))
    x0, y0 = clone[0]
    assert x0.shape == (32, 32, 1) and y0.shape == (32, 32, 1)


def test_process_pool_fetcher_matches_sequential(tmp_path):
    from im2im_uq_tpu.data.core import ProcessPoolFetcher, iterate_batches
    from im2im_uq_tpu.data.synthetic import SyntheticDataset

    ds = SyntheticDataset(num_examples=10, image_size=16, seed=3)
    seq = list(iterate_batches(ds, 4, shuffle=False))
    with ProcessPoolFetcher(ds, num_procs=2) as fetcher:
        par = list(iterate_batches(ds, 4, shuffle=False, fetcher=fetcher))
    assert len(seq) == len(par)
    for (xa, ya, ma), (xb, yb, mb) in zip(seq, par):
        np.testing.assert_array_equal(xa, xb)
        np.testing.assert_array_equal(ya, yb)
        np.testing.assert_array_equal(ma, mb)


def test_train_net_with_loader_procs(tmp_path):
    """train_net(loader_procs=2) produces the same parameters as the
    sequential loader (same data order, worker processes only fetch)."""
    import jax
    import jax.numpy as jnp

    from im2im_uq_tpu.data.synthetic import SyntheticDataset
    from im2im_uq_tpu.models.assembly import add_uncertainty, build_trunk
    from im2im_uq_tpu.training.train import train_net

    cfg = {
        "dataset": "synthetic", "model": "UNet", "uncertainty_type": "quantiles",
        "batch_size": 4, "lr": 1e-3, "epochs": 1, "input_normalization": "standard",
        "output_normalization": "min-max", "q_lo": 0.05, "q_hi": 0.95,
        "q_lo_weight": 1.0, "q_hi_weight": 1.0, "mse_weight": 1.0,
    }
    ds = SyntheticDataset(num_examples=8, image_size=16, seed=0)

    def fresh():
        return add_uncertainty(build_trunk(cfg), cfg, rng=jax.random.key(0),
                               example_input=jnp.zeros((1, 16, 16, 1)))

    ref = train_net(fresh(), ds, ds, None, epochs=1, batch_size=4, lr=1e-3,
                    validate_every=10, config=cfg)
    par = train_net(fresh(), ds, ds, None, epochs=1, batch_size=4, lr=1e-3,
                    validate_every=10, config=dict(cfg, loader_procs=2))
    np.testing.assert_allclose(
        np.asarray(par.variables["params"]["trunk"]["inc"]["conv0"]["kernel"]),
        np.asarray(ref.variables["params"]["trunk"]["inc"]["conv0"]["kernel"]),
        rtol=1e-6, atol=1e-7,
    )
