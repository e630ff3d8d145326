"""SliceDataset / CombinedSliceDataset / fetch_dir / CIFAR10 behaviors."""

import pickle
import random

import numpy as np
import pytest

from im2im_uq_tpu.data.cifar10 import CIFAR10Dataset
from im2im_uq_tpu.data.fastmri import write_synthetic_volume
from im2im_uq_tpu.data.mri_data import CombinedSliceDataset, SliceDataset, fetch_dir


@pytest.fixture()
def volume_dir(tmp_path):
    d = tmp_path / "vols"
    d.mkdir()
    for i in range(3):
        write_synthetic_volume(str(d / f"vol{i}.h5"), num_slices=4, seed=i)
    return d


def test_slice_dataset_basic(volume_dir):
    ds = SliceDataset(volume_dir, challenge="singlecoil")
    assert len(ds) == 12
    kspace, mask, target, attrs, fname, sl = ds[0]
    assert kspace.ndim == 2 and np.iscomplexobj(kspace)
    assert mask is None
    assert target.shape == (32, 32)
    assert attrs["recon_size"][0] == 32 and "padding_left" in attrs
    assert fname == "vol0.h5" and sl == 0


def test_slice_dataset_metadata_cache(volume_dir, tmp_path):
    cache = tmp_path / "cache.pkl"
    ds = SliceDataset(volume_dir, challenge="singlecoil", use_dataset_cache=True,
                      dataset_cache_file=cache)
    assert cache.exists()
    cached = pickle.load(open(cache, "rb"))
    assert volume_dir in cached and len(cached[volume_dir]) == 12
    # second construction loads from the cache
    ds2 = SliceDataset(volume_dir, challenge="singlecoil", use_dataset_cache=True,
                       dataset_cache_file=cache)
    assert [e[1] for e in ds2.examples] == [e[1] for e in ds.examples]


def test_slice_dataset_sample_rates(volume_dir):
    random.seed(0)
    half = SliceDataset(volume_dir, challenge="singlecoil", sample_rate=0.5)
    assert len(half) == 6
    random.seed(0)
    vols = SliceDataset(volume_dir, challenge="singlecoil", volume_sample_rate=0.34)
    assert len(vols) == 4  # one of three volumes
    assert len({e[0].stem for e in vols.examples}) == 1
    with pytest.raises(ValueError):
        SliceDataset(volume_dir, challenge="singlecoil", sample_rate=0.5,
                     volume_sample_rate=0.5)
    with pytest.raises(ValueError):
        SliceDataset(volume_dir, challenge="bogus")


def test_slice_dataset_num_cols_filter(volume_dir):
    keep = SliceDataset(volume_dir, challenge="singlecoil", num_cols=(40,))
    assert len(keep) == 12  # synthetic volumes encode y=40
    none = SliceDataset(volume_dir, challenge="singlecoil", num_cols=(999,))
    assert len(none) == 0


def test_combined_slice_dataset(volume_dir, tmp_path):
    d2 = tmp_path / "vols2"
    d2.mkdir()
    write_synthetic_volume(str(d2 / "a.h5"), num_slices=2, seed=9)
    ds = CombinedSliceDataset([volume_dir, d2], ["singlecoil", "singlecoil"])
    assert len(ds) == 14
    assert ds[12][4] == "a.h5"  # index falls through to the second dataset
    with pytest.raises(IndexError):
        ds[14]


def test_fetch_dir(tmp_path):
    cfg = tmp_path / "dirs.yaml"
    with pytest.warns(UserWarning):
        p = fetch_dir("knee_path", cfg)
    assert str(p) == "/path/to/knee" and cfg.exists()
    cfg.write_text("knee_path: /data/knee\nbrain_path: /b\nlog_path: .\n")
    assert str(fetch_dir("knee_path", cfg)) == "/data/knee"


def test_cifar10_local_batches(tmp_path):
    base = tmp_path / "cifar-10-batches-py"
    base.mkdir()
    rng = np.random.RandomState(0)
    for i in range(1, 6):
        with open(base / f"data_batch_{i}", "wb") as fh:
            pickle.dump({b"data": rng.randint(0, 255, size=(5, 3072), dtype=np.uint8)}, fh)
    ds = CIFAR10Dataset(str(tmp_path), noise_std=0.1)
    assert len(ds) == 25
    x, y = ds[3]
    assert x.shape == (32, 32, 3) and y.shape == (32, 32, 3)
    assert 0 <= y.min() and y.max() <= 1.0
    x2, _ = ds[3]
    np.testing.assert_array_equal(x, x2)  # per-index noise is deterministic
    with pytest.raises(FileNotFoundError):
        CIFAR10Dataset(str(tmp_path / "missing"))
