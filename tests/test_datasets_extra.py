"""TEMCA, BSBCM, and volume-sampler behavior tests."""

import numpy as np
import pytest

from im2im_uq_tpu.data.bsbcm import BSBCMDataset
from im2im_uq_tpu.data.temca import TEMCADataset, nearest_upsample
from im2im_uq_tpu.data.volume_sampler import VolumeShardSampler


def _write_tiles(tmp_path, n=3, size=96, zero_heavy=False):
    from PIL import Image

    rng = np.random.RandomState(0)
    for i in range(n):
        img = rng.randint(1, 255, size=(size, size), dtype=np.uint8)
        if zero_heavy and i == 0:
            img[:, :] = 0  # all patches of tile 0 are rejected
        Image.fromarray(img, mode="L").save(tmp_path / f"tile{i}.png")
    return str(tmp_path) + "/"


def test_nearest_upsample_matches_torch():
    import torch

    x = np.random.RandomState(1).rand(9, 13).astype(np.float32)
    for out in [(36, 52), (18, 26), (9, 13)]:
        got = nearest_upsample(x, out)
        exp = torch.nn.Upsample(size=out)(torch.tensor(x)[None, None]).numpy()[0, 0]
        np.testing.assert_array_equal(got, exp)


def test_temca_stream_and_reset(tmp_path):
    path = _write_tiles(tmp_path, n=2, size=96)
    ds = TEMCADataset(path, patch_size=(32, 32), downsampling=(4, 4), buffer_size=1, normalize="01")
    pairs = list(ds)
    assert len(pairs) == 2 * 9  # 3x3 grid per 96x96 tile
    low, high = pairs[0]
    assert low.shape == (32, 32, 1) and high.shape == (32, 32, 1)
    assert 0.0 <= high.min() and high.max() <= 1.0
    # nearest-upsampled input is piecewise constant over 4x4 cells
    assert np.all(low[0:4, 0:4] == low[0, 0])
    # stream restarts cleanly
    pairs2 = list(ds)
    assert len(pairs2) == len(pairs)


def test_temca_zero_patch_rejection(tmp_path):
    path = _write_tiles(tmp_path, n=2, size=64, zero_heavy=True)
    ds = TEMCADataset(path, patch_size=(32, 32), downsampling=(2, 2), buffer_size=2, normalize="01")
    # tile0 is all zeros -> its 4 patches rejected; tile1 contributes 4
    assert len(list(ds)) == 4


def test_temca_minus11_normalization(tmp_path):
    path = _write_tiles(tmp_path, n=1, size=64)
    ds = TEMCADataset(path, patch_size=(32, 32), downsampling=(2, 2), buffer_size=1, normalize="-11")
    _, high = next(iter(ds))
    assert high.min() >= -1.0 and high.max() <= 1.0 and high.min() < 0


def test_temca_split_by_paths(tmp_path):
    path = _write_tiles(tmp_path, n=10, size=64)
    ds = TEMCADataset(path, patch_size=(32, 32), downsampling=(2, 2), buffer_size=2, normalize="01")
    tr, ca, va = ds.split_by_paths([0.6, 0.2, 0.2, 0.0])
    assert len(tr.img_paths) == 6 and len(ca.img_paths) == 2 and len(va.img_paths) == 2
    assert not (set(tr.img_paths) & set(ca.img_paths))
    assert set(tr.img_paths) | set(ca.img_paths) | set(va.img_paths) == set(ds.img_paths)


def test_bsbcm_load_truncate_normalize(tmp_path):
    rng = np.random.RandomState(0)
    x = rng.rand(10, 8, 8, 2).astype(np.float32) * 5
    y = rng.rand(10, 8, 8, 1).astype(np.float32) * 3
    np.save(tmp_path / "X.npy", x)
    np.save(tmp_path / "Y.npy", y)
    ds = BSBCMDataset(str(tmp_path), num_instances=6, normalize="min-max")
    assert len(ds) == 6
    xi, yi = ds[0]
    assert xi.shape == (8, 8, 2) and yi.shape == (8, 8, 1)
    assert ds.params["max_input"] == pytest.approx(x[:6].max())
    assert ds.x.min() == pytest.approx(0.0) and ds.x.max() == pytest.approx(1.0)
    with pytest.raises(ValueError):
        BSBCMDataset(str(tmp_path), num_instances=99)


def test_bsbcm_torch_pth_source(tmp_path):
    import torch

    x = torch.rand(4, 1, 8, 8)  # CHW source gets converted to HWC
    torch.save(x, tmp_path / "X.pth")
    torch.save(x + 1, tmp_path / "Y.pth")
    ds = BSBCMDataset(str(tmp_path), num_instances="all")
    xi, yi = ds[0]
    assert xi.shape == (8, 8, 1)


def test_volume_sampler_contract():
    # 5 volumes with ragged slice counts over 3 shards
    volume_names = (
        ["a.h5"] * 4 + ["b.h5"] * 2 + ["c.h5"] * 5 + ["d.h5"] * 1 + ["e.h5"] * 3
    )
    shards = [VolumeShardSampler(volume_names, 3, k, shuffle=False) for k in range(3)]
    # every shard is padded to the same length
    lengths = {len(s) for s in shards}
    assert len(lengths) == 1
    # volume locality: all indices of one volume on one shard
    for s in shards:
        names = {volume_names[i] for i in s.indices()}
        for other in shards:
            if other is s:
                continue
            assert not (names & {volume_names[i] for i in other._indices})
    # union of unpadded indices covers the dataset
    seen = sorted(i for s in shards for i in s._indices)
    assert seen == list(range(len(volume_names)))
    # epoch-seeded shuffle is deterministic and epoch-dependent
    s = VolumeShardSampler(volume_names, 3, 0, shuffle=True, seed=5)
    e0 = s.indices()
    s.set_epoch(1)
    e1 = s.indices()
    s.set_epoch(0)
    assert s.indices() == e0 and (e0 != e1 or len(e0) <= 1)
