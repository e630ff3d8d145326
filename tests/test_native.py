"""Native C++ patch ops: build (if toolchain present) and parity vs numpy."""

import numpy as np
import pytest

from im2im_uq_tpu.data.temca import nearest_upsample


@pytest.fixture(scope="module")
def patchops():
    import im2im_uq_tpu.native as native

    po = native.get_patchops()
    if po is None:
        try:
            native.build(verbose=False)
        except Exception as e:  # no toolchain → numpy fallback is the story
            pytest.skip(f"cannot build native extension: {e}")
        native._tried = False
        po = native.get_patchops()
    if po is None:
        pytest.skip("native extension unavailable")
    return po


def test_extract_patches_matches_numpy(patchops):
    rng = np.random.RandomState(0)
    img = rng.randint(0, 255, size=(96, 128), dtype=np.uint8)
    img[:32, :32] = 0  # fully-zero patch → rejected
    img[32:64, :32] = 0
    img[32:40, :32] = 7  # 75% zeros → kept
    got = patchops.extract_patches(img, 32, 32, 0.85)

    expected = []
    for r in range(3):
        for c in range(4):
            patch = img[r * 32 : (r + 1) * 32, c * 32 : (c + 1) * 32]
            if np.count_nonzero(patch == 0) < 0.85 * 32 * 32:
                expected.append(patch)
    expected = np.stack(expected)
    np.testing.assert_array_equal(got, expected)


@pytest.mark.parametrize("mode,name", [(0, "01"), (1, "-11"), (2, None)])
def test_make_pair_matches_numpy(patchops, mode, name):
    rng = np.random.RandomState(1)
    patch = rng.randint(0, 255, size=(32, 48), dtype=np.uint8)
    low, high = patchops.make_pair(patch, 4, 3, mode)

    gt = patch.astype(np.float32)
    if name == "01":
        gt = gt / 255.0
    elif name == "-11":
        gt = 2.0 * (gt / 255.0 - 0.5)
    exp_low = nearest_upsample(gt[::4, ::3], (32, 48))
    np.testing.assert_array_equal(high[..., 0], gt)
    np.testing.assert_array_equal(low[..., 0], exp_low)


def test_temca_native_path_equals_fallback(tmp_path, patchops):
    """The whole TEMCA stream must be identical with and without the
    extension (same RNG consumption, same values)."""
    import random

    from PIL import Image

    from im2im_uq_tpu.data import temca as temca_mod

    rng = np.random.RandomState(0)
    for i in range(2):
        Image.fromarray(
            rng.randint(1, 255, size=(64, 64), dtype=np.uint8), mode="L"
        ).save(tmp_path / f"t{i}.png")

    def run(force_numpy):
        orig = temca_mod._native_patchops
        if force_numpy:
            temca_mod._native_patchops = lambda: None
        try:
            random.seed(3)
            ds = temca_mod.TEMCADataset(
                str(tmp_path) + "/", patch_size=(32, 32), downsampling=(2, 2),
                buffer_size=1, normalize="-11",
            )
            return list(ds)
        finally:
            temca_mod._native_patchops = orig

    native_pairs = run(force_numpy=False)
    numpy_pairs = run(force_numpy=True)
    assert len(native_pairs) == len(numpy_pairs) > 0
    for (ln, hn), (lf, hf) in zip(native_pairs, numpy_pairs):
        np.testing.assert_array_equal(ln, lf)
        np.testing.assert_array_equal(hn, hf)
