"""TEMCA electron-microscopy tile dataset: buffered streaming patch pipeline.

Counterpart of the reference TEMCA loader (reference: core/datasets/temca/
TEMCADataset.py:19-92): glob PNG tiles, stream ``buffer_size`` images at a
time, grid-slice each into ``patch_size`` patches rejecting patches that are
≥85% zeros (the condition as written keeps patches whose zero-count is
< 0.85·area — preserved), shuffle the patch buffer, then yield
(low-res input, high-res target) pairs where the input is a strided
downsample nearest-upsampled back to the patch size (the reference's
nn.Upsample default mode). ``reset()`` rewinds the stream; the router splits
by partitioning ``img_paths`` across copies (reference router.py:90-100),
exposed here as ``split_by_paths``.

Emits NHWC (H, W, 1) float32 pairs (the reference yields (1, H, W) CHW).
"""

from __future__ import annotations

import copy
import random
from glob import glob
from typing import Iterator, Sequence

import numpy as np

__all__ = ["TEMCADataset", "nearest_upsample"]

_NORM_MODES = {"01": 0, "-11": 1, None: 2, "none": 2}


def _native_patchops():
    """The C++ patch-op module when built, else None (numpy fallback)."""
    try:
        from im2im_uq_tpu.native import get_patchops

        return get_patchops()
    except Exception:
        return None


def nearest_upsample(x: np.ndarray, out_hw: tuple[int, int]) -> np.ndarray:
    """Nearest-neighbor resize of a 2-D array to ``out_hw``.

    Matches torch nn.Upsample(mode='nearest'): src = floor(dst * in/out).
    """
    h, w = x.shape
    rows = (np.arange(out_hw[0]) * h // out_hw[0]).astype(np.int64)
    cols = (np.arange(out_hw[1]) * w // out_hw[1]).astype(np.int64)
    return x[rows][:, cols]


class TEMCADataset:
    """Iterable dataset of super-resolution patch pairs from giant EM tiles."""

    def __init__(
        self,
        path: str,
        patch_size: Sequence[int],
        downsampling: Sequence[int],
        num_imgs="all",
        buffer_size: int = 10,
        normalize: str | None = "01",
    ):
        print(f"loading dataset from : {path}...")
        self.path = path
        self.output_size = tuple(patch_size)
        self.downsampling = tuple(downsampling)
        self.buffer_size = buffer_size
        self.normalize = normalize
        self.img_index = 0
        self.patch_buffer: list[np.ndarray] = []
        self.norm_params: dict = {}
        self.cache_path = None

        self.return_raw = False  # see device_preprocess_pair

        self.img_paths = sorted(glob(path + "**/*.png", recursive=True))
        random.shuffle(self.img_paths)
        if num_imgs != "all":
            self.img_paths = self.img_paths[: int(num_imgs)]
        print(f"using {len(self.img_paths)} full images")

    # -- streaming machinery -------------------------------------------------

    def reset(self) -> None:
        self.img_index = 0
        self.patch_buffer = []

    def _read_image(self, path: str) -> np.ndarray:
        import imageio

        return np.asarray(imageio.imread(path))

    def _extract_patches(self, img: np.ndarray) -> None:
        ph, pw = self.output_size
        po = _native_patchops()
        if po is not None and img.dtype == np.uint8 and img.ndim == 2:
            # native hot loop (same keep condition and (r, c) order)
            patches = po.extract_patches(np.ascontiguousarray(img), ph, pw, 0.85)
            self.patch_buffer.extend(list(patches))
            return
        for r in range(img.shape[0] // ph):
            for c in range(img.shape[1] // pw):
                patch = img[r * ph : (r + 1) * ph, c * pw : (c + 1) * pw]
                # keep unless ≥85% of pixels are zero (reference TEMCADataset.py:74)
                if np.count_nonzero(patch == 0) < 0.85 * (ph * pw):
                    self.patch_buffer.append(patch)

    def _fill_buffer(self) -> None:
        # Tail-wrap quirk preserved from the reference (TEMCADataset.py:48-51):
        # when buffer_size does not divide the path count, the final fill sets
        # end = len - img_index (not len), so the slice is empty, the cursor
        # wraps, and one "epoch" re-extracts most tiles a second time before
        # terminating. Kept bit-for-bit for epoch-accounting parity.
        if self.img_index + self.buffer_size > len(self.img_paths):
            if len(self.img_paths) - self.img_index > 0:
                end = len(self.img_paths) - self.img_index
            else:
                self.img_index = -1
                return
        else:
            end = self.img_index + self.buffer_size
        for p in self.img_paths[self.img_index : end]:
            self._extract_patches(self._read_image(p))
        random.shuffle(self.patch_buffer)
        self.img_index = end

    def __iter__(self) -> Iterator[tuple[np.ndarray, np.ndarray]]:
        po = _native_patchops()
        mode = _NORM_MODES.get(self.normalize, 2)
        while self.img_index != -1:
            if not self.patch_buffer:
                self._fill_buffer()
            if self.patch_buffer:
                patch = self.patch_buffer.pop()
                if getattr(self, "return_raw", False):
                    # raw-uint8 feed for the on-device transform
                    # (device_preprocess_pair): ship the patch bytes once
                    # as input AND target — normalize + strided downsample
                    # + nearest upsample all run inside the train-step XLA
                    # program, and the host ships 2 uint8 bytes/pixel instead of
                    # 8 (two float32 images — 4× less). The ops/mri_pipeline.py
                    # pattern applied to the TEMCA stream.
                    raw = patch[..., None]
                    yield raw, raw
                    continue
                if po is not None and patch.dtype == np.uint8:
                    # fused native normalize + downsample/upsample pair
                    yield po.make_pair(
                        np.ascontiguousarray(patch),
                        self.downsampling[0],
                        self.downsampling[1],
                        mode,
                    )
                    continue
                gt = patch.astype(np.float32)
                if self.normalize == "01":
                    gt = gt / 255.0
                elif self.normalize == "-11":
                    gt = 2.0 * (gt / 255.0 - 0.5)
                low = gt[:: self.downsampling[0], :: self.downsampling[1]]
                low = nearest_upsample(low, self.output_size)
                yield low[..., None], gt[..., None]
        self.img_index = 0

    def device_preprocess_pair(self):
        """jnp closure reproducing the patch→pair transform ON DEVICE.

        Chip-rate feed path for the TEMCA stream: with ``return_raw`` on,
        the loader ships each uint8 patch once and this closure — passed as
        ``preprocess_pair`` to make_train_step / make_eval_loss_step — does
        the normalize + strided downsample + nearest upsample inside the
        train-step XLA program. The two resamples compose into ONE gather
        (low_up[i,j] = gt[d0·⌊i·h_low/ph⌋, d1·⌊j·w_low/pw⌋]), so the device
        cost is a single elementwise pass + gather; the host cost drops to
        PNG decode + patch slicing (the C++ native/patchops.cpp loop), and
        host→device traffic drops 4× (the uint8 patch rides as input AND
        target, 2 bytes/pixel, vs two float32 images). Semantics match the host path (nearest_upsample + the
        '01'/'-11' normalizations above): the resample indices are exact,
        the normalization agrees to 1 ulp (XLA strength-reduces /255 to a
        reciprocal multiply) — test-pinned in tests/test_temca_device.py.
        """
        import jax.numpy as jnp

        ph, pw = self.output_size
        d0, d1 = self.downsampling
        h_low = len(range(0, ph, d0))
        w_low = len(range(0, pw, d1))
        rows = (np.arange(ph) * h_low // ph) * d0
        cols = (np.arange(pw) * w_low // pw) * d1
        normalize = self.normalize

        def preprocess_pair(x_raw, y_raw):
            gt = y_raw.astype(jnp.float32)
            if normalize == "01":
                gt = gt / 255.0
            elif normalize == "-11":
                gt = 2.0 * (gt / 255.0 - 0.5)
            low = jnp.take(jnp.take(gt, rows, axis=1), cols, axis=2)
            return low, gt

        return preprocess_pair

    # -- router integration --------------------------------------------------

    def split_by_paths(self, percentages: Sequence[float], rng=None):
        """(train, calib, val) copies with partitioned tile paths
        (reference router.py:90-100: rounded lengths, shuffled paths,
        deep copies with path slices)."""
        paths = list(self.img_paths)
        lengths = np.round(len(paths) * np.asarray(percentages)).astype(int)
        lengths[-1] = len(paths) - (lengths.sum() - lengths[-1])
        random.shuffle(paths)
        out = []
        ofs = 0
        for ln in lengths[:3]:
            part = copy.deepcopy(self)
            part.img_paths = paths[ofs : ofs + ln]
            part.reset()
            out.append(part)
            ofs += ln
        return tuple(out)
