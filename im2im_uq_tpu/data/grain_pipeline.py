"""Optional grain-backed input pipeline.

The default loader (data/core.py) is a threaded prefetcher — enough to feed
one chip. This wraps any map-style dataset of this framework into a grain
pipeline for the extras grain provides: checkpointable iterators (resume
mid-epoch), deterministic global shuffles, worker processes, and per-host
sharding composition for pods. The emitted batches are the same
(x, y, mask) contract as ``iterate_batches`` (mask handles the padded final
batch).
"""

from __future__ import annotations

from typing import Iterator, Optional

import numpy as np

from im2im_uq_tpu.data.core import Batch, pad_batch

__all__ = ["grain_batches", "make_grain_dataset", "CheckpointableBatchIterator"]


def make_grain_dataset(
    dataset,
    batch_size: int,
    *,
    shuffle: bool = False,
    seed: int = 0,
    num_epochs: int = 1,
    shard_index: int = 0,
    shard_count: int = 1,
):
    """A grain.MapDataset pipeline over a map-style (x, y) dataset."""
    import grain.python as grain

    ds = grain.MapDataset.source(dataset)
    if shard_count > 1:
        ds = ds[shard_index::shard_count]
    if shuffle:
        ds = ds.seed(seed).shuffle()
    if num_epochs != 1:
        ds = ds.repeat(num_epochs)
    return ds.batch(batch_size, drop_remainder=False)


def grain_batches(
    dataset,
    batch_size: int,
    *,
    shuffle: bool = False,
    seed: int = 0,
    shard_index: int = 0,
    shard_count: int = 1,
    pad_final: bool = True,
    pad_mode: str = "zeros",
    read_options: Optional[object] = None,
) -> Iterator[Batch]:
    """Yield (x, y, mask) batches through grain, padded to fixed shapes."""
    ds = make_grain_dataset(
        dataset,
        batch_size,
        shuffle=shuffle,
        seed=seed,
        shard_index=shard_index,
        shard_count=shard_count,
    )
    it = ds.to_iter_dataset(read_options=read_options) if read_options else ds
    for xb, yb in it:
        yield pad_batch(np.asarray(xb), np.asarray(yb), batch_size, pad_mode, pad_final)


class CheckpointableBatchIterator:
    """Mid-epoch-resumable (x, y, mask) batch iterator over a grain pipeline.

    ``get_state()`` returns a JSON-serializable dict; a NEW iterator built
    with the same arguments continues from ``set_state(state)`` — the
    mechanism for resuming a long epoch exactly where a preempted run
    stopped (the msgpack/orbax checkpoints cover model state; this covers
    the input pipeline's).
    """

    def __init__(
        self,
        dataset,
        batch_size: int,
        *,
        shuffle: bool = False,
        seed: int = 0,
        num_epochs: int = 1,
        shard_index: int = 0,
        shard_count: int = 1,
        pad_final: bool = True,
        pad_mode: str = "zeros",
    ):
        ds = make_grain_dataset(
            dataset,
            batch_size,
            shuffle=shuffle,
            seed=seed,
            num_epochs=num_epochs,
            shard_index=shard_index,
            shard_count=shard_count,
        )
        self._batch_size = batch_size
        self._pad_final = pad_final
        self._pad_mode = pad_mode
        self._it = iter(ds.to_iter_dataset())

    def get_state(self) -> dict:
        return self._it.get_state()

    def set_state(self, state: dict) -> None:
        self._it.set_state(state)

    def __iter__(self):
        return self

    def __next__(self) -> Batch:
        xb, yb = next(self._it)
        return pad_batch(
            np.asarray(xb), np.asarray(yb), self._batch_size,
            self._pad_mode, self._pad_final,
        )
