"""Host input-pipeline throughput: can the loader feed the chip?

Measures imgs/sec of the threaded prefetch pipeline and (if installed)
the grain pipeline over FastMRI-schema synthetic HDF5 volumes at the
benchmark geometry, end-to-end through the mask/IFFT/crop transform —
the host-side work per training example. Compare against the train
step's device-busy imgs/sec (bench.py extras): the loader must be
faster, or the chip starves.

Usage: PYTHONPATH=/root/repo python benchmarks/bench_input_pipeline.py [batch] [--raw-kspace]
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

import numpy as np


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 and sys.argv[1].isdigit() else 32
    raw = "--raw-kspace" in sys.argv

    from im2im_uq_tpu.data.core import iterate_batches
    from im2im_uq_tpu.data.fastmri import FastMRIDataset, write_synthetic_volume

    with tempfile.TemporaryDirectory() as td:
        for i in range(4):
            write_synthetic_volume(
                os.path.join(td, f"vol{i}.h5"),
                num_slices=16,
                enc_shape=(640, 368),
                recon_shape=(320, 320),
                seed=i,
            )
        ds = FastMRIDataset(
            td,
            normalize_input="standard",
            normalize_output="min-max",
            mask_info={"type": "equispaced", "center_fraction": [0.08],
                       "acceleration": [4]},
            return_kspace=raw,
        )
        n = len(ds)
        _ = ds[0]  # warm metadata caches

        # per-item sequential cost first: the stable metric on this host
        # (pipeline-level numbers swing with the VM's CPU-quota throttling)
        t0 = time.perf_counter()
        for i in range(n):
            _ = ds[i]
        print(f"sequential __getitem__: {n / (time.perf_counter() - t0):.1f} imgs/sec "
              f"({'raw k-space' if raw else 'image transform'})")

        for name, it in (
            # default pipeline: sequential fetch on the producer thread
            ("sequential-fetch pipeline",
             lambda: iterate_batches(ds, batch, shuffle=True,
                                     rng=np.random.RandomState(0))),
            # opt-in thread pool — kept measurable so the num_threads=0
            # default's evidence (h5py lock + GIL make threads SLOWER)
            # stays reproducible
            ("thread-pool pipeline (num_threads=8)",
             lambda: iterate_batches(ds, batch, shuffle=True, num_threads=8,
                                     rng=np.random.RandomState(0))),
            ("grain", None),
        ):
            if name == "grain":
                try:
                    from im2im_uq_tpu.data.grain_pipeline import grain_batches
                except ImportError:
                    print("grain: not installed, skipped")
                    continue
                it = lambda: grain_batches(ds, batch, shuffle=True, seed=0)  # noqa: E731
            # one warmup epoch, then timed epochs
            for b in it():
                pass
            imgs, t0 = 0, time.perf_counter()
            for _ in range(3):
                for x, y, m in it():
                    imgs += int(m.sum())
            dt = time.perf_counter() - t0
            print(f"{name}: {imgs / dt:.1f} imgs/sec host-side "
                  f"({n} slices x 3 epochs, batch {batch}, "
                  f"{'raw k-space' if raw else 'image transform'})")


if __name__ == "__main__":
    sys.path.insert(0, "/root/repo")
    main()
