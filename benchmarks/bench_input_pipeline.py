"""Host input-pipeline throughput: can the loader feed the chip?

Measures imgs/sec of the threaded prefetch pipeline and (if installed)
the grain pipeline over FastMRI-schema synthetic HDF5 volumes at the
benchmark geometry, end-to-end through the mask/IFFT/crop transform —
the host-side work per training example. Compare against the train
step's device-busy imgs/sec (bench.py extras): the loader must be
faster, or the chip starves.

Usage: PYTHONPATH=/root/repo python benchmarks/bench_input_pipeline.py \
    [batch] [--raw-kspace] [--temca] [--chip-rate N]

``--temca`` measures the TEMCA patch stream instead (320² patches from
synthetic PNG tiles): host-transform mode vs the ``return_raw`` chip-rate
feed (device_preprocess_pair moves normalize + the two resamples into the
train-step program; the host keeps PNG decode + the C++ patch loop only).

``--chip-rate`` (default 254, the v5e bf16 device-busy imgs/s/chip from
bench.py) sizes the host-core budget: this VM is single-core with a CPU
quota, so pipeline-level numbers cannot demonstrate saturation here —
the per-item sequential cost is the stable per-core rate, and the budget
formula ``cores = ceil(chip_rate / per_core_rate)`` is the deployment
answer (real TPU hosts have 100+ cores). The ``loader_procs`` sweep
shows the process-pool scaling machinery works (and where this VM's
quota caps it).
"""

from __future__ import annotations

import math
import os
import sys
import tempfile
import time

import numpy as np


def temca_main(chip_rate: float):
    """TEMCA stream: host-transform vs raw-uint8 feed imgs/sec at 320²."""
    import random

    from im2im_uq_tpu.data.temca import TEMCADataset

    with tempfile.TemporaryDirectory() as td:
        from PIL import Image

        rng = np.random.RandomState(0)
        for i in range(4):
            Image.fromarray(
                rng.randint(1, 255, size=(1280, 1280), dtype=np.uint8),
                mode="L",
            ).save(os.path.join(td, f"tile{i}.png"))
        for raw in (False, True):
            random.seed(0)
            ds = TEMCADataset(td + "/", patch_size=(320, 320),
                              downsampling=(4, 4), buffer_size=2,
                              normalize="01")
            ds.return_raw = raw
            n = sum(1 for _ in ds)  # warmup epoch (fs cache)
            t0 = time.perf_counter()
            for _ in ds:
                pass
            per_core = n / (time.perf_counter() - t0)
            tag = "raw uint8 (on-device transform)" if raw else "host transform"
            cores = math.ceil(chip_rate / per_core)
            print(f"temca stream [{tag}]: {per_core:.1f} imgs/sec/core "
                  f"({n} patches/epoch) -> host-core budget {cores} "
                  f"core(s) at {chip_rate:.0f} imgs/s chip rate")


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 and sys.argv[1].isdigit() else 32
    raw = "--raw-kspace" in sys.argv
    chip_rate = 254.0
    if "--chip-rate" in sys.argv:
        chip_rate = float(sys.argv[sys.argv.index("--chip-rate") + 1])
    if "--temca" in sys.argv:
        temca_main(chip_rate)
        return

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
        per_core = n / (time.perf_counter() - t0)
        print(f"sequential __getitem__: {per_core:.1f} imgs/sec "
              f"({'raw k-space' if raw else 'image transform'})")
        cores = math.ceil(chip_rate / per_core)
        print(f"host-core budget: {cores} core(s) of loader_procs workers "
              f"feed one chip at {chip_rate:.0f} imgs/s "
              f"(= ceil({chip_rate:.0f} / {per_core:.1f} per-core))")

        from im2im_uq_tpu.data.core import ProcessPoolFetcher

        pools = []

        def procs_pipeline(nprocs):
            fetcher = ProcessPoolFetcher(ds, nprocs)
            pools.append(fetcher)

            def it():
                return iterate_batches(ds, batch, shuffle=True,
                                       rng=np.random.RandomState(0),
                                       fetcher=fetcher)

            return it

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
            # the GIL/h5py escape train_net's loader_procs config uses —
            # real scaling needs real cores (this VM has one)
            ("loader_procs=2 pipeline", procs_pipeline(2)),
            ("loader_procs=4 pipeline", procs_pipeline(4)),
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
        for p in pools:
            p.close()


if __name__ == "__main__":
    sys.path.insert(0, "/root/repo")
    main()
