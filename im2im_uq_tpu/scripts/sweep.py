"""Sweep runner: execute every grid point of a sweep config.

Counterpart of the reference's wandb-agent orchestration (reference:
README.md:26-34 — ``wandb sweep config.yml`` + agents, one router process
per grid point). Runs grid points as subprocesses (isolation parity: a
crashing point doesn't kill the sweep; results-pickle idempotence makes
reruns resume). ``--jobs`` > 1 runs points concurrently — only useful when
each point targets a different accelerator or is CPU-bound; a single TPU
serializes them anyway.

    python -m im2im_uq_tpu.scripts.sweep --config experiments/fastmri_test/config.yml
"""

from __future__ import annotations

import argparse
import concurrent.futures
import subprocess
import sys

from im2im_uq_tpu.utils.config import load_config

__all__ = ["main"]


def _run_point(config_path: str, index: int, extra: list[str]) -> int:
    cmd = [
        sys.executable,
        "-m",
        "im2im_uq_tpu.scripts.router",
        "--config",
        config_path,
        "--grid-index",
        str(index),
        *extra,
    ]
    print(f"[sweep] point {index}: {' '.join(cmd)}")
    return subprocess.call(cmd)


def main(argv=None) -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--config", required=True)
    parser.add_argument("--jobs", type=int, default=1)
    parser.add_argument("--data-path", default=None)
    parser.add_argument("--output-dir", default=None)
    args = parser.parse_args(argv)

    grid = load_config(args.config)
    extra = []
    if args.data_path:
        extra += ["--data-path", args.data_path]
    if args.output_dir:
        extra += ["--output-dir", args.output_dir]

    print(f"[sweep] {len(grid)} grid point(s), jobs={args.jobs}")
    failures = []
    if args.jobs <= 1:
        for i in range(len(grid)):
            if _run_point(args.config, i, extra) != 0:
                failures.append(i)
    else:
        with concurrent.futures.ThreadPoolExecutor(args.jobs) as pool:
            futs = {
                pool.submit(_run_point, args.config, i, extra): i
                for i in range(len(grid))
            }
            for fut in concurrent.futures.as_completed(futs):
                if fut.result() != 0:
                    failures.append(futs[fut])
    if failures:
        print(f"[sweep] FAILED points: {sorted(failures)}")
        sys.exit(1)
    print("[sweep] all points complete")


if __name__ == "__main__":
    main()
