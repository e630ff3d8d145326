"""Calibrate-only CLI: re-run RCPS on an existing checkpoint, no retraining.

The reference couples calibration to the full router run (reference:
core/scripts/router.py:106-144 — train, then calibrate_model in-process);
re-calibrating a trained model on fresh data requires re-running the whole
experiment. In production the natural workflow is train once → re-calibrate
per deployment/distribution-shift audit → serve, so this CLI runs the RCPS
grid search (calibration/rcps.py — identical reference semantics: descend
the λ grid, loss at λ−dλ, HB/WSR bound, stop rule) against any checkpoint
and writes:

- a λ̂-bearing calibrated checkpoint (``CP_calibrated_<key>.msgpack``, the
  artifact ``scripts.infer`` serves from), and
- the (N, num_lambdas) calibration loss table (``.npz``) for risk audits
  (e.g. evaluate_from_loss_table re-splits).

Usage:
    python -m im2im_uq_tpu.scripts.calibrate \
        --config experiments/fastmri_test/config.yml \
        --checkpoint ckpts/CP_epoch10_... .msgpack \
        --output-dir out/ [--data-path ...] [--alpha 0.1] [--delta 0.1] \
        [--calib-fraction 1.0] [--seed 0]

By default the whole dataset is used for calibration (this CLI exists to
calibrate on dedicated calibration data); pass --calib-fraction to use a
random subset.
"""

from __future__ import annotations

import argparse
import json
import os
import time
from pathlib import Path
from typing import Optional

import numpy as np

from im2im_uq_tpu.utils.config import DEFAULTS, load_config

__all__ = ["main"]


def main(argv: Optional[list[str]] = None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--config", required=True, help="experiment config YAML")
    ap.add_argument("--checkpoint", required=True, help="checkpoint to calibrate (.msgpack)")
    ap.add_argument("--output-dir", required=True)
    ap.add_argument("--data-path", default=None, help="override config data_path")
    ap.add_argument("--alpha", type=float, default=None, help="override risk level α")
    ap.add_argument("--delta", type=float, default=None, help="override confidence δ")
    ap.add_argument("--batch-size", type=int, default=None)
    ap.add_argument(
        "--calib-fraction",
        type=float,
        default=1.0,
        help="random fraction of the dataset to calibrate on (default: all)",
    )
    ap.add_argument("--grid-index", type=int, default=0)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args(argv)

    # defer jax-importing modules until after arg parsing
    from im2im_uq_tpu.calibration.rcps import calibrate_model
    from im2im_uq_tpu.data.core import random_split, split_lengths
    from im2im_uq_tpu.parallel.mesh import data_parallel_mesh
    from im2im_uq_tpu.scripts.infer import load_uq_state_for_inference
    from im2im_uq_tpu.scripts.router import build_dataset
    from im2im_uq_tpu.training.checkpoint import save_calibrated_checkpoint
    from im2im_uq_tpu.utils.random import fix_randomness

    config = dict(DEFAULTS)
    config.update(load_config(args.config, grid_index=args.grid_index)[0])
    if args.data_path:
        config["data_path"] = args.data_path
    if args.alpha is not None:
        config["alpha"] = args.alpha
    if args.delta is not None:
        config["delta"] = args.delta
    fix_randomness(args.seed)

    state = load_uq_state_for_inference(config, os.path.expanduser(args.checkpoint))
    dataset = build_dataset(config)
    if args.calib_fraction < 1.0 and hasattr(dataset, "__len__"):
        keep, _ = split_lengths(len(dataset), [args.calib_fraction, 1 - args.calib_fraction])
        dataset = random_split(
            dataset, [keep, len(dataset) - keep], np.random.RandomState(args.seed)
        )[0]

    mesh = data_parallel_mesh()
    t0 = time.perf_counter()
    state, loss_table = calibrate_model(
        state,
        dataset,
        config,
        mesh=mesh,
        batch_size=args.batch_size or config.get("batch_size", 32),
    )
    calib_seconds = time.perf_counter() - t0

    out_dir = Path(os.path.expanduser(args.output_dir))
    out_dir.mkdir(parents=True, exist_ok=True)
    ckpt_path = save_calibrated_checkpoint(state, config, str(out_dir))

    table_path = out_dir / "calibration_loss_table.npz"
    np.savez(table_path, loss_table=np.asarray(loss_table))

    n = loss_table.shape[0]
    summary = {
        "lhat": state.lhat,
        "alpha": config["alpha"],
        "delta": config["delta"],
        "num_calibration_examples": int(n),
        "num_lambdas": int(loss_table.shape[1]),
        "calibration_seconds": round(calib_seconds, 3),
        "checkpoint": ckpt_path,
        "loss_table": str(table_path),
    }
    with open(out_dir / "calibration_summary.json", "w") as fh:
        json.dump(summary, fh)
    print(json.dumps(summary))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
