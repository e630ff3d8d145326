"""Batch inference / serving CLI: checkpoint + λ̂ → calibrated intervals.

The reference has no standalone prediction entry point — calibrated
intervals only materialize inside eval (reference: core/scripts/eval.py:24-84
renders them to wandb images; core/models/add_uncertainty.py:40-46 is the
``nested_sets`` API). This CLI is the production-serving counterpart: load a
training checkpoint (params + batch stats + calibrated λ̂), compile ONE
fixed-shape nested-sets program, and stream inputs through it — fixed
batch shapes (padded tail) so the program never recompiles — writing one
``.npz`` (lower / prediction / upper, plus λ̂ metadata) per input file.

Usage:
    python -m im2im_uq_tpu.scripts.infer \
        --config experiments/synthetic_test/config.yml \
        --checkpoint output/checkpoints/CP_epoch10_... .msgpack \
        --input inputs.npy --output out/ [--lam 2.5] [--batch-size 32]

Inputs: a ``.npy``/``.npz`` array of shape (N, H, W, C) or (H, W, C), or a
directory of such files (sorted order). Inputs are assumed normalized the
same way the model was trained (the router's normalization stage,
data/normalize.py, owns that contract).
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys
import time
from pathlib import Path
from typing import Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np

from im2im_uq_tpu.models.assembly import UQState, add_uncertainty, build_trunk
from im2im_uq_tpu.utils.config import DEFAULTS, load_config

__all__ = ["load_uq_state_for_inference", "predict_intervals", "main"]


def load_uq_state_for_inference(config: dict, checkpoint: str) -> UQState:
    """Rebuild the model from config and restore (params, batch_stats, λ̂).

    The checkpoint layout is the training layout (training/checkpoint.py);
    the opt_state is restored structurally and discarded — serving never
    touches it.
    """
    import optax

    from im2im_uq_tpu.training.checkpoint import restore_checkpoint
    from im2im_uq_tpu.training.train import TrainState

    num_inputs = int(config.get("num_inputs", 1))
    x0 = jnp.zeros((1, 64, 64, num_inputs), jnp.float32)
    state = add_uncertainty(
        build_trunk(config), config, rng=jax.random.key(0), example_input=x0
    )
    tx = optax.adam(float(config.get("lr", 1e-3)))
    ts = TrainState(
        params=state.variables["params"],
        batch_stats=state.variables.get("batch_stats", {}),
        opt_state=tx.init(state.variables["params"]),
        step=jnp.zeros((), jnp.int32),
    )
    ts, lhat, _epoch = restore_checkpoint(checkpoint, ts)
    return state.replace(
        variables={"params": ts.params, "batch_stats": ts.batch_stats}, lhat=lhat
    )


def _iter_input_arrays(path: str) -> Iterator[tuple[str, np.ndarray]]:
    """Yield (name, (N,H,W,C) float32 array) from a file or directory."""
    p = Path(os.path.expanduser(path))
    files = (
        sorted(q for q in p.iterdir() if q.suffix in (".npy", ".npz"))
        if p.is_dir()
        else [p]
    )
    if not files:
        raise FileNotFoundError(f"no .npy/.npz inputs under {path}")
    seen: set[str] = set()
    for f in files:
        if f.suffix == ".npz":
            with np.load(f) as z:
                arr = z[z.files[0]]
        else:
            arr = np.load(f)
        arr = np.asarray(arr, np.float32)
        if arr.ndim == 3:
            arr = arr[None]
        if arr.ndim != 4:
            raise ValueError(f"{f}: expected (N,H,W,C) or (H,W,C), got {arr.shape}")
        if arr.shape[0] == 0:
            raise ValueError(f"{f}: contains no images (shape {arr.shape})")
        # 'a.npy' and 'a.npz' in one directory must not collide on 'a'
        name = f.stem if f.stem not in seen else f.stem + f.suffix.replace(".", "_")
        seen.add(name)
        yield name, arr


def predict_intervals(
    state: UQState,
    inputs: np.ndarray,
    batch_size: int = 32,
    lam: Optional[float] = None,
    mesh=None,
) -> dict[str, np.ndarray]:
    """Run calibrated nested-sets over (N,H,W,C) inputs at fixed batch shape.

    Returns {"lower", "prediction", "upper"} stacked to (N,H,W,C). The tail
    batch is zero-padded to keep one compiled program (eval mode: BatchNorm
    uses running stats, so padding never contaminates real outputs).

    With ``mesh`` (a ``jax.sharding.Mesh`` with a ``data`` axis), the batch
    is sharded over the mesh and the forward runs data-parallel under GSPMD
    — the pod-serving counterpart of calibration's mesh path
    (calibration/rcps.py ``compute_risks_device``). Eval-mode BatchNorm uses
    running statistics, so per-shard results are exactly the single-device
    results. ``batch_size`` is rounded up to a mesh multiple.
    """
    if mesh is not None:
        from im2im_uq_tpu.parallel.mesh import (
            batch_sharding,
            fetch,
            mesh_batch_size,
            put_batch,
            replicate_tree,
        )

        batch_size = mesh_batch_size(batch_size, mesh)
        state = state.replace(variables=replicate_tree(mesh, state.variables))
        sharding = batch_sharding(mesh)

    n = inputs.shape[0]
    if n == 0:
        empty = np.zeros(inputs.shape, np.float32)
        return {"lower": empty, "prediction": empty.copy(), "upper": empty.copy()}
    lowers, preds, uppers = [], [], []
    multiproc = jax.process_count() > 1

    def _drain(pending):
        (lo, pred, hi), real = pending
        if mesh is not None and multiproc:
            lo, pred, hi = fetch((lo, pred, hi))
        lowers.append(np.asarray(lo[:real]))
        preds.append(np.asarray(pred[:real]))
        uppers.append(np.asarray(hi[:real]))

    # One-batch pipeline: JAX dispatch is async, so issuing batch k+1 before
    # pulling batch k's outputs to host overlaps device compute with the
    # device→host transfer (np.asarray blocks until the batch finishes).
    pending = None
    for start in range(0, n, batch_size):
        chunk = inputs[start : start + batch_size]
        real = chunk.shape[0]
        if real < batch_size:
            pad = np.zeros((batch_size - real, *chunk.shape[1:]), chunk.dtype)
            chunk = np.concatenate([chunk, pad], axis=0)
        if mesh is None:
            xb = jnp.asarray(chunk)
        elif multiproc:
            (xb,) = put_batch(mesh, chunk)
        else:
            xb = jax.device_put(chunk, sharding)
        # mesh is part of the jitted program's cache key, baking the
        # per-shard Pallas resize island in (a bare pallas_call under GSPMD
        # is all-gathered) — see models/assembly._jitted_nested_sets
        out = state.nested_sets(xb, lam=lam, mesh=mesh)
        if pending is not None:
            _drain(pending)
        pending = (out, real)
    _drain(pending)
    return {
        "lower": np.concatenate(lowers, axis=0),
        "prediction": np.concatenate(preds, axis=0),
        "upper": np.concatenate(uppers, axis=0),
    }


def predict_intervals_spatial(
    state: UQState,
    inputs: np.ndarray,
    mesh,
    lam: Optional[float] = None,
) -> dict[str, np.ndarray]:
    """Calibrated nested-sets with each image's HEIGHT axis mesh-sharded.

    The giant-tile serving path (parallel/spatial.py): for (N,H,W,C) inputs
    whose activations exceed one chip's HBM, shard H across the mesh —
    GSPMD inserts the conv/pool/resize halo exchanges, so outputs equal the
    single-device forward bit-for-bit. Images run one at a time (batch has
    nothing to split when one tile fills the mesh).
    """
    from im2im_uq_tpu.parallel.mesh import replicate_tree
    from im2im_uq_tpu.parallel.spatial import spatial_nested_sets

    state = state.replace(variables=replicate_tree(mesh, state.variables))
    fn = spatial_nested_sets(state, mesh, lam=lam)
    lowers, preds, uppers = [], [], []
    pending = None

    def _drain(out):
        lo, pred, hi = out
        lowers.append(np.asarray(lo))
        preds.append(np.asarray(pred))
        uppers.append(np.asarray(hi))

    for i in range(inputs.shape[0]):
        out = fn(jnp.asarray(inputs[i : i + 1]))
        if pending is not None:
            _drain(pending)
        pending = out
    if pending is not None:
        _drain(pending)
    empty = np.zeros(inputs.shape, np.float32)
    return {
        "lower": np.concatenate(lowers, axis=0) if lowers else empty,
        "prediction": np.concatenate(preds, axis=0) if preds else empty.copy(),
        "upper": np.concatenate(uppers, axis=0) if uppers else empty.copy(),
    }


def main(argv: Optional[list[str]] = None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--config", help="experiment config YAML")
    ap.add_argument("--checkpoint", help="training checkpoint (.msgpack)")
    ap.add_argument(
        "--artifact",
        help="AOT serving artifact (scripts.export_serving) — replaces "
        "--config/--checkpoint; λ̂ and batch shape are baked in",
    )
    ap.add_argument("--input", required=True, help=".npy/.npz file or directory")
    ap.add_argument("--output", required=True, help="output directory for .npz results")
    # sentinel default: `args.batch_size is None` means "not passed", which
    # is robust to every argparse spelling (--batch-size N, --batch-size=N,
    # any unambiguous abbreviation) without scanning argv
    ap.add_argument("--batch-size", type=int, default=None,
                    help="serving batch shape (default 32)")
    ap.add_argument(
        "--lam",
        type=float,
        default=None,
        help="interval scale λ override (default: the checkpoint's calibrated λ̂)",
    )
    ap.add_argument(
        "--grid-index",
        type=int,
        default=0,
        help="which grid point of a sweep config describes the checkpointed model",
    )
    ap.add_argument(
        "--data-parallel",
        action="store_true",
        help="shard batches over all visible devices (jax.sharding.Mesh); "
        "single-device runs are unaffected",
    )
    ap.add_argument(
        "--spatial",
        action="store_true",
        help="shard each image's HEIGHT axis over the mesh instead of the "
        "batch axis (giant tiles that exceed one chip's HBM; images run "
        "one at a time, GSPMD inserts the conv halo exchanges)",
    )
    args = ap.parse_args(argv)

    if bool(args.artifact) == bool(args.config or args.checkpoint):
        raise SystemExit("pass either --artifact OR --config + --checkpoint")
    if args.data_parallel and args.spatial:
        raise SystemExit("--data-parallel and --spatial are mutually exclusive")

    mesh = None
    if (args.data_parallel or args.spatial) and jax.device_count() > 1:
        if args.artifact:
            raise SystemExit(
                "--data-parallel/--spatial only apply to --config/--checkpoint "
                "serving: an artifact's sharding is baked in at export time. "
                "For a data-parallel artifact, re-export with "
                "`export_serving --n-devices N` (it auto-shards at load); "
                "otherwise serve per-chip processes."
            )
        from im2im_uq_tpu.parallel.mesh import data_parallel_mesh

        mesh = data_parallel_mesh()

    if args.artifact:
        from im2im_uq_tpu.scripts.export_serving import load_serving_artifact

        state = load_serving_artifact(args.artifact)
        if args.lam is not None and abs(args.lam - state.lhat) > 1e-9:
            raise SystemExit(
                f"--lam {args.lam} conflicts with the artifact's baked "
                f"λ̂={state.lhat} — re-export to change λ"
            )
        lam = state.lhat
        if args.batch_size is not None and args.batch_size != state.batch_size:
            print(
                f"warning: --batch-size {args.batch_size} ignored — the "
                f"artifact's program has a fixed batch shape of "
                f"{state.batch_size} (baked at export time)",
                file=sys.stderr,
            )
        args.batch_size = state.batch_size  # the program's fixed batch shape
        utype = state.uncertainty_type
    else:
        if not (args.config and args.checkpoint):
            raise SystemExit("--config and --checkpoint are both required")
        config = dict(DEFAULTS)
        config.update(load_config(args.config, grid_index=args.grid_index)[0])
        state = load_uq_state_for_inference(
            config, os.path.expanduser(args.checkpoint)
        )
        lam = args.lam if args.lam is not None else state.lhat
        utype = config["uncertainty_type"]
    if lam is None:
        raise SystemExit(
            "checkpoint has no calibrated λ̂ — pass --lam or calibrate first"
        )
    if args.batch_size is None:
        args.batch_size = 32

    out_dir = Path(os.path.expanduser(args.output))
    out_dir.mkdir(parents=True, exist_ok=True)
    total, t0 = 0, time.perf_counter()
    for name, arr in _iter_input_arrays(args.input):
        if args.spatial and mesh is not None:
            result = predict_intervals_spatial(state, arr, mesh, lam=lam)
        else:
            result = predict_intervals(
                state, arr, args.batch_size, lam=lam, mesh=mesh
            )
        out = out_dir / f"{name}_intervals.npz"
        np.savez(out, lam=np.float64(lam), **result)
        total += arr.shape[0]
        print(f"{out}  ({arr.shape[0]} images)")
    dt = time.perf_counter() - t0
    summary = {
        "images": total,
        "seconds": round(dt, 3),
        "imgs_per_sec": round(total / dt, 2) if dt > 0 else math.inf,
        "lam": lam,
        "uncertainty_type": utype,
    }
    with open(out_dir / "inference_summary.json", "w") as fh:
        json.dump(summary, fh)
    print(json.dumps(summary))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
