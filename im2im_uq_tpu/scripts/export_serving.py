"""AOT serving-artifact export: checkpoint + λ̂ → one self-contained file.

The reference ships models as whole-module torch pickles that need the
full source tree to unpickle (reference: core/scripts/train.py:183-195);
serving a calibrated model means carrying the repo. This CLI compiles the
calibrated nested-sets program (trunk → head → λ̂-scaled interval algebra,
reference: core/models/add_uncertainty.py:40-46) AHEAD OF TIME with
``jax.export``: parameters, batch statistics, and the calibrated λ̂ are
baked into one serialized StableHLO module with a stable versioned calling
convention. The resulting ``.npz`` artifact

  * needs NO model code to run — only jax (``load_serving_artifact``),
  * is cross-platform: exported once (even on a CPU host), it executes on
    any of the requested platforms (default ``cpu,tpu``) — build artifacts
    on CI, serve them on the pod,
  * is tamper-stable: λ̂ is part of the program, so the serving fleet
    cannot accidentally run uncalibrated intervals,
  * can be exported DATA-PARALLEL (``--n-devices N``): the batch axis is
    GSPMD-sharded over an abstract N-device mesh baked into the module —
    build the pod artifact on any host, bind it to real devices at load.

Usage:
    python -m im2im_uq_tpu.scripts.export_serving \
        --config experiments/synthetic_test/config.yml \
        --checkpoint output/checkpoints/CP_epoch10_....msgpack \
        --output model.uq.npz --height 320 --width 320 [--batch-size 32] \
        [--lam 2.5] [--platforms cpu,tpu]

Serve it with the infer CLI (no config/checkpoint needed):
    python -m im2im_uq_tpu.scripts.infer --artifact model.uq.npz \
        --input inputs.npy --output out/
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "ARTIFACT_VERSION",
    "ServingArtifact",
    "export_serving_artifact",
    "load_serving_artifact",
    "main",
]

ARTIFACT_VERSION = 1


def export_serving_artifact(
    state,
    path: str,
    *,
    batch_size: int = 32,
    height: int,
    width: int,
    channels: Optional[int] = None,
    lam: Optional[float] = None,
    platforms: tuple[str, ...] = ("cpu", "tpu"),
    n_devices: int = 1,
) -> dict:
    """Serialize ``state``'s calibrated nested-sets program to ``path``.

    The exported function is ``x:(B,H,W,C) float32 → (lower, pred, upper)``
    with params, batch stats, and λ baked in as module constants. Returns
    the metadata dict that was stored alongside the module.

    With ``n_devices > 1`` the program is exported DATA-PARALLEL: the batch
    axis is sharded over an ``n_devices``-wide mesh (GSPMD; eval-mode
    BatchNorm uses running stats, so shard outputs equal the single-device
    forward). The mesh is ABSTRACT at export time — a pod artifact can be
    built on any host, including a single-chip or CPU-only one — and binds
    to the real devices at load. ``batch_size`` must divide by
    ``n_devices``; serving hosts must run exactly ``n_devices`` devices
    (jax.export pins the device count into the module).
    """
    from jax import export as jax_export

    if lam is None:
        lam = state.lhat
    if lam is None:
        raise ValueError(
            "model has no calibrated λ̂ — calibrate first or pass lam explicitly"
        )
    lam = float(lam)
    if channels is None:
        channels = int(state.params.get("num_inputs", 1))

    # Re-assemble the model in its PORTABLE configuration: the Pallas
    # kernels (resize/conv/pool) have no lowering for export platforms the
    # host isn't running, so the exported program must be pure XLA. All
    # backends share one parameter tree (parity-tested), so the trained
    # variables drop straight in — only the traced program changes.
    from im2im_uq_tpu.models.assembly import add_uncertainty, build_trunk

    portable_cfg = dict(
        state.params,
        conv_backend="xla",
        pool_backend="xla",
        resize_backend="xla",
        lane_pack=False,
    )
    portable = add_uncertainty(build_trunk(portable_cfg), portable_cfg)
    model, variables, utype = portable.model, state.variables, state.uncertainty_type
    from im2im_uq_tpu.ops import sets as set_ops

    def fn(x):
        out = model.apply(variables, x, train=False)
        return set_ops.nested_sets_from_output(out, jnp.float32(lam), utype)

    if n_devices < 1:
        raise ValueError(f"n_devices must be >= 1, got {n_devices}")
    if n_devices > 1:
        if batch_size % n_devices:
            raise ValueError(
                f"batch_size {batch_size} must divide by n_devices {n_devices}"
            )
        from jax.sharding import AbstractMesh, NamedSharding
        from jax.sharding import PartitionSpec as P

        amesh = AbstractMesh((n_devices,), ("data",))
        shard = NamedSharding(amesh, P("data"))
        jf = jax.jit(fn, in_shardings=shard, out_shardings=(shard, shard, shard))
        spec = jax.ShapeDtypeStruct(
            (batch_size, height, width, channels), jnp.float32, sharding=shard
        )
    else:
        jf = jax.jit(fn)
        spec = jax.ShapeDtypeStruct(
            (batch_size, height, width, channels), jnp.float32
        )
    exported = jax_export.export(jf, platforms=list(platforms))(spec)
    blob = exported.serialize()

    n_params = int(
        sum(np.prod(p.shape) for p in jax.tree.leaves(variables.get("params", {})))
    )
    meta = {
        "artifact_version": ARTIFACT_VERSION,
        "batch_size": batch_size,
        "height": height,
        "width": width,
        "channels": channels,
        "lam": lam,
        "uncertainty_type": utype,
        "model": state.params.get("model", "UNet"),
        "compute_dtype": state.params.get("compute_dtype", "float32"),
        "platforms": list(exported.platforms),
        "n_devices": n_devices,
        "param_count": n_params,
        "jax_version": jax.__version__,
        # the artifact always traces the portable pure-XLA program (Pallas
        # kernels can't lower for platforms the exporting host isn't on)
        "program": "portable_xla",
    }
    path = os.path.expanduser(path)
    os.makedirs(os.path.dirname(os.path.abspath(path)) or ".", exist_ok=True)
    np.savez(
        path,
        stablehlo=np.frombuffer(blob, dtype=np.uint8),
        meta=np.str_(json.dumps(meta)),
    )
    return meta


@dataclasses.dataclass(frozen=True)
class ServingArtifact:
    """A deserialized serving artifact: callable like a calibrated UQState.

    Exposes the subset of the ``UQState`` surface that serving uses
    (``nested_sets``, ``lhat``), so ``infer.predict_intervals`` drives it
    unchanged. λ̂ is baked into the program: ``nested_sets(x, lam=o)`` for a
    different λ is an error, not a silent recalibration.
    """

    meta: dict
    _call: object  # jitted Exported.call
    _sharding: object = None  # NamedSharding binding a >1-device artifact

    @property
    def lhat(self) -> float:
        return float(self.meta["lam"])

    @property
    def batch_size(self) -> int:
        return int(self.meta["batch_size"])

    @property
    def uncertainty_type(self) -> str:
        return self.meta["uncertainty_type"]

    def nested_sets(self, x, lam=None, mesh=None):
        # ``mesh`` kept for UQState signature compatibility
        # (predict_intervals passes it); an artifact's sharding is baked at
        # export time, so a live mesh cannot apply here
        if mesh is not None:
            raise ValueError(
                "serving artifacts bake their sharding at export time — "
                "re-export with --n-devices for a data-parallel artifact "
                "instead of passing mesh="
            )
        if lam is not None and abs(float(lam) - self.lhat) > 1e-9:
            raise ValueError(
                f"λ={lam} requested but λ̂={self.lhat} is baked into the "
                "artifact — re-export to change it"
            )
        x = jnp.asarray(x, jnp.float32)
        if self._sharding is not None:
            # jax.export pins the device count into the module: a
            # data-parallel artifact must be fed batch-sharded inputs on a
            # mesh of exactly meta["n_devices"] devices (probe-verified: an
            # unsharded call raises "exported for N devices").
            x = jax.device_put(x, self._sharding)
        return self._call(x)


def load_serving_artifact(path: str) -> ServingArtifact:
    """Load an artifact written by ``export_serving_artifact``.

    Needs only jax — no model code, no checkpoint layout, no config.
    """
    from jax import export as jax_export

    with np.load(os.path.expanduser(path)) as z:
        blob = z["stablehlo"].tobytes()
        meta = json.loads(str(z["meta"]))
    if meta.get("artifact_version") != ARTIFACT_VERSION:
        raise ValueError(
            f"artifact version {meta.get('artifact_version')} != "
            f"supported {ARTIFACT_VERSION}"
        )
    backend = jax.default_backend()
    # jax maps the axon tunnel backend onto real TPU programs
    plat = {"axon": "tpu"}.get(backend, backend)
    if plat not in meta["platforms"]:
        raise ValueError(
            f"artifact was exported for platforms {meta['platforms']} but this "
            f"host runs {plat!r} — re-export with --platforms {plat}"
        )
    exported = jax_export.deserialize(blob)
    n_dev = int(meta.get("n_devices", 1))
    sharding = None
    if n_dev > 1:
        devices = jax.devices()
        if len(devices) < n_dev:
            raise ValueError(
                f"artifact is data-parallel over {n_dev} devices but this "
                f"host runs {len(devices)} — re-export with --n-devices "
                f"{len(devices)} or serve on a {n_dev}-device host"
            )
        from jax.sharding import Mesh, NamedSharding
        from jax.sharding import PartitionSpec as P

        mesh = Mesh(np.asarray(devices[:n_dev]), ("data",))
        sharding = NamedSharding(mesh, P("data"))
    return ServingArtifact(
        meta=meta, _call=jax.jit(exported.call), _sharding=sharding
    )


def main(argv: Optional[list[str]] = None) -> int:
    from im2im_uq_tpu.scripts.infer import load_uq_state_for_inference
    from im2im_uq_tpu.utils.config import DEFAULTS, load_config

    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--config", required=True, help="experiment config YAML")
    ap.add_argument("--checkpoint", required=True, help="training checkpoint")
    ap.add_argument("--output", required=True, help="artifact path (.npz)")
    ap.add_argument("--batch-size", type=int, default=32)
    ap.add_argument("--height", type=int, required=True)
    ap.add_argument("--width", type=int, required=True)
    ap.add_argument(
        "--lam",
        type=float,
        default=None,
        help="λ to bake in (default: the checkpoint's calibrated λ̂)",
    )
    ap.add_argument(
        "--platforms",
        default="cpu,tpu",
        help="comma-separated jax export platforms (default cpu,tpu)",
    )
    ap.add_argument(
        "--n-devices",
        type=int,
        default=1,
        help="export the program data-parallel over this many devices "
        "(abstract mesh: the pod artifact can be built on any host)",
    )
    ap.add_argument("--grid-index", type=int, default=0)
    args = ap.parse_args(argv)

    config = dict(DEFAULTS)
    config.update(load_config(args.config, grid_index=args.grid_index)[0])
    state = load_uq_state_for_inference(config, os.path.expanduser(args.checkpoint))
    lam = args.lam if args.lam is not None else state.lhat
    if lam is None:
        raise SystemExit(
            "checkpoint has no calibrated λ̂ — pass --lam or calibrate first"
        )
    meta = export_serving_artifact(
        state,
        args.output,
        batch_size=args.batch_size,
        height=args.height,
        width=args.width,
        channels=int(config.get("num_inputs", 1)),
        lam=lam,
        platforms=tuple(p.strip() for p in args.platforms.split(",") if p.strip()),
        n_devices=args.n_devices,
    )
    size_mb = os.path.getsize(os.path.expanduser(args.output)) / 1e6
    print(json.dumps({**meta, "artifact_mb": round(size_mb, 2)}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
