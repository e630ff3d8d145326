"""CLI: convert a reference torch checkpoint into this framework's format.

    python -m im2im_uq_tpu.scripts.import_torch \
        --checkpoint CP_epoch10_fastmri_quantiles_78_0.0001_standard_standard.pth \
        --config experiments/fastmri_test/config.yml \
        --reference-path /path/to/im2im-uq \
        --output-dir ckpts/

Writes the equivalent checkpoint in this framework's layout with the same
config-keyed filename contract: a resumable ``CP_epoch{e}_*`` when the
module is uncalibrated, plus the λ̂-bearing ``CP_calibrated_*`` serving
artifact when it carries a calibrated lhat (consumable by scripts.infer).
The reference pickles whole nn.Modules, so unpickling needs the reference
repo importable — point --reference-path at its root.
"""

from __future__ import annotations

import argparse
import re
from typing import Optional

__all__ = ["main"]


def main(argv: Optional[list[str]] = None) -> int:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--checkpoint", required=True, help="reference .pth file")
    parser.add_argument("--config", required=True, help="config YAML (wandb sweep schema ok)")
    parser.add_argument("--grid-index", type=int, default=0)
    parser.add_argument("--output-dir", required=True)
    parser.add_argument("--reference-path", default=None,
                        help="reference repo root (needed to unpickle its modules)")
    parser.add_argument("--epoch", type=int, default=None,
                        help="epoch tag for the output filename "
                             "(default: parsed from CP_epoch{e}_* input name)")
    parser.add_argument("--lhat", type=float, default=None,
                        help="override/provide the calibrated lambda-hat")
    args = parser.parse_args(argv)

    import jax.numpy as jnp

    from im2im_uq_tpu.interop.torch_import import load_reference_checkpoint
    from im2im_uq_tpu.training.checkpoint import (
        checkpoint_path,
        save_calibrated_checkpoint,
        save_checkpoint,
    )
    from im2im_uq_tpu.utils.config import load_config

    config = load_config(args.config)[args.grid_index]
    num_inputs = int(config.get("num_inputs", 1))
    state = load_reference_checkpoint(
        args.checkpoint,
        config,
        reference_path=args.reference_path,
        example_input=jnp.zeros((1, 32, 32, num_inputs), jnp.float32),
    )
    if args.lhat is not None:
        state = state.set_lhat(args.lhat)

    epoch = args.epoch
    if epoch is None:
        m = re.search(r"CP_epoch(\d+)_", args.checkpoint)
        epoch = int(m.group(1)) if m else int(config.get("epochs", 0))

    import optax

    from im2im_uq_tpu.training.train import TrainState

    params = state.variables["params"]
    ts = TrainState(
        params=params,
        batch_stats=state.variables.get("batch_stats", {}),
        opt_state=optax.adam(float(config.get("lr", 1e-3))).init(params),
        step=jnp.zeros((), jnp.int32),
    )
    path = checkpoint_path(args.output_dir, epoch, config)
    save_checkpoint(path, ts, state.lhat, epoch)
    print(f"Imported: {path}")
    if state.lhat is not None:
        cal = save_calibrated_checkpoint(state, config, args.output_dir)
        print(f"Calibrated serving artifact: {cal}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
