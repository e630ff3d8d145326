"""CLI: convert one of this framework's checkpoints to the reference's
torch state_dict layout.

    python -m im2im_uq_tpu.scripts.export_torch \
        --checkpoint ckpts/CP_calibrated_*.msgpack \
        --config experiments/fastmri_test/config.yml \
        --output model_reference.pth

The output loads into the reference ModelWithUncertainty with
``module.load_state_dict(torch.load(path))`` (call ``set_lhat`` first or
load with strict=False when λ̂ is included — the reference registers the
buffer as None until calibration). The inverse of scripts.import_torch.
"""

from __future__ import annotations

import argparse
from typing import Optional

__all__ = ["main"]


def main(argv: Optional[list[str]] = None) -> int:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--checkpoint", required=True,
                        help="msgpack/orbax checkpoint from this framework")
    parser.add_argument("--config", required=True,
                        help="config YAML (wandb sweep schema ok)")
    parser.add_argument("--grid-index", type=int, default=0)
    parser.add_argument("--output", required=True, help="output .pth path")
    args = parser.parse_args(argv)

    import torch

    from im2im_uq_tpu.interop.torch_export import export_state_dict
    from im2im_uq_tpu.scripts.infer import load_uq_state_for_inference
    from im2im_uq_tpu.utils.config import load_config

    config = load_config(args.config)[args.grid_index]
    state = load_uq_state_for_inference(config, args.checkpoint)
    sd = export_state_dict(
        state.variables,
        config.get("model", "UNet"),
        config["uncertainty_type"],
        lhat=state.lhat,
    )
    torch.save(sd, args.output)
    lhat_note = f" (lhat={state.lhat})" if state.lhat is not None else ""
    print(f"Exported reference-layout state_dict: {args.output}{lhat_note}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
