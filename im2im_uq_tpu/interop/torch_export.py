"""Export this framework's variables to the reference's torch layout.

The inverse of torch_import: turns a UQState's (params, batch_stats) into
a state_dict keyed exactly like the reference ModelWithUncertainty
(``baseModel.*`` / ``last_layer.*`` dotted names, NCHW conv weights,
BatchNorm running stats + num_batches_tracked) so models trained here
load straight into the reference implementation with
``module.load_state_dict(exported)``. Round-trip (import → export) is
bit-exact and export → reference forward parity is pinned by
tests/test_torch_import.py.

Note on λ̂: the reference registers ``lhat`` as a None buffer until
``set_lhat`` is called (reference add_uncertainty.py:20,48-49), so a fresh
reference module rejects the exported ``lhat`` entry under strict loading —
call ``module.set_lhat(torch.tensor(0.0))`` first, or load with
``strict=False``.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

__all__ = ["export_state_dict"]


def _t(a):
    import torch

    return torch.tensor(np.asarray(a))


def _conv(out: dict, prefix: str, tree: dict) -> None:
    """flax (kh,kw,in,out) kernel → torch Conv2d (out,in,kh,kw) weight."""
    out[prefix + "weight"] = _t(np.asarray(tree["kernel"]).transpose(3, 2, 0, 1))
    out[prefix + "bias"] = _t(tree["bias"])


def _bn(out: dict, prefix: str, params: dict, stats: dict) -> None:
    import torch

    out[prefix + "weight"] = _t(params["scale"])
    out[prefix + "bias"] = _t(params["bias"])
    out[prefix + "running_mean"] = _t(stats["mean"])
    out[prefix + "running_var"] = _t(stats["var"])
    # torch tracks an update counter; its value is irrelevant for eval
    # (the reference trains with constant momentum)
    out[prefix + "num_batches_tracked"] = torch.tensor(0, dtype=torch.int64)


def _double_conv(out: dict, prefix: str, params: dict, stats: dict) -> None:
    """our conv{i}/bn{i} → reference Sequential indices 0/1 and 3/4."""
    for i, (c, b) in enumerate(((0, 1), (3, 4))):
        _conv(out, f"{prefix}{c}.", params[f"conv{i}"])
        _bn(out, f"{prefix}{b}.", params[f"bn{i}"], stats[f"bn{i}"])


def _export_unet(out: dict, params: dict, stats: dict, prefix: str = "baseModel.") -> None:
    _double_conv(out, f"{prefix}inc.double_conv.", params["inc"], stats["inc"])
    for i in (1, 2, 3, 4):
        _double_conv(
            out, f"{prefix}down{i}.maxpool_conv.1.double_conv.",
            params[f"down{i}"]["conv"], stats[f"down{i}"]["conv"],
        )
    for i in (1, 2, 3, 4):
        _double_conv(
            out, f"{prefix}up{i}.conv.double_conv.",
            params[f"up{i}"]["conv"], stats[f"up{i}"]["conv"],
        )
    _conv(out, f"{prefix}out.conv.", params["out"])


def _export_wnet(out: dict, params: dict, stats: dict, prefix: str = "baseModel.") -> None:
    for tag in ("p1", "p2"):
        _double_conv(
            out, f"{prefix}{tag}inc.double_conv.",
            params[f"{tag}inc"], stats[f"{tag}inc"],
        )
        for i in (1, 2, 3, 4):
            _double_conv(
                out, f"{prefix}{tag}down{i}.maxpool_conv.1.double_conv.",
                params[f"{tag}down{i}"]["conv"], stats[f"{tag}down{i}"]["conv"],
            )
    for i in (1, 2, 3, 4):
        _double_conv(
            out, f"{prefix}up{i}.conv.double_conv.",
            params[f"up{i}"]["conv"], stats[f"up{i}"]["conv"],
        )
    _conv(out, f"{prefix}out.conv.", params["out"])


def _export_head(out: dict, head: dict, uncertainty_type: str,
                 prefix: str = "last_layer.") -> None:
    if uncertainty_type == "softmax":
        for name, tree in head.items():  # out{c} → output_layers.{c}
            c = int(name.removeprefix("out"))
            _conv(out, f"{prefix}output_layers.{c}.", tree)
        return
    for name, tree in head.items():  # lower/prediction/upper, mean/variance, ...
        _conv(out, f"{prefix}{name}.", tree)


def export_state_dict(
    variables: dict,
    model: str,
    uncertainty_type: str,
    lhat: Optional[float] = None,
) -> dict:
    """(params, batch_stats) tree → reference-layout torch state_dict."""
    params, stats = variables["params"], variables.get("batch_stats", {})
    out: dict = {}
    if model == "UNet":
        _export_unet(out, params["trunk"], stats["trunk"])
    elif model == "WNet":
        _export_wnet(out, params["trunk"], stats["trunk"])
    else:
        raise NotImplementedError(f"unsupported trunk {model!r}")
    _export_head(out, params["head"], uncertainty_type)
    if lhat is not None:
        out["lhat"] = _t(np.float32(lhat))
    return out
