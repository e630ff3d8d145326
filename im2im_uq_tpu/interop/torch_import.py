"""Import reference torch checkpoints into this framework.

The reference checkpoints are whole-``nn.Module`` pickles of its
ModelWithUncertainty (``torch.save(net.cpu().module, CP_epoch{e}_*.pth)``,
reference: core/scripts/train.py:183-195) — a trained UNet/WNet trunk plus
an uncertainty head. A user migrating to this framework keeps their trained
weights: ``port_state_dict`` maps every tensor into this framework's Flax
tree (NCHW conv weights → HWIO kernels, BatchNorm weight/bias/running
stats → scale/bias/mean/var), and ``load_reference_checkpoint`` turns a
.pth file into a ready UQState. Forward outputs agree with the reference
module to fp32 tolerance (tests/test_torch_import.py).

Supported: UNet and WNet trunks (bilinear upsampling — the reference
default and the only configuration its router builds, router.py:84) and
all seven uncertainty heads.
"""

from __future__ import annotations

from typing import Any, Optional

import numpy as np

__all__ = ["port_state_dict", "load_reference_checkpoint"]


def _np(v) -> np.ndarray:
    if hasattr(v, "detach"):  # torch tensor
        v = v.detach().cpu().numpy()
    return np.array(v, copy=True)


def _conv(sd: dict, prefix: str) -> dict:
    """torch Conv2d (out,in,kh,kw) weight → flax (kh,kw,in,out) kernel."""
    return {
        "kernel": _np(sd[prefix + "weight"]).transpose(2, 3, 1, 0),
        "bias": _np(sd[prefix + "bias"]),
    }


def _bn(sd: dict, prefix: str) -> tuple[dict, dict]:
    params = {
        "scale": _np(sd[prefix + "weight"]),
        "bias": _np(sd[prefix + "bias"]),
    }
    stats = {
        "mean": _np(sd[prefix + "running_mean"]),
        "var": _np(sd[prefix + "running_var"]),
    }
    return params, stats


def _double_conv(sd: dict, prefix: str) -> tuple[dict, dict]:
    """reference DoubleConv Sequential indices: 0 conv, 1 bn, 3 conv, 4 bn."""
    params, stats = {}, {}
    for i, (c, b) in enumerate(((0, 1), (3, 4))):
        params[f"conv{i}"] = _conv(sd, f"{prefix}{c}.")
        p, s = _bn(sd, f"{prefix}{b}.")
        params[f"bn{i}"] = p
        stats[f"bn{i}"] = s
    return params, stats


def _port_unet(sd: dict, prefix: str = "baseModel.") -> tuple[dict, dict]:
    params, stats = {}, {}
    params["inc"], stats["inc"] = _double_conv(sd, f"{prefix}inc.double_conv.")
    for i in (1, 2, 3, 4):
        p, s = _double_conv(sd, f"{prefix}down{i}.maxpool_conv.1.double_conv.")
        params[f"down{i}"], stats[f"down{i}"] = {"conv": p}, {"conv": s}
    for i in (1, 2, 3, 4):
        if f"{prefix}up{i}.up.weight" in sd:
            raise NotImplementedError(
                "ConvTranspose (bilinear=False) reference checkpoints are not "
                "supported — the reference router always builds bilinear UNets"
            )
        p, s = _double_conv(sd, f"{prefix}up{i}.conv.double_conv.")
        params[f"up{i}"], stats[f"up{i}"] = {"conv": p}, {"conv": s}
    params["out"] = _conv(sd, f"{prefix}out.conv.")
    return params, stats


def _port_wnet(sd: dict, prefix: str = "baseModel.") -> tuple[dict, dict]:
    params, stats = {}, {}
    for tag in ("p1", "p2"):
        params[f"{tag}inc"], stats[f"{tag}inc"] = _double_conv(
            sd, f"{prefix}{tag}inc.double_conv."
        )
        for i in (1, 2, 3, 4):
            p, s = _double_conv(
                sd, f"{prefix}{tag}down{i}.maxpool_conv.1.double_conv."
            )
            params[f"{tag}down{i}"], stats[f"{tag}down{i}"] = {"conv": p}, {"conv": s}
    for i in (1, 2, 3, 4):
        p, s = _double_conv(sd, f"{prefix}up{i}.conv.double_conv.")
        params[f"up{i}"], stats[f"up{i}"] = {"conv": p}, {"conv": s}
    params["out"] = _conv(sd, f"{prefix}out.conv.")
    return params, stats


_HEAD_CONVS = {
    "quantiles": ("lower", "prediction", "upper"),
    "quantiles_l1": ("lower", "prediction", "upper"),
    "inn": ("lower", "prediction", "upper"),
    "gaussian": ("mean", "variance"),
    "residual_magnitude": ("prediction", "residual_magnitude"),
    "residual_magnitude_l1": ("prediction", "residual_magnitude"),
}


def _port_head(sd: dict, uncertainty_type: str, prefix: str = "last_layer.") -> dict:
    if uncertainty_type == "softmax":
        # reference SoftmaxLayer: ModuleList output_layers.{c} → our out{c}
        head, c = {}, 0
        while f"{prefix}output_layers.{c}.weight" in sd:
            head[f"out{c}"] = _conv(sd, f"{prefix}output_layers.{c}.")
            c += 1
        if not head:
            raise KeyError(f"no softmax head convs under {prefix!r}")
        return head
    try:
        names = _HEAD_CONVS[uncertainty_type]
    except KeyError:
        raise NotImplementedError(
            f"unknown uncertainty_type {uncertainty_type!r}"
        ) from None
    return {n: _conv(sd, f"{prefix}{n}.") for n in names}


def port_state_dict(
    state_dict: dict, model: str, uncertainty_type: str
) -> tuple[dict, dict]:
    """reference ModelWithUncertainty state_dict → (params, batch_stats).

    ``state_dict`` maps the reference's dotted names to tensors/ndarrays
    (``module.state_dict()`` of a loaded checkpoint). Returns the Flax
    variable subtrees in this framework's layout ({'trunk': ..., 'head':
    ...} / {'trunk': ...}).
    """
    if model == "UNet":
        trunk_p, trunk_s = _port_unet(state_dict)
    elif model == "WNet":
        trunk_p, trunk_s = _port_wnet(state_dict)
    else:
        raise NotImplementedError(f"unsupported trunk {model!r}")
    head_p = _port_head(state_dict, uncertainty_type)
    return {"trunk": trunk_p, "head": head_p}, {"trunk": trunk_s}


def load_reference_checkpoint(
    path: str,
    config: dict,
    reference_path: Optional[str] = None,
    example_input: Optional[Any] = None,
):
    """Load a reference .pth checkpoint into a ready UQState.

    The reference pickles whole modules, so unpickling needs the reference
    package importable — pass ``reference_path`` (the repo root containing
    ``core/``) to add it to sys.path. ``config`` needs at least ``model``
    and ``uncertainty_type`` (the same keys the checkpoint filename
    encodes). λ̂ is carried over when the module has a calibrated ``lhat``.
    Pass ``example_input`` (a (1, H, W, C) array) to shape-check the ported
    tree against a freshly initialized model.
    """
    import sys

    import torch

    from im2im_uq_tpu.models.assembly import add_uncertainty, build_trunk

    inserted = None
    if reference_path and reference_path not in sys.path:
        sys.path.insert(0, reference_path)
        inserted = reference_path
    try:
        try:
            # bare state_dicts load safely without pickle code execution
            obj = torch.load(path, map_location="cpu", weights_only=True)
        except Exception:
            # the reference's whole-module .pth pickles need full unpickling
            # (runs code from the checkpoint — only load trusted files)
            obj = torch.load(path, map_location="cpu", weights_only=False)
    finally:
        # don't leave reference_path shadowing same-named modules (e.g. a
        # top-level 'core' package) for the rest of the process
        if inserted is not None:
            try:
                sys.path.remove(inserted)
            except ValueError:
                pass
    lhat = None
    if hasattr(obj, "state_dict"):
        raw = getattr(obj, "lhat", None)
        if raw is not None:
            lhat = float(raw.item() if hasattr(raw, "item") else raw)
        obj = obj.state_dict()
    elif "lhat" in obj:
        # bare state_dict: the calibrated lhat rides along as the
        # reference ModelWithUncertainty's registered buffer
        raw = obj["lhat"]
        lhat = float(raw.item() if hasattr(raw, "item") else raw)
    params, batch_stats = port_state_dict(
        obj, config.get("model", "UNet"), config["uncertainty_type"]
    )

    rng = example = None
    if example_input is not None:
        import jax

        rng, example = jax.random.key(0), example_input
    state = add_uncertainty(
        build_trunk(config), config, rng=rng, example_input=example
    )
    if example_input is not None:
        import jax

        want = jax.tree.map(lambda a: a.shape, state.variables["params"])
        got = jax.tree.map(lambda a: a.shape, params)
        if want != got:
            raise ValueError(
                f"ported tree does not match the configured model: {want} vs {got}"
            )
    state = state.replace(variables={"params": params, "batch_stats": batch_stats})
    return state.set_lhat(lhat) if lhat is not None else state
