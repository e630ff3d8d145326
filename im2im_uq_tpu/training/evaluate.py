"""Evaluation engine: validation images, loss tables, set metrics.

Counterpart of the reference evaluation engine (reference: core/scripts/
eval.py — ``get_images`` 24-84, ``get_loss_table`` 86-127, ``eval_set_metrics``
130-157, ``eval_net`` 159-186). The loss-table and metric hot paths live in
calibration/{rcps,metrics}.py as jitted device sweeps; this module adds the
image rendering used by validation and the router's final panels.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np

from im2im_uq_tpu.calibration.metrics import eval_set_metrics  # re-export  # noqa: F401
from im2im_uq_tpu.calibration.rcps import compute_loss_table, lambda_grid
from im2im_uq_tpu.models.assembly import UQState
from im2im_uq_tpu.training.train import eval_net  # re-export  # noqa: F401
from im2im_uq_tpu.utils.logging import to_uint8_image

__all__ = ["get_images", "get_loss_table", "eval_set_metrics", "eval_net", "default_lambda"]


def default_lambda(uq_state: UQState, config: dict) -> float:
    """Pre-calibration λ for validation renders: 1.0, or 0.99 for softmax
    (reference eval.py:32-37)."""
    if uq_state.lhat is not None:
        return uq_state.lhat
    return 0.99 if config["uncertainty_type"] == "softmax" else 1.0


def get_loss_table(
    uq_state: UQState, dataset, config: dict, mesh=None, method: Optional[str] = None
) -> np.ndarray:
    """(N, num_lambdas) fraction-missed table at the *unshifted* λ grid.

    The validation table is evaluated at λ itself, unlike calibration's
    λ − dλ offset (reference eval.py:107-124 vs calibrate_model.py:135).
    """
    from im2im_uq_tpu.calibration.rcps import default_table_method

    return compute_loss_table(
        uq_state,
        dataset,
        lambda_grid(config),
        batch_size=config.get("batch_size", 64),
        mesh=mesh,
        method=method or default_table_method(config),
    )


def get_images(
    uq_state: UQState,
    dataset,
    indices,
    config: dict,
    lam: Optional[float] = None,
) -> dict:
    """Prediction-set panels for the given example indices.

    Returns the reference's raw-arrays dict (inputs/gt/predictions/
    lower_edge/upper_edge — reference eval.py:52-58) plus uint8 renders:
    input, lower/prediction/upper edges, ground truth, and the lower/upper
    interval-length heatmaps normalized by the prediction's dynamic range
    (eval.py:70-76).
    """
    lam = default_lambda(uq_state, config) if lam is None else lam
    if not hasattr(dataset, "__getitem__"):
        # iterable datasets (TEMCA stream): materialize the first examples
        # (reference eval.py:40-44 does the same via iter())
        # cap at stream length: a stream shorter than the requested indices
        # must not kill the final artifact step
        it = iter(dataset)
        examples = []
        for _ in range(max(indices) + 1):
            try:
                examples.append(next(it))
            except StopIteration:
                break
        if hasattr(dataset, "reset"):
            dataset.reset()
        dataset = examples
    indices = [i for i in indices if i < len(dataset)]
    inputs, gts, lowers, preds, uppers = [], [], [], [], []
    for i in indices:
        x, y = dataset[i]
        lower, pred, upper = uq_state.nested_sets(jnp.asarray(x)[None], lam=lam)
        inputs.append(np.asarray(x))
        gts.append(np.asarray(y))
        lowers.append(np.asarray(lower[0]))
        preds.append(np.asarray(pred[0]))
        uppers.append(np.asarray(upper[0]))

    raw = {
        "inputs": inputs,
        "gt": gts,
        "predictions": preds,
        "lower_edge": lowers,
        "upper_edge": uppers,
    }
    # multi-channel inputs render channel 0 (reference eval.py:54-62)
    render_in = [x[..., :1] for x in inputs]
    panels = {
        "examples_input": [to_uint8_image(x) for x in render_in],
        "examples_lower_edge": [to_uint8_image(v) for v in lowers],
        "examples_prediction": [to_uint8_image(v) for v in preds],
        "examples_upper_edge": [to_uint8_image(v) for v in uppers],
        "examples_ground_truth": [to_uint8_image(v) for v in gts],
    }
    ll, ul = [], []
    for lo, p, hi in zip(lowers, preds, uppers):
        span = max(float(p.max() - p.min()), 1e-12)
        ll.append(to_uint8_image((p - lo) / span, self_normalize=False))
        ul.append(to_uint8_image((hi - p) / span, self_normalize=False))
    panels["examples_lower_length"] = ll
    panels["examples_upper_length"] = ul
    return {"raw": raw, "panels": panels}
