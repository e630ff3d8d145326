"""RCPS evaluation metrics: risk, sizes, Spearman, stratified risk, MSE,
spatial miscoverage.

Counterpart of the reference's metric pass (reference: core/calibration/
calibrate_model.py:31-60 ``get_rcps_metrics_from_outputs`` and
core/scripts/eval.py:130-157 ``eval_set_metrics``), reorganized so the model
forward + set construction run jitted on device (one program per batch) and
only the per-image reductions land on host:

- per-image fraction-missed loss at λ̂;
- ONE uniformly-random pixel per image sampled from the size map, jittered
  by U(0,1)·1e−6 to break ties (calibrate_model.py:44-51);
- Spearman rank correlation between |residual| and size at those pixels;
- MSE of those sampled residuals (calibrate_model.py:54);
- per-pixel spatial miscoverage map averaged over images and channels;
- size-stratified risk over quartile buckets of the jittered sizes
  (calibrate_model.py:56-58, torch.bucketize(right=False) semantics).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
from scipy.stats import spearmanr

from im2im_uq_tpu.data.core import iterate_batches
from im2im_uq_tpu.models.assembly import UQState
from im2im_uq_tpu.ops import sets as set_ops
from im2im_uq_tpu.parallel import mesh as mesh_lib

__all__ = ["RCPSMetrics", "eval_set_metrics", "eval_risk_only"]


class RCPSMetrics(NamedTuple):
    risk: float  # mean fraction-missed at λ̂
    losses: np.ndarray  # (N,) per-image fraction missed
    sizes: np.ndarray  # (N,) sampled interval sizes (jittered)
    spearman: float  # rank corr(residual, size) at sampled pixels
    stratified_risks: np.ndarray  # (4,) risk per size quartile
    mse: float  # mean squared sampled residual
    spatial_miscoverage: np.ndarray  # (H, W) mean miss map


def _make_metrics_step(uq_state: UQState, mesh):
    """Jitted: (variables, x, y, lam) → per-batch (losses, sizes, residuals, miss)."""
    utype = uq_state.uncertainty_type
    model = uq_state.model

    def step(variables, x, y, lam):
        out = model.apply(variables, x, train=False)
        lower, pred, upper = set_ops.nested_sets_from_output(out, lam, utype)
        losses = set_ops.fraction_missed(lower, upper, y)
        sizes = upper - lower
        residuals = jnp.abs(y - pred)
        miss = set_ops.miss_map(lower, upper, y)
        return losses, sizes, residuals, miss

    if mesh is None:
        return jax.jit(step)
    repl = mesh_lib.replicated(mesh)
    shard = mesh_lib.batch_sharding(mesh)
    return jax.jit(
        step,
        in_shardings=(repl, shard, shard, repl),
        out_shardings=(shard, shard, shard, shard),
    )


def eval_set_metrics(
    uq_state: UQState,
    dataset,
    config: dict,
    mesh=None,
    batch_size: Optional[int] = None,
    lam: Optional[float] = None,
    rng: Optional[np.random.RandomState] = None,
) -> RCPSMetrics:
    """Full metric sweep over ``dataset`` at λ̂ (or an explicit ``lam``)."""
    if lam is None:
        if uq_state.lhat is None:
            raise ValueError("calibrate first or pass an explicit lam")
        lam = uq_state.lhat
    rng = rng or np.random
    bs = batch_size or config.get("batch_size", 64)
    bs = mesh_lib.mesh_batch_size(bs, mesh)
    step = _make_metrics_step(uq_state, mesh)

    losses_l, sizes_l, resid_l, spatial_sum, n_seen = [], [], [], None, 0
    for x, y, mask in iterate_batches(dataset, bs, shuffle=False):
        xb, yb = mesh_lib.put_batch(mesh, x, y)
        # np scalar, not jnp: a committed local array can't recommit to a
        # multi-process replicated sharding, host scalars can
        losses, sizes, residuals, miss = mesh_lib.fetch(
            step(uq_state.variables, xb, yb, np.float32(lam))
        )
        real = mask.astype(bool)
        losses, sizes, residuals, miss = (
            losses[real],
            sizes[real],
            residuals[real],
            miss[real],
        )
        b = losses.shape[0]
        flat_sizes = sizes.reshape(b, -1)
        flat_resid = residuals.reshape(b, -1)
        # one random pixel per image (calibrate_model.py:44-47)
        pix = rng.choice(flat_sizes.shape[1], size=b)
        losses_l.append(losses)
        sizes_l.append(flat_sizes[np.arange(b), pix])
        resid_l.append(flat_resid[np.arange(b), pix])
        batch_spatial = miss.sum(axis=0).mean(axis=-1)  # (H, W), summed over batch
        spatial_sum = batch_spatial if spatial_sum is None else spatial_sum + batch_spatial
        n_seen += b

    losses = np.concatenate(losses_l)
    sizes = np.concatenate(sizes_l)
    residuals = np.concatenate(resid_l)
    sizes = sizes + rng.random_sample(sizes.shape) * 1e-6  # tie-break jitter
    spearman = float(spearmanr(residuals, sizes)[0])
    mse = float(np.mean(residuals * residuals))
    spatial = spatial_sum / n_seen

    size_bins = np.array(
        [0.0, np.quantile(sizes, 0.25), np.quantile(sizes, 0.5), np.quantile(sizes, 0.75)]
    )
    # torch.bucketize(right=False) == searchsorted side='left'; then −1
    buckets = np.searchsorted(size_bins, sizes, side="left") - 1
    stratified = np.array(
        [losses[buckets == b].mean() if np.any(buckets == b) else np.nan for b in range(4)]
    )
    return RCPSMetrics(
        risk=float(losses.mean()),
        losses=losses,
        sizes=sizes,
        spearman=spearman,
        stratified_risks=stratified,
        mse=mse,
        spatial_miscoverage=spatial,
    )


def eval_risk_only(uq_state: UQState, dataset, config: dict, mesh=None) -> float:
    """Cheap risk check at λ̂ (no sampling/ranking side computation)."""
    if uq_state.lhat is None:
        raise ValueError("calibrate first or pass an explicit lam")
    lambdas = np.array([uq_state.lhat], dtype=np.float64)
    from im2im_uq_tpu.calibration.rcps import compute_loss_table

    table = compute_loss_table(
        uq_state, dataset, lambdas, batch_size=config.get("batch_size", 64), mesh=mesh
    )
    return float(table.mean())
