"""make_train_multistep == K sequential make_train_step applications.

bench.py's in-graph K-step loop (the measured-wall headline basis) and any
dispatch-free pod burn-in loop are only trustworthy if the fori_loop body
advances the state exactly like the per-batch step does — same loss
trajectory, same params, same BN stats, same step count.

Tolerances: the loop body and the straight-line step compile to different
XLA fusions, so reductions reassociate at the ~1e-7 level. Under SGD that
stays ~1e-7 (updates are linear in the grads) — asserted tightly. Under
Adam the update is lr·m/√v: where a gradient is near zero, v is tiny and a
1e-7 perturbation flips the update's sign, moving that param by ±lr per
step — an expected property of Adam under any numerical noise, not a loop
bug — so the Adam leg pins semantics (step count, loss to 1e-3) rather
than bitwise trajectory.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from im2im_uq_tpu.models.assembly import add_uncertainty, build_trunk
from im2im_uq_tpu.models.heads import head_loss_pe_fn
from im2im_uq_tpu.training.train import (
    TrainState,
    make_train_multistep,
    make_train_step,
)

pytestmark = pytest.mark.smoke

CFG = {
    "model": "UNet",
    "uncertainty_type": "quantiles",
    "q_lo": 0.05,
    "q_hi": 0.95,
    "q_lo_weight": 1.0,
    "q_hi_weight": 1.0,
    "mse_weight": 1.0,
}
K = 3


def _fresh_state(tx):
    st = add_uncertainty(
        build_trunk(CFG), dict(CFG), rng=jax.random.key(0),
        example_input=jnp.zeros((1, 32, 32, 1)),
    )
    return st.model, TrainState(
        params=st.variables["params"],
        batch_stats=st.variables["batch_stats"],
        opt_state=tx.init(st.variables["params"]),
        step=jnp.zeros((), jnp.int32),
    )


def _batch():
    rng = np.random.RandomState(0)
    x = rng.randn(4, 32, 32, 1).astype(np.float32)
    y = rng.randn(4, 32, 32, 1).astype(np.float32)
    return x, y, np.ones((4,), np.float32)


def _run_both(tx):
    x, y, mask = _batch()
    model, ts_a = _fresh_state(tx)
    step = make_train_step(model, head_loss_pe_fn("quantiles"), CFG, tx)
    loss_seq = None
    for _ in range(K):
        ts_a, loss_seq = step(ts_a, x, y, mask)

    model, ts_b = _fresh_state(tx)
    loop = make_train_multistep(
        model, head_loss_pe_fn("quantiles"), CFG, tx, num_steps=K
    )
    ts_b, loss_loop = loop(ts_b, x, y, mask)
    return ts_a, loss_seq, ts_b, loss_loop


def test_multistep_matches_sequential_sgd_exact():
    ts_a, loss_seq, ts_b, loss_loop = _run_both(optax.sgd(1e-2))
    assert float(loss_loop) == pytest.approx(float(loss_seq), rel=1e-5)
    assert int(ts_b.step) == int(ts_a.step) == K
    for a, b in zip(jax.tree.leaves(ts_a.params), jax.tree.leaves(ts_b.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4)
    for a, b in zip(
        jax.tree.leaves(ts_a.batch_stats), jax.tree.leaves(ts_b.batch_stats)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4)


def test_multistep_matches_sequential_adam_semantics():
    ts_a, loss_seq, ts_b, loss_loop = _run_both(optax.adam(1e-3))
    assert float(loss_loop) == pytest.approx(float(loss_seq), rel=1e-3)
    assert int(ts_b.step) == int(ts_a.step) == K
    # params can differ by ±lr per near-zero-grad param (see module doc);
    # bound the drift at a few lr rather than asserting bitwise identity
    for a, b in zip(jax.tree.leaves(ts_a.params), jax.tree.leaves(ts_b.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=K * 2e-3)
