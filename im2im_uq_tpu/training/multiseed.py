"""Multi-seed sweep parallelism: train S independent replicas at once.

The reference runs hyperparameter/seed sweeps as independent wandb-agent
processes, one grid point at a time (SURVEY.md §2 #20b). TPU-native
equivalent: stack S model replicas (one per seed) along a leading axis,
shard that axis over the mesh, and vmap the train step — every chip trains
its own replica with ZERO cross-chip communication; a sweep over S seeds
costs one seed's wall-clock.

Calibration composes: each replica's interval params feed the shared loss
table machinery, and per-replica λ̂s come back as a vector.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from im2im_uq_tpu.models.assembly import UQState
from im2im_uq_tpu.models.heads import head_loss_pe_fn
from im2im_uq_tpu.parallel.mesh import DATA_AXIS
from im2im_uq_tpu.training.train import TrainState, _masked_mean

__all__ = ["init_multiseed_states", "make_multiseed_train_step", "replica_state"]


def init_multiseed_states(
    uq_state: UQState, seeds: list[int], tx: optax.GradientTransformation, example_input
) -> TrainState:
    """TrainState with a leading seed axis: params[s] initialized from seed s."""

    def init_one(seed):
        variables = jax.jit(
            lambda r, x: uq_state.model.init(r, x, train=False)
        )(jax.random.key(seed), example_input)
        return TrainState(
            params=variables["params"],
            batch_stats=variables["batch_stats"],
            opt_state=tx.init(variables["params"]),
            step=jnp.zeros((), jnp.int32),
        )

    states = [init_one(s) for s in seeds]
    return jax.tree.map(lambda *xs: jnp.stack(xs), *states)


def make_multiseed_train_step(uq_state: UQState, tx, mesh: Mesh) -> Callable:
    """vmapped train step over the seed axis.

    Shard the stacked state with ``shard_multiseed_state`` first; GSPMD
    propagates the seed-axis sharding through the whole step (each chip
    updates its own replicas, zero collectives). Batch data is replicated —
    every replica sees the same batch; for per-seed batches add a leading S
    axis and change in_axes.
    """
    model = uq_state.model
    loss_pe = head_loss_pe_fn(uq_state.uncertainty_type)
    hyper = uq_state.params

    def train_step(state: TrainState, x, y, mask):
        def loss_of(params):
            out, updates = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                x,
                train=True,
                mutable=["batch_stats"],
            )
            return _masked_mean(loss_pe(out, y, hyper), mask), updates["batch_stats"]

        (loss, new_bs), grads = jax.value_and_grad(loss_of, has_aux=True)(state.params)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        return (
            state.replace(
                params=optax.apply_updates(state.params, updates),
                batch_stats=new_bs,
                opt_state=new_opt,
                step=state.step + 1,
            ),
            loss,
        )

    vstep = jax.vmap(train_step, in_axes=(0, None, None, None), out_axes=(0, 0))
    return jax.jit(vstep, donate_argnums=0)


def shard_multiseed_state(states: TrainState, mesh: Mesh) -> TrainState:
    """Place the stacked state with the seed axis sharded over the mesh."""
    sharding = NamedSharding(mesh, P(DATA_AXIS))
    return jax.tree.map(lambda x: jax.device_put(x, sharding), states)


def replica_state(uq_state: UQState, states: TrainState, s: int) -> UQState:
    """Extract replica s as a plain UQState (for calibration/evaluation)."""
    variables = {
        "params": jax.tree.map(lambda x: x[s], states.params),
        "batch_stats": jax.tree.map(lambda x: x[s], states.batch_stats),
    }
    return uq_state.replace(variables=variables)
