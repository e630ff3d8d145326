"""Multi-seed sweep parallelism: train S independent replicas at once.

The reference runs hyperparameter/seed sweeps as independent wandb-agent
processes, one grid point at a time (SURVEY.md §2 #20b). TPU-native
equivalent: stack S model replicas (one per seed) along a leading axis,
shard that axis over the mesh (S must divide the mesh's data axis), and
``shard_map`` the PLAIN per-seed train step — every chip trains its own
replica(s) with ZERO cross-chip communication; a sweep over S seeds costs
one seed's wall-clock. (vmapping the step over stacked params instead
lowers convs to slow batched-kernel form — see make_multiseed_train_step.)

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

    # one jit object for all seeds: a fresh lambda per seed would re-trace
    # (and re-lower) the full model init S times for identical shapes
    init_fn = jax.jit(lambda r, x: uq_state.model.init(r, x, train=False))

    def init_one(seed):
        variables = init_fn(jax.random.key(seed), example_input)
        return TrainState(
            params=variables["params"],
            batch_stats=variables["batch_stats"],
            opt_state=tx.init(variables["params"]),
            step=jnp.zeros((), jnp.int32),
        )

    states = [init_one(s) for s in seeds]
    return jax.tree.map(lambda *xs: jnp.stack(xs), *states)


def make_multiseed_train_step(uq_state: UQState, tx, mesh: Mesh) -> Callable:
    """Per-seed train step, seed axis sharded over the mesh via shard_map.

    Shard the stacked state with ``shard_multiseed_state`` first. Each chip
    runs the PLAIN single-model train step on its own seed shard (a
    ``lax.scan`` over local seeds when S > n_devices), with zero cross-chip
    communication. Batch data is replicated — every replica sees the same
    batch. S must divide evenly over the mesh's data axis.

    Round 5 replaced the original ``vmap``-over-stacked-params design:
    vmapping convolutions over a per-seed kernel axis lowers them to
    batched-kernel (grouped) convolutions, which hit slow fallback kernels
    (measured: the vmapped step executed ~25x slower per pixel than the
    plain step on the CPU mesh, and batched-kernel convs are off the fast
    conv path on TPU too). shard_map keeps every conv in its standard
    layout; per-replica numerics now match the solo train step exactly by
    construction.
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

    def local_seeds_step(states: TrainState, x, y, mask):
        # states: the local shard, leading axis = seeds on this device
        def body(carry, st):
            new_st, loss = train_step(st, x, y, mask)
            return carry, (new_st, loss)

        _, (new_states, losses) = jax.lax.scan(body, 0, states)
        return new_states, losses

    sharded = jax.shard_map(
        local_seeds_step,
        mesh=mesh,
        in_specs=(P(DATA_AXIS), P(), P(), P()),
        out_specs=(P(DATA_AXIS), P(DATA_AXIS)),
    )
    return jax.jit(sharded, donate_argnums=0)


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
