"""Live TPU drive of the round-3 precompile-thread race (run manually).

Usage (on the TPU host, NOT under the CPU-pinned pytest conftest):

    PYTHONPATH=/root/repo:/root/.axon_site timeout 900 python tools/tpu_race_check.py

Reproduces the exact round-3 failure geometry — a `precompile_calibration`
background thread running while the main thread dispatches train steps —
and exits 0 iff every main-thread dispatch succeeds, the thread finishes,
the AOT executable is registered, and a subsequent calibrate_model runs.
Round 3's design (thread executes a dummy batch) deterministically crashed
here: main-thread INVALID_ARGUMENT, then SIGABRT from the worker.
"""

import sys
import time

import numpy as np


def main() -> int:
    import jax
    import jax.numpy as jnp
    import optax

    from im2im_uq_tpu.calibration.rcps import (
        _AOT_TABLE,
        calibrate_model,
        precompile_calibration,
    )
    from im2im_uq_tpu.models.assembly import add_uncertainty, build_trunk
    from im2im_uq_tpu.models.heads import head_loss_pe_fn
    from im2im_uq_tpu.parallel.mesh import data_parallel_mesh, replicate_tree
    from im2im_uq_tpu.training.train import TrainState, make_train_step
    from im2im_uq_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    B, IMG = 32, 320
    cfg = {
        "model": "UNet", "uncertainty_type": "quantiles",
        "q_lo": 0.05, "q_hi": 0.95, "q_lo_weight": 1.0, "q_hi_weight": 1.0,
        "mse_weight": 1.0, "alpha": 0.1, "delta": 0.1, "num_lambdas": 1000,
        "minimum_lambda": 0.0, "maximum_lambda": 6.0,
        "rcps_loss": "fraction_missed", "batch_size": B,
        "compute_dtype": "bfloat16",
    }
    mesh = data_parallel_mesh()
    x0 = jnp.zeros((1, IMG, IMG, 1), jnp.float32)
    state = add_uncertainty(
        build_trunk(cfg), cfg, rng=jax.random.key(0), example_input=x0
    )
    tx = optax.adam(1e-3)
    ts = TrainState(
        params=state.variables["params"],
        batch_stats=state.variables["batch_stats"],
        opt_state=tx.init(state.variables["params"]),
        step=jnp.zeros((), jnp.int32),
    )
    ts = replicate_tree(mesh, ts)
    step = make_train_step(state.model, head_loss_pe_fn("quantiles"), cfg, tx, mesh)
    r = np.random.RandomState(0)
    x = r.randn(B, IMG, IMG, 1).astype(np.float32)
    y = r.randn(B, IMG, IMG, 1).astype(np.float32)
    mask = np.ones((B,), np.float32)

    # the round-3 crash window: start the precompile thread, then hammer
    # main-thread dispatch (compile + steps + misc ops) while it runs
    t = precompile_calibration(state, cfg, (x[0], y[0]), mesh=mesh, batch_size=B)
    t0 = time.time()
    ts, loss = step(ts, x, y, mask)  # train-step compile overlaps the thread
    jax.block_until_ready(loss)
    n = 0
    while t.is_alive() or n < 20:
        ts, loss = step(ts, x, y, mask)
        _ = jax.random.key(n)  # the exact dispatch that died in round 3
        jax.block_until_ready(loss)
        n += 1
        if n > 400:
            break
    jax.block_until_ready(loss)
    t.join(timeout=600)
    assert not t.is_alive(), "precompile thread never finished"
    assert len(_AOT_TABLE) == 1, "AOT executable not registered"
    assert np.isfinite(float(loss)), "non-finite loss"
    print(f"race window survived: {n} steps over {time.time()-t0:.1f}s "
          f"with the precompile thread live; AOT registered")

    class _DS:
        def __len__(self):
            return B

        def __getitem__(self, i):
            rr = np.random.RandomState(i)
            return (rr.randn(IMG, IMG, 1).astype(np.float32),
                    rr.randn(IMG, IMG, 1).astype(np.float32))

    st = state.replace(
        variables={"params": ts.params, "batch_stats": ts.batch_stats}
    )
    t0 = time.time()
    st, _ = calibrate_model(st, _DS(), cfg, mesh=mesh, batch_size=B)
    print(f"calibrate_model after precompile: {time.time()-t0:.1f}s "
          f"(AOT-warm), lhat={st.lhat}")
    print("TPU_RACE_CHECK_OK")
    return 0


if __name__ == "__main__":
    sys.exit(main())
