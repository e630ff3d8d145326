"""Probe: train-step throughput fp32 vs bf16 (bf16 activations through BN).

Measures the jitted UNet+quantiles train step at FastMRI geometry on
whatever backend is active (run with the default axon env for the real
chip). Prints one JSON line per dtype config.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from im2im_uq_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

BATCH = 32
IMAGE = 320
STEPS = 20


def run(compute_dtype: str | None) -> float:
    import jax
    import jax.numpy as jnp
    import optax

    from im2im_uq_tpu.models.assembly import add_uncertainty, build_trunk
    from im2im_uq_tpu.models.heads import head_loss_pe_fn
    from im2im_uq_tpu.parallel.mesh import data_parallel_mesh, replicate_tree
    from im2im_uq_tpu.training.train import TrainState, make_train_step

    config = {
        "model": "UNet",
        "uncertainty_type": "quantiles",
        "q_lo": 0.05,
        "q_hi": 0.95,
        "q_lo_weight": 1.0,
        "q_hi_weight": 1.0,
        "mse_weight": 1.0,
    }
    if compute_dtype:
        config["compute_dtype"] = compute_dtype
    mesh = data_parallel_mesh()
    x0 = jnp.zeros((1, IMAGE, IMAGE, 1), jnp.float32)
    state = add_uncertainty(
        build_trunk(config), config, rng=jax.random.key(0), example_input=x0
    )
    tx = optax.adam(1e-3)
    ts = TrainState(
        params=state.variables["params"],
        batch_stats=state.variables["batch_stats"],
        opt_state=tx.init(state.variables["params"]),
        step=jnp.zeros((), jnp.int32),
    )
    ts = replicate_tree(mesh, ts)
    step = make_train_step(state.model, head_loss_pe_fn("quantiles"), config, tx, mesh)

    rng = np.random.RandomState(0)
    x = rng.randn(BATCH, IMAGE, IMAGE, 1).astype(np.float32)
    y = rng.randn(BATCH, IMAGE, IMAGE, 1).astype(np.float32)
    mask = np.ones((BATCH,), np.float32)

    t0 = time.perf_counter()
    ts, loss = step(ts, x, y, mask)
    jax.block_until_ready(loss)
    compile_s = time.perf_counter() - t0
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(STEPS):
            ts, loss = step(ts, x, y, mask)
        jax.block_until_ready(loss)
        best = min(best, time.perf_counter() - t0)
    ips = BATCH * STEPS / best
    print(
        json.dumps(
            {
                "compute_dtype": compute_dtype or "float32",
                "imgs_per_sec": round(ips, 1),
                "step_ms": round(best / STEPS * 1e3, 2),
                "compile_s": round(compile_s, 1),
                "final_loss": float(loss),
            }
        ),
        flush=True,
    )
    return ips


if __name__ == "__main__":
    for d in (sys.argv[1:] or [None, "bfloat16"]):
        run(None if d in (None, "float32") else d)
