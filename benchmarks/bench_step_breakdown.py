"""Per-op device-busy breakdown of the flagship train step.

Traces a few steps of UNet+quantiles training at FastMRI geometry and
prints the top ops by on-chip busy time (load-independent — see
utils/profiling.py). Use to decide where the next kernel/fusion work goes.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/bench_step_breakdown.py [fp32|bfloat16] [batch] [xla|pallas|pallas_fused|auto] [lane_pack: auto|0|1]
"""

from __future__ import annotations

import sys
import tempfile

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    import optax

    sys.path.insert(0, "/root/repo")
    from im2im_uq_tpu.models.assembly import add_uncertainty, build_trunk
    from im2im_uq_tpu.models.heads import head_loss_pe_fn
    from im2im_uq_tpu.training.train import TrainState, make_train_step
    from im2im_uq_tpu.utils.cache import enable_compilation_cache
    from im2im_uq_tpu.utils.profiling import device_busy_ops, trace

    enable_compilation_cache()
    dtype = sys.argv[1] if len(sys.argv) > 1 else "bfloat16"
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    conv_backend = sys.argv[3] if len(sys.argv) > 3 else "auto"
    lane_pack = sys.argv[4] if len(sys.argv) > 4 else "auto"
    if lane_pack in ("0", "1"):
        lane_pack = bool(int(lane_pack))
    cfg = {
        "model": "UNet", "uncertainty_type": "quantiles",
        "q_lo": 0.05, "q_hi": 0.95, "q_lo_weight": 1.0, "q_hi_weight": 1.0,
        "mse_weight": 1.0, "compute_dtype": dtype, "conv_backend": conv_backend,
        "lane_pack": lane_pack,
    }
    x0 = jnp.zeros((1, 320, 320, 1), jnp.float32)
    st = add_uncertainty(build_trunk(cfg), cfg, rng=jax.random.key(0), example_input=x0)
    tx = optax.adam(1e-3)
    ts = TrainState(
        params=st.variables["params"],
        batch_stats=st.variables["batch_stats"],
        opt_state=tx.init(st.variables["params"]),
        step=jnp.zeros((), jnp.int32),
    )
    step = make_train_step(st.model, head_loss_pe_fn("quantiles"), cfg, tx)
    rng = np.random.RandomState(0)
    x = rng.randn(batch, 320, 320, 1).astype(np.float32)
    y = rng.randn(batch, 320, 320, 1).astype(np.float32)
    mask = np.ones((batch,), np.float32)
    ts, loss = step(ts, x, y, mask)  # compile
    jax.block_until_ready(loss)

    steps = 3
    with tempfile.TemporaryDirectory() as td:
        with trace(td):
            for _ in range(steps):
                ts, loss = step(ts, x, y, mask)
            jax.block_until_ready(loss)
        result = device_busy_ops(td, steps=steps)
    if result is None:
        print(f"dtype={dtype} batch={batch}: no profiler trace captured "
              "(backend without TPU trace support?)")
        return
    print(f"dtype={dtype} batch={batch} conv={conv_backend} "
          f"total device-busy {result['total_ms']:.1f} ms/step")
    for name, ms in result["ops"]:
        print(f"  {ms:8.2f} ms  {name}")


if __name__ == "__main__":
    main()
