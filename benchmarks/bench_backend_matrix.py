"""Device-busy train-step time across conv backends × lane packing.

One process, shared compile cache: measures the flagship UNet+quantiles
train step (FastMRI geometry) for every backend combination and prints a
table — the input for resolve_conv_backend/resolve_lane_pack's 'auto'
gates. Device-busy ms from a profiler trace is the only load-independent
metric on the tunneled chip (STATUS.md).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/bench_backend_matrix.py [fp32|bfloat16] [batch] [combo ...]
  combo: backend:lane_pack[:bn_backend], e.g. xla:1 xla:1:dot pallas_fused:0
  (default: conv matrix at bn=flax plus the dot/barrier BN variants)
"""

from __future__ import annotations

import sys
import tempfile

import numpy as np


def measure(dtype: str, batch: int, backend: str, lane_pack: bool,
            bn_backend: str = "flax"):
    import jax
    import jax.numpy as jnp
    import optax

    from im2im_uq_tpu.models.assembly import add_uncertainty, build_trunk
    from im2im_uq_tpu.models.heads import head_loss_pe_fn
    from im2im_uq_tpu.training.train import TrainState, make_train_step
    from im2im_uq_tpu.utils.profiling import _tpu_op_durations, trace

    cfg = {
        "model": "UNet", "uncertainty_type": "quantiles",
        "q_lo": 0.05, "q_hi": 0.95, "q_lo_weight": 1.0, "q_hi_weight": 1.0,
        "mse_weight": 1.0, "compute_dtype": dtype, "conv_backend": backend,
        "lane_pack": lane_pack, "bn_backend": bn_backend,
    }
    x0 = jnp.zeros((1, 320, 320, 1), jnp.float32)
    st = add_uncertainty(
        build_trunk(cfg), cfg, rng=jax.random.key(0), example_input=x0
    )
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
        ops = _tpu_op_durations(td)
    if not ops:
        return None
    return sum(ops.values()) / steps / 1e3


def main():
    sys.path.insert(0, "/root/repo")
    from im2im_uq_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    dtype = sys.argv[1] if len(sys.argv) > 1 else "bfloat16"
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    combos = []
    for a in sys.argv[3:]:
        parts = a.split(":")
        combos.append(
            (parts[0], bool(int(parts[1])), parts[2] if len(parts) > 2 else "flax")
        )
    if not combos:
        combos = [
            ("xla", True, "flax"),    # current flagship (auto)
            ("xla", True, "dot"),     # MXU-dot BN reductions (ops/batchnorm.py)
            ("xla", True, "barrier"), # barrier-isolated BN reduce kernels
            ("pallas_fused", True, "flax"),
            ("pallas_fused", False, "flax"),
            ("pallas", True, "flax"),
            ("xla", False, "flax"),
        ]
    print(f"dtype={dtype} batch={batch} (device-busy ms/step, 3-step trace)")
    for backend, lp, bn in combos:
        tag = f"{backend}:lane_pack={int(lp)}:bn={bn}"
        try:
            ms = measure(dtype, batch, backend, lp, bn)
        except Exception as e:  # e.g. a Mosaic rejection at one level
            print(f"{tag:<34} ERROR {type(e).__name__}: {str(e)[:200]}",
                  flush=True)
            continue
        print(f"{tag:<34} {ms if ms is None else round(ms, 1)}", flush=True)


if __name__ == "__main__":
    main()
