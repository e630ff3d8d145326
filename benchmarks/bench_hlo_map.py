"""Map the train step's hottest profiler ops to their HLO definitions.

The bf16 step profile is flat (dozens of 2-5 ms fusions); this tool dumps
the compiled HLO of the flagship train step, traces a few steps, and for
each of the top-K ops prints its on-chip time together with the HLO
instruction that defines it (shapes + fused op kinds) — enough to decide
which fusion family to attack next.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/bench_hlo_map.py [fp32|bfloat16] [batch] [topk]
"""

from __future__ import annotations

import re
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
    from im2im_uq_tpu.utils.profiling import _tpu_op_durations, trace

    enable_compilation_cache()
    dtype = sys.argv[1] if len(sys.argv) > 1 else "bfloat16"
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    topk = int(sys.argv[3]) if len(sys.argv) > 3 else 40
    backend = sys.argv[4] if len(sys.argv) > 4 else "xla"
    lane_pack = sys.argv[5] if len(sys.argv) > 5 else "auto"
    cfg = {
        "model": "UNet", "uncertainty_type": "quantiles",
        "q_lo": 0.05, "q_hi": 0.95, "q_lo_weight": 1.0, "q_hi_weight": 1.0,
        "mse_weight": 1.0, "compute_dtype": dtype, "conv_backend": backend,
        "lane_pack": lane_pack if lane_pack == "auto" else bool(int(lane_pack)),
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

    # compiled HLO text (instruction names match the profiler's op names)
    try:
        compiled = step.lower(ts, x, y, mask).compile()
        hlo = compiled.as_text()
    except Exception as e:  # step may be a plain function wrapping a jit
        print("no .lower on step:", e)
        hlo = ""
    with open("/tmp/train_step_hlo.txt", "w") as fh:
        fh.write(hlo)
    print(f"HLO dumped: {len(hlo.splitlines())} lines -> /tmp/train_step_hlo.txt")

    # index: instruction name -> its definition line (and for fusions, the
    # computation body name so callers can look deeper)
    defs = {}
    for line in hlo.splitlines():
        m = re.match(r"\s*(?:ROOT )?%?([\w.-]+)\s*=\s*(.*)", line)
        if m:
            defs.setdefault(m.group(1), m.group(2))

    ts2, loss = step(ts, x, y, mask)
    jax.block_until_ready(loss)
    steps = 3
    with tempfile.TemporaryDirectory() as td:
        with trace(td):
            for _ in range(steps):
                ts2, loss = step(ts2, x, y, mask)
            jax.block_until_ready(loss)
        ops = _tpu_op_durations(td)
    if not ops:
        print("no trace")
        return
    total = sum(ops.values()) / steps / 1e3
    print(f"total device-busy {total:.1f} ms/step; top {topk}:")
    for name, dur in ops.most_common(topk):
        ms = dur / steps / 1e3
        d = defs.get(name, "?")
        print(f"{ms:8.2f} ms  {name}")
        print(f"           {d[:300]}")


if __name__ == "__main__":
    main()
