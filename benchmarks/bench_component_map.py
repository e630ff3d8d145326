"""Aggregate train-step device-busy time by model component.

Groups every profiler op by the `op_name` metadata of its HLO definition
(trunk/inc, trunk/up4, head, optimizer, ...) so perf work can be sized per
bucket instead of staring at a flat top-25. Companion of bench_hlo_map.py.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/bench_component_map.py [fp32|bfloat16] [batch]
"""

from __future__ import annotations

import collections
import re
import sys
import tempfile

import numpy as np


def component_of(hlo_def: str) -> str:
    m = re.search(r'op_name="jit\(train_step\)/([^"]*)"', hlo_def)
    if not m:
        return "(no metadata: optimizer/infra)"
    path = m.group(1)
    bwd = path.startswith("transpose(")
    p = re.sub(r"^transpose\(jvp\(UQModel\)\)/", "", path)
    p = re.sub(r"^jvp\(UQModel\)/", "", p)
    parts = p.split("/")
    if parts[0] == "trunk" and len(parts) > 1:
        comp = "trunk/" + parts[1]
    else:
        comp = parts[0]
    return comp + (" [bwd]" if bwd else " [fwd]")


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
    cfg = {
        "model": "UNet", "uncertainty_type": "quantiles",
        "q_lo": 0.05, "q_hi": 0.95, "q_lo_weight": 1.0, "q_hi_weight": 1.0,
        "mse_weight": 1.0, "compute_dtype": dtype, "conv_backend": "xla",
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

    compiled = step.lower(ts, x, y, mask).compile()
    hlo = compiled.as_text()
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
    comp = collections.Counter()
    unmatched = 0.0
    for name, dur in ops.items():
        d = defs.get(name)
        if d is None:
            unmatched += dur
            comp["(op not in HLO text)"] += dur
            continue
        comp[component_of(d)] += dur
    total = sum(ops.values()) / steps / 1e3
    print(f"dtype={dtype} batch={batch} total device-busy {total:.1f} ms/step")
    for k, v in comp.most_common():
        print(f"  {v / steps / 1e3:8.2f} ms  {k}")


if __name__ == "__main__":
    main()
