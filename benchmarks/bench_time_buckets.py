"""Bucket the train step's device time by op family.

Complements bench_component_map (per-layer) and bench_hlo_map (per-op):
attributes every profiler op to a family — conv-forward, conv-dgrad,
conv-wgrad, BN/elementwise, pool fwd/bwd, resize, optimizer, head, infra —
using the compiled HLO's metadata + operand names. Prints family totals so
each optimization target is sized before kernel work starts.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/bench_time_buckets.py [fp32|bfloat16] [batch]
"""

from __future__ import annotations

import re
import sys
import tempfile
from collections import Counter

import numpy as np


def classify(name: str, d: str) -> str:
    """Map an op (profiler name + HLO definition line) to a family."""
    meta = re.search(r'op_name="([^"]*)"', d)
    op = meta.group(1) if meta else ""
    bwd = "transpose(jvp" in op
    if "opt_state" in d or "adam" in op:
        return "optimizer"
    if name.startswith("select_and_scatter") or "select_and_scatter" in d.split("metadata")[0]:
        return "pool bwd"
    if "reduce_window" in d.split("metadata")[0] or "/max_pool" in op:
        return "pool fwd" if not bwd else "pool bwd"
    if "resize" in op or "upsample" in op or "pallas" in op.lower() or "tpu_custom_call" in d:
        return "resize/pallas " + ("bwd" if bwd else "fwd")
    if "/head/" in op or "loss" in op:
        return "head+loss"
    if "conv_general_dilated" in op or "convolution" in d.split("metadata")[0]:
        # fusions tagged with a conv op_name: decide by output shape.
        # wgrad outputs a [3,3,ci,co] kernel; dgrad/fwd output activations.
        out = d.split("=")[0] if "=" not in d else d
        shape = re.match(r"\s*\(?\s*(?:bf16|f32)\[([\d,]+)\]", d)
        if shape:
            dims = shape.group(1).split(",")
            if len(dims) == 4 and dims[0] == "3" and dims[1] == "3":
                return "conv wgrad"
        if not re.search(r"convolution", d.split("metadata")[0]):
            # a fusion feeding/consuming a conv: elementwise epilogue
            return "bn/elementwise " + ("bwd" if bwd else "fwd")
        return "conv dgrad" if bwd else "conv fwd"
    if "batch_stats" in op or "BatchNorm" in op or "bn" in op:
        return "bn/elementwise " + ("bwd" if bwd else "fwd")
    if not op:
        return "infra/untagged"
    return ("bwd-other" if bwd else "fwd-other")


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
    backend = sys.argv[3] if len(sys.argv) > 3 else "auto"
    lane_pack = sys.argv[4] if len(sys.argv) > 4 else "auto"
    bn_backend = sys.argv[5] if len(sys.argv) > 5 else "auto"
    cfg = {
        "model": "UNet", "uncertainty_type": "quantiles",
        "q_lo": 0.05, "q_hi": 0.95, "q_lo_weight": 1.0, "q_hi_weight": 1.0,
        "mse_weight": 1.0, "compute_dtype": dtype, "conv_backend": backend,
        "lane_pack": lane_pack if lane_pack == "auto" else bool(int(lane_pack)),
        "bn_backend": bn_backend,
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

    try:
        hlo = step.lower(ts, x, y, mask).compile().as_text()
    except Exception:
        hlo = ""
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
    fam = Counter()
    detail = {}
    for name, dur in ops.items():
        ms = dur / steps / 1e3
        f = classify(name, defs.get(name, ""))
        fam[f] += ms
        detail.setdefault(f, []).append((ms, name))
    print(f"dtype={dtype} batch={batch} total device-busy {total:.1f} ms/step")
    for f, ms in fam.most_common():
        n = len(detail[f])
        top = sorted(detail[f], reverse=True)[:3]
        tops = ", ".join(f"{nm} {m:.2f}" for m, nm in top)
        print(f"{ms:8.2f} ms  {f:<24} ({n} ops; top: {tops})")


if __name__ == "__main__":
    main()
