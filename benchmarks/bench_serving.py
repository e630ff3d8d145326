"""Serving-path benchmark: calibrated-interval forward (nested_sets).

The serving deliverable (scripts/infer.py) runs `UQState.nested_sets` —
trunk forward + head + λ-scaled interval algebra, no backward. This sizes
it the same way bench_time_buckets sizes the train step:

  1. device-busy ms/batch and a per-family bucket breakdown (conv fwd,
     bn/elementwise, pool, resize, head+sets) from a profiler trace;
  2. a batch-size sweep — serving has no optimizer/backward state, so the
     best imgs/s batch may differ from training's;
  3. the roofline context: forward HLO bytes + XLA FLOPs so headroom is a
     number, not a guess (same method as benchmarks/bench_roofline.py).

Usage:
  PYTHONPATH=/root/repo python benchmarks/bench_serving.py \
      [bfloat16|fp32] [conv_backend] [batches...]

conv_backend ∈ {auto, xla, pallas, pallas_fused}: the train-step gates
keep XLA because the custom-VJP boundary around each Pallas call costs
more than the kernel wins — but serving never differentiates, so the
forward-only economics differ and must be measured separately.
"""

from __future__ import annotations

import sys
import tempfile
from collections import Counter

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from benchmarks.bench_time_buckets import classify  # noqa: E402

IMAGE = 320


def _hlo_defs(compiled) -> dict:
    """name → HLO definition line, for classify()'s metadata lookup.

    Same extraction as benchmarks/bench_time_buckets.py so profiler op
    names (which keep their numeric suffix, e.g. ``fusion.123``) resolve.
    """
    import re

    defs = {}
    try:
        for line in compiled.as_text().splitlines():
            m = re.match(r"\s*(?:ROOT )?%?([\w.-]+)\s*=\s*(.*)", line)
            if m:
                defs.setdefault(m.group(1), m.group(2))
    except Exception:
        pass
    return defs


def main() -> None:
    import jax
    import jax.numpy as jnp

    from im2im_uq_tpu.models.assembly import add_uncertainty, build_trunk
    from im2im_uq_tpu.utils.cache import enable_compilation_cache
    from im2im_uq_tpu.utils.profiling import _tpu_op_durations

    enable_compilation_cache()
    dtype = sys.argv[1] if len(sys.argv) > 1 else "bfloat16"
    backend = sys.argv[2] if len(sys.argv) > 2 else "auto"
    batches = [int(b) for b in sys.argv[3:]] or [16, 32, 64]

    config = {
        "model": "UNet",
        "uncertainty_type": "quantiles",
        "q_lo": 0.05,
        "q_hi": 0.95,
        "conv_backend": backend,
    }
    if dtype != "fp32":
        config["compute_dtype"] = dtype

    x0 = jnp.zeros((1, IMAGE, IMAGE, 1), jnp.float32)
    state = add_uncertainty(
        build_trunk(config), config, rng=jax.random.key(0), example_input=x0
    )

    print(f"serving nested_sets, {dtype}, conv_backend={backend}, {IMAGE}x{IMAGE}x1")
    for batch in batches:
        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.randn(batch, IMAGE, IMAGE, 1).astype(np.float32))
        lo, _, hi = state.nested_sets(x, lam=1.0)  # compile + warmup
        jax.block_until_ready(lo)

        steps = 5
        with tempfile.TemporaryDirectory() as td:
            with jax.profiler.trace(td):
                for _ in range(steps):
                    lo, _, hi = state.nested_sets(x, lam=1.0)
                jax.block_until_ready(lo)
            durs = _tpu_op_durations(td)
        if not durs:
            print(f"  batch {batch}: no profiler trace available")
            continue
        total_ms = sum(durs.values()) / steps / 1e3

        # bucket by family using the compiled nested_sets HLO metadata
        from im2im_uq_tpu.models.assembly import _jitted_nested_sets

        fn = _jitted_nested_sets(state.model, state.uncertainty_type)
        compiled = fn.lower(state.variables, x, jnp.float32(1.0)).compile()
        defs = _hlo_defs(compiled)
        fams: Counter = Counter()
        for name, d in durs.items():
            fams[classify(name, defs.get(name, ""))] += d / steps / 1e3

        flops = None
        try:
            ca = compiled.cost_analysis()
            ca0 = ca[0] if isinstance(ca, (list, tuple)) else ca
            flops = float(ca0.get("flops", 0.0)) or None
        except Exception:
            pass
        mfu = (
            f", MFU {flops / (total_ms / 1e3) / 197e12 * 100:.1f}%" if flops else ""
        )
        print(
            f"  batch {batch}: {total_ms:.2f} ms/batch = "
            f"{batch / total_ms * 1e3:.1f} imgs/s{mfu}"
        )
        for fam, ms in fams.most_common():
            print(f"    {fam:<24} {ms:7.2f} ms")


if __name__ == "__main__":
    main()
