"""Bytes-based roofline audit of the flagship train step.

VERDICT r2 #3 asked for proof, not assertion, that the BN/elementwise
bucket is at its memory-bandwidth ceiling. This tool computes, for every
top-level HLO instruction of the compiled train step, the HBM bytes it
touches (sum of operand + output array sizes parsed from the compiled
HLO's ENTRY computation), joins that with the per-op device-busy time
from a profiler trace, and prints per-family:

    measured ms | bytes moved | roofline ms (bytes / peak HBM BW) | % of peak

If a family's measured time ≈ its roofline time, it is HBM-bound and the
only remaining lever is *moving fewer bytes* (fusion/remat/dtype), not a
faster kernel. The tool also cross-checks the whole-step totals against
XLA's own cost model (``compiled.cost_analysis()``).

v5e peak numbers: 819 GB/s HBM bandwidth, 197 TFLOP/s bf16.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/bench_roofline.py \
          [fp32|bfloat16] [batch] [conv_backend] [lane_pack] [remat]
"""

from __future__ import annotations

import re
import sys
import tempfile
from collections import Counter

import numpy as np

HBM_GBPS = 819.0  # v5e HBM2E peak
PEAK_BF16 = 197e12  # v5e bf16 FLOP/s peak

_DTYPE_BYTES = {
    "pred": 1, "s8": 1, "u8": 1, "s16": 2, "u16": 2, "f16": 2, "bf16": 2,
    "s32": 4, "u32": 4, "f32": 4, "s64": 8, "u64": 8, "f64": 8, "c64": 8,
    "c128": 16,
}

_TYPE_RE = re.compile(r"(pred|[su]\d+|bf16|f16|f32|f64|c64|c128)\[([\d,]*)\]")


def _array_bytes(type_text: str) -> int:
    """Total bytes of every array literal in an HLO type string
    (handles tuples: ``(bf16[2,3]{1,0}, f32[4]{0})``)."""
    total = 0
    for dt, dims in _TYPE_RE.findall(type_text):
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * _DTYPE_BYTES[dt]
    return total


def _balanced(text: str, open_ch: str = "(", close_ch: str = ")") -> int:
    """Index one past the matching close of the opener at text[0]."""
    depth = 0
    for i, ch in enumerate(text):
        if ch == open_ch:
            depth += 1
        elif ch == close_ch:
            depth -= 1
            if depth == 0:
                return i + 1
    return len(text)


def parse_entry(hlo: str):
    """Parse the ENTRY computation: name -> (type_text, opcode, operands, rhs).

    Only ENTRY instructions touch HBM at the granularity the profiler
    reports (fusion internals live in registers/VMEM); inner-computation
    names can collide with ENTRY names, so everything else is skipped.
    Tuple types contain spaces and nested parens (layout tilings like
    ``{3,0,2,1:T(8,128)(2,1)}``), so the type is scanned balanced, not
    regexed.
    """
    lines = hlo.splitlines()
    out = {}
    in_entry = False
    for line in lines:
        if line.startswith("ENTRY "):
            in_entry = True
            continue
        if in_entry and line.startswith("}"):
            break
        if not in_entry:
            continue
        m = re.match(r"\s*(?:ROOT )?%?([\w.-]+)\s*=\s*(.*)$", line)
        if not m:
            continue
        name, rhs = m.groups()
        if rhs.startswith("("):  # tuple type: balanced scan
            tlen = _balanced(rhs)
        else:
            tlen = rhs.find(" ")
            if tlen < 0:
                continue
        type_text, rest = rhs[:tlen], rhs[tlen:].lstrip()
        om = re.match(r"([\w-]+)\(", rest)
        if not om:
            continue
        opcode = om.group(1)
        args = rest[om.end():]
        operands = re.findall(r"%([\w.-]+)", args[: _balanced("(" + args) - 1])
        out[name] = (type_text, opcode, operands, rhs)
    return out


_FREE_OPS = {"get-tuple-element", "tuple", "parameter", "bitcast", "constant"}
# Async data movement: the -start op's result tuple already holds
# (dest, source, context), i.e. read + write traffic exactly once; the
# -done op just unwraps it. Counting operands too would double/triple
# count, and the profiler hides their true time (overlapped with
# compute), so they get their own family below.
_ASYNC_START = {"copy-start", "async-start", "slice-start", "all-gather-start",
                "collective-permute-start", "all-reduce-start"}
_ASYNC_DONE = {"copy-done", "async-done", "slice-done", "all-gather-done",
               "collective-permute-done", "all-reduce-done"}


def op_bytes(name: str, entry: dict) -> int:
    """HBM bytes an ENTRY op moves: operand arrays read + output written."""
    type_text, opcode, operands, _ = entry[name]
    if opcode in _FREE_OPS or opcode in _ASYNC_DONE:
        return 0
    if opcode in _ASYNC_START:
        return _array_bytes(type_text)
    total = _array_bytes(type_text)
    for o in operands:
        if o in entry and entry[o][1] != "tuple":
            if entry[o][1] in _ASYNC_START or entry[o][1] in _ASYNC_DONE:
                continue  # traffic already charged to the async start op
            total += _array_bytes(entry[o][0])
    return total


def main():
    import jax
    import jax.numpy as jnp
    import optax

    sys.path.insert(0, "/root/repo")
    sys.path.insert(0, "/root/repo/benchmarks")
    from bench_time_buckets import classify

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
    remat = sys.argv[5] if len(sys.argv) > 5 else False
    if isinstance(remat, str) and remat.lower() in ("false", "0", "none"):
        remat = False
    cfg = {
        "model": "UNet", "uncertainty_type": "quantiles",
        "q_lo": 0.05, "q_hi": 0.95, "q_lo_weight": 1.0, "q_hi_weight": 1.0,
        "mse_weight": 1.0, "compute_dtype": dtype, "conv_backend": backend,
        "lane_pack": lane_pack if lane_pack == "auto" else bool(int(lane_pack)),
        "remat": remat,
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
    entry = parse_entry(compiled.as_text())
    xla_cost = {}
    try:
        ca = compiled.cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        xla_cost = dict(ca or {})
    except Exception:
        pass

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
        print("no trace (backend without TPU trace support?)")
        return

    fam_ms, fam_bytes = Counter(), Counter()
    missing = []
    for name, dur in ops.items():
        ms = dur / steps / 1e3
        if name in entry:
            d = entry[name][3]
            b = op_bytes(name, entry)
            opcode = entry[name][1]
        else:
            d, b, opcode = "", 0, ""
            missing.append((ms, name))
        if opcode in _ASYNC_START or opcode in _ASYNC_DONE:
            # real HBM traffic but overlapped with compute in the schedule:
            # its time hides inside other ops, so keep it out of the
            # per-family bound-ness comparison.
            f = "async copy (overlapped)"
        else:
            f = classify(name, d)
        fam_ms[f] += ms
        fam_bytes[f] += b

    total_ms = sum(fam_ms.values())
    total_bytes = sum(fam_bytes.values())
    print(f"dtype={dtype} batch={batch} conv={backend} lane_pack={lane_pack} remat={remat}")
    print(f"measured device-busy {total_ms:.1f} ms/step | "
          f"HLO-parsed traffic {total_bytes / 1e9:.2f} GB/step | "
          f"roofline (traffic/819GB/s) {total_bytes / HBM_GBPS / 1e6:.1f} ms")
    if xla_cost:
        fl = xla_cost.get("flops", 0.0)
        ba = xla_cost.get("bytes accessed", 0.0)
        print(f"XLA cost model: {fl / 1e12:.2f} TFLOP/step "
              f"(MXU floor {fl / PEAK_BF16 * 1e3:.1f} ms bf16) | "
              f"bytes accessed {ba / 1e9:.2f} GB (roofline {ba / HBM_GBPS / 1e6:.1f} ms)")
    hdr = f"{'family':<26}{'ms':>9}{'GB':>9}{'roofline ms':>13}{'% of BW peak':>14}"
    print(hdr)
    print("-" * len(hdr))
    for f, ms in fam_ms.most_common():
        gb = fam_bytes[f] / 1e9
        roof = fam_bytes[f] / HBM_GBPS / 1e6
        eff = 100.0 * roof / ms if ms > 0 else 0.0
        print(f"{f:<26}{ms:>9.2f}{gb:>9.2f}{roof:>13.2f}{eff:>13.1f}%")
    if missing:
        mm = sum(m for m, _ in missing)
        print(f"(unmatched trace ops: {len(missing)}, {mm:.2f} ms — "
              f"e.g. {sorted(missing, reverse=True)[:3]})")


if __name__ == "__main__":
    main()
