"""Benchmark: flagship UNet+quantiles training throughput on the real TPU.

Prints exactly one JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...extras}

Primary metric: training images/sec/chip at FastMRI geometry (320x320x1,
the reference's headline workload — BASELINE.md north stars). Also measures
RCPS calibration wall-clock for the <60 s north-star target and reports it
in the extras.

vs_baseline compares against BENCH_BASELINE.json (a measured reference-
implementation number on available hardware) when present, else 1.0.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from im2im_uq_tpu.utils.cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

BATCH = 32
IMAGE = 320
TRAIN_STEPS = 20
CALIB_N = 128
NUM_LAMBDAS = 1000


def _device_busy_ms(step, ts, x, y, mask, steps: int = 3):
    """On-chip busy ms per train step from a short profiler trace."""
    import tempfile

    import jax
    import jax.numpy as jnp

    from im2im_uq_tpu.utils.profiling import device_busy_breakdown

    try:
        # the train step donates its state argument — run on a private copy
        # so the caller's buffers survive
        ts = jax.tree.map(lambda a: jnp.array(a, copy=True), ts)
        with tempfile.TemporaryDirectory() as td:
            with jax.profiler.trace(td):
                for _ in range(steps):
                    ts, loss = step(ts, x, y, mask)
                jax.block_until_ready(loss)
            breakdown = device_busy_breakdown(td, steps=steps)
        return breakdown["total_ms"] if breakdown else None
    except Exception:
        return None  # profiling is best-effort (not supported on all backends)


def main() -> None:
    import jax
    import jax.numpy as jnp
    import optax

    from im2im_uq_tpu.calibration.rcps import calibrate_model
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
        "alpha": 0.1,
        "delta": 0.1,
        "num_lambdas": NUM_LAMBDAS,
        "minimum_lambda": 0.0,
        "maximum_lambda": 6.0,
        "rcps_loss": "fraction_missed",
        "batch_size": 64,
        "dataset": "synthetic",
    }
    n_chips = len(jax.devices())
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

    # kick off the calibration-program compile in the background, exactly as
    # train_net does in production — it overlaps the train compile+steps
    # below, so "cold" calibration pays deserialization, not compilation
    from im2im_uq_tpu.calibration.rcps import precompile_calibration

    precompile_thread = precompile_calibration(
        state, config, (x[0], y[0]), mesh=mesh, batch_size=32
    )

    # warmup/compile
    ts, loss = step(ts, x, y, mask)
    jax.block_until_ready(loss)
    # wall-clock windows (median of 3) — reported as an *extra* only: the
    # tunneled chip's wall clock misreports under load (STATUS.md), so the
    # headline is derived from profiler device-busy time below
    wall_dts = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(TRAIN_STEPS):
            ts, loss = step(ts, x, y, mask)
        jax.block_until_ready(loss)
        wall_dts.append(time.perf_counter() - t0)
    wall_ms_per_step = sorted(wall_dts)[1] / TRAIN_STEPS * 1e3

    # device-busy time from a profiler trace: the tunnel's wall clock can
    # misreport under load, so also derive on-chip busy ms/step (sum of
    # device-lane op durations / steps) as a load-independent cross-check
    device_ms_per_step = _device_busy_ms(step, ts, x, y, mask, steps=3)

    # in-graph K-step loop: ONE dispatch runs lax.fori_loop over the train
    # step on a device-resident batch — immune to per-step dispatch overhead
    # and host→device feeds, so its wall time is a *measured* ms/step that
    # either confirms the device-busy headline or quantifies the gap
    # (VERDICT r2 #2)
    from im2im_uq_tpu.parallel.mesh import shard_batch
    from im2im_uq_tpu.training.train import make_train_multistep

    def _ingraph_ms(cfg, model, variables, reps: int = 2):
        loop = make_train_multistep(
            model, head_loss_pe_fn("quantiles"), cfg, tx, TRAIN_STEPS,
            mesh=mesh,
        )
        lts = TrainState(
            params=jax.tree.map(lambda a: jnp.array(a, copy=True), variables["params"]),
            batch_stats=jax.tree.map(
                lambda a: jnp.array(a, copy=True), variables["batch_stats"]
            ),
            opt_state=tx.init(variables["params"]),
            step=jnp.zeros((), jnp.int32),
        )
        lts = replicate_tree(mesh, lts)
        xd, yd, md = shard_batch(mesh, (x, y, mask))
        lts, l = loop(lts, xd, yd, md)  # compile + warmup
        jax.block_until_ready(l)
        best = None
        for _ in range(reps):
            t0 = time.perf_counter()
            lts, l = loop(lts, xd, yd, md)
            jax.block_until_ready(l)
            dt = (time.perf_counter() - t0) / TRAIN_STEPS * 1e3
            best = dt if best is None else min(best, dt)
        del lts
        return best

    try:
        ingraph_ms_fp32 = _ingraph_ms(config, state.model, state.variables)
    except Exception as e:
        print(f"# in-graph loop (fp32) skipped: {e}", file=sys.stderr)
        ingraph_ms_fp32 = None

    # bf16 activation path (reference numerics stay fp32; this is the
    # TPU-native precision option) — device-busy only
    bf16_cfg = dict(config, compute_dtype="bfloat16")
    state16 = add_uncertainty(
        build_trunk(bf16_cfg), bf16_cfg, rng=jax.random.key(0), example_input=x0
    )
    ts16 = TrainState(
        params=state16.variables["params"],
        batch_stats=state16.variables["batch_stats"],
        opt_state=tx.init(state16.variables["params"]),
        step=jnp.zeros((), jnp.int32),
    )
    ts16 = replicate_tree(mesh, ts16)
    step16 = make_train_step(
        state16.model, head_loss_pe_fn("quantiles"), bf16_cfg, tx, mesh
    )
    ts16, l16 = step16(ts16, x, y, mask)
    jax.block_until_ready(l16)
    device_ms_bf16 = _device_busy_ms(step16, ts16, x, y, mask, steps=3)

    try:
        ingraph_ms_bf16 = _ingraph_ms(bf16_cfg, state16.model, state16.variables)
    except Exception as e:
        print(f"# in-graph loop (bf16) skipped: {e}", file=sys.stderr)
        ingraph_ms_bf16 = None

    # FLOPs/step from XLA's own cost model (for the MFU extra); analytic
    # fallback: ~97 GFLOP fwd/img at 320^2 (XLA cost analysis of the UNet
    # forward) x 3 for fwd+bwd
    flops_per_step = None
    try:
        ca = step16.lower(ts16, x, y, mask).compile().cost_analysis()
        ca0 = ca[0] if isinstance(ca, (list, tuple)) else ca
        if ca0:
            flops_per_step = float(ca0.get("flops", 0.0)) or None
    except Exception:
        pass
    if not flops_per_step:
        flops_per_step = 97e9 * 3 * BATCH

    # serving throughput: the scripts.infer path — calibrated-interval
    # forward (nested_sets) on the production bf16 model. Device-busy from
    # a short trace (tunnel-load-independent), wall as the dispatch check.
    serve_ms_busy = serve_ms_wall = None
    try:
        import tempfile as _tf

        from im2im_uq_tpu.utils.profiling import device_busy_breakdown

        eval16 = state16.replace(
            variables={"params": ts16.params, "batch_stats": ts16.batch_stats}
        )
        xj = jnp.asarray(x)
        lo, _, hi = eval16.nested_sets(xj, lam=1.0)  # compile + warmup
        jax.block_until_ready(lo)
        t0 = time.perf_counter()
        for _ in range(TRAIN_STEPS):
            lo, _, hi = eval16.nested_sets(xj, lam=1.0)
        jax.block_until_ready(lo)
        serve_ms_wall = (time.perf_counter() - t0) / TRAIN_STEPS * 1e3
        with _tf.TemporaryDirectory() as td:
            with jax.profiler.trace(td):
                for _ in range(3):
                    lo, _, hi = eval16.nested_sets(xj, lam=1.0)
                jax.block_until_ready(lo)
            bd = device_busy_breakdown(td, steps=3)
        serve_ms_busy = bd["total_ms"] if bd else None
    except Exception as e:
        print(f"# serving throughput skipped: {e}", file=sys.stderr)
    del ts16, state16

    # calibration wall-clock at FastMRI scale (forward + full λ-grid table + λ̂)
    class _Synth:
        def __len__(self):
            return CALIB_N

        def __getitem__(self, i):
            r = np.random.RandomState(i)
            return (
                r.randn(IMAGE, IMAGE, 1).astype(np.float32),
                r.randn(IMAGE, IMAGE, 1).astype(np.float32),
            )

    state = state.replace(
        variables={"params": ts.params, "batch_stats": ts.batch_stats}
    )
    calib_ds = _Synth()
    if precompile_thread is not None:
        precompile_thread.join(timeout=600)
    t0 = time.perf_counter()
    state, _ = calibrate_model(state, calib_ds, config, mesh=mesh, batch_size=32)
    calib_cold = time.perf_counter() - t0  # includes one-time compile
    t0 = time.perf_counter()
    state, _ = calibrate_model(state, calib_ds, config, mesh=mesh, batch_size=32)
    calib_seconds = time.perf_counter() - t0  # steady state (compiled)

    baseline = None
    base_file = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_BASELINE.json")
    if os.path.exists(base_file):
        with open(base_file) as fh:
            baseline = json.load(fh).get("train_imgs_per_sec_per_chip")

    # Headline = measured wall of the in-graph K-step loop (one dispatch,
    # device-resident batch — immune to dispatch overhead and tunnel load
    # windows) on the production (bf16) train step; device-busy is the
    # cross-check. Falls back to device-busy, then per-step wall.
    busy_ms = device_ms_bf16 or device_ms_per_step
    if ingraph_ms_bf16:
        imgs_per_sec = BATCH * 1e3 / ingraph_ms_bf16 / n_chips
        basis = "ingraph_wall_bf16"
    elif busy_ms:
        imgs_per_sec = BATCH * 1e3 / busy_ms / n_chips
        basis = "device_busy_bf16" if device_ms_bf16 else "device_busy_fp32"
    else:
        imgs_per_sec = BATCH / (wall_ms_per_step / 1e3) / n_chips
        basis = "wall_clock (no profiler trace available)"
    # settled when the measured wall of one dispatch sits within ~10% of the
    # profiler's device-busy number (VERDICT r2 #2)
    wall_gap_settled = (
        ingraph_ms_bf16 is not None
        and device_ms_bf16 is not None
        and abs(ingraph_ms_bf16 - device_ms_bf16) / device_ms_bf16 <= 0.10
    )
    # wall and busy are both fp32-step numbers here; wall < busy is impossible
    wall_reliable = device_ms_per_step is None or wall_ms_per_step >= device_ms_per_step
    mfu_bf16 = (
        round(flops_per_step / (device_ms_bf16 / 1e3) / 197e12, 4)
        if device_ms_bf16
        else None
    )

    print(
        json.dumps(
            {
                "metric": "unet_train_imgs_per_sec_per_chip",
                "value": round(imgs_per_sec, 3),
                "unit": "imgs/sec/chip",
                "vs_baseline": round(imgs_per_sec / baseline, 3) if baseline else 1.0,
                "extras": {
                    "batch": BATCH,
                    "image": IMAGE,
                    "n_chips": n_chips,
                    "value_basis": basis,
                    "device_busy_ms_per_step_fp32": device_ms_per_step,
                    "device_busy_ms_per_step_bf16": device_ms_bf16,
                    "device_busy_imgs_per_sec_fp32": (
                        round(BATCH * 1e3 / device_ms_per_step, 1)
                        if device_ms_per_step
                        else None
                    ),
                    "wall_ms_per_step_fp32": round(wall_ms_per_step, 2),
                    "wall_clock_reliable": wall_reliable,
                    "ingraph_wall_ms_per_step_fp32": (
                        round(ingraph_ms_fp32, 2) if ingraph_ms_fp32 else None
                    ),
                    "ingraph_wall_ms_per_step_bf16": (
                        round(ingraph_ms_bf16, 2) if ingraph_ms_bf16 else None
                    ),
                    "wall_vs_busy_gap_settled": wall_gap_settled,
                    "mfu_bf16": mfu_bf16,
                    "flops_per_step": flops_per_step,
                    "calibration_seconds_n128_L1000": round(calib_seconds, 2),
                    "calibration_seconds_incl_compile": round(calib_cold, 2),
                    "serving_busy_ms_per_batch_bf16": (
                        round(serve_ms_busy, 2) if serve_ms_busy else None
                    ),
                    "serving_imgs_per_sec_bf16": (
                        round(BATCH * 1e3 / serve_ms_busy, 1) if serve_ms_busy else None
                    ),
                    "serving_wall_ms_per_batch_bf16": (
                        round(serve_ms_wall, 2) if serve_ms_wall else None
                    ),
                    "lhat": state.lhat,
                    "baseline_note": "vs_baseline compares one v5e chip against the "
                    "reference implementation on this host's CPU (torch has no TPU "
                    "path); see BENCH_BASELINE.json",
                },
            }
        )
    )


if __name__ == "__main__":
    main()
