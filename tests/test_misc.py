"""Filename contracts, logging, misc utils, and loss-table evaluation."""

import json
import os

import numpy as np
import pytest

from im2im_uq_tpu.calibration.bounds import HB_mu_plus
from im2im_uq_tpu.calibration.rcps import evaluate_from_loss_table, lambda_grid
from im2im_uq_tpu.scripts.router import loss_table_filename, results_filename
from im2im_uq_tpu.utils.logging import MetricsLogger, to_uint8_image
from im2im_uq_tpu.utils.misc import cacheable, standard_to_minmax

CONFIG = {
    "output_dir": "/tmp/out",
    "dataset": "fastmri",
    "uncertainty_type": "quantiles",
    "batch_size": 78,
    "lr": 0.0001,
    "input_normalization": "standard",
    "output_normalization": "standard",
}


def test_artifact_filename_contracts():
    # must match the reference naming so its plot scripts find artifacts
    # (reference router.py:40,138)
    assert results_filename(CONFIG) == (
        "/tmp/out/results_fastmri_quantiles_78_0.0001_standard_standard.pkl"
    )
    assert loss_table_filename(CONFIG) == (
        "/tmp/out/loss_table_fastmri_quantiles_78_0.0001_standard_standard.pth"
    )
    cfg = dict(CONFIG, output_normalization="min-max")
    assert results_filename(cfg).endswith("_standard_min-max.pkl")


def test_lambda_grid_softmax_switch():
    cfg = {
        "uncertainty_type": "quantiles",
        "minimum_lambda": 0,
        "maximum_lambda": 6,
        "minimum_lambda_softmax": 0,
        "maximum_lambda_softmax": 1.2,
        "num_lambdas": 5,
    }
    np.testing.assert_allclose(lambda_grid(cfg), [0, 1.5, 3, 4.5, 6])
    np.testing.assert_allclose(
        lambda_grid(dict(cfg, uncertainty_type="softmax")), [0, 0.3, 0.6, 0.9, 1.2]
    )


def test_metrics_logger(tmp_path):
    logger = MetricsLogger(str(tmp_path), use_wandb=False)
    logger.log({"epoch": 1, "train_loss": 0.5, "vec": np.array([1.0, 2.0])})
    logger.log({"epoch": 2, "train_loss": 0.25})
    paths = logger.log_images("panel", [np.zeros((8, 8), np.uint8)], step=3)
    logger.close()
    lines = [json.loads(l) for l in open(tmp_path / "metrics.jsonl")]
    assert lines[0]["train_loss"] == 0.5 and lines[0]["vec"] == [1.0, 2.0]
    assert lines[1]["epoch"] == 2
    assert len(paths) == 1 and os.path.exists(paths[0])


def test_to_uint8_image_matches_reference_transform_output():
    import torch

    x = np.random.RandomState(0).randn(1, 16, 16).astype(np.float32)
    got = to_uint8_image(x)
    # reference transform_output (eval.py:14-22) oracle
    t = torch.tensor(x)
    t = t - t.min()
    t = t / t.max()
    expected = np.maximum(0, np.minimum(255 * t.squeeze().numpy(), 255)).astype(np.uint8)
    np.testing.assert_array_equal(got, expected)


def test_cacheable(tmp_path, monkeypatch):
    calls = {"n": 0}

    @cacheable
    def slow_add(a, b):
        calls["n"] += 1
        return a + b

    import im2im_uq_tpu.utils.misc as misc
    import pathlib

    monkeypatch.setattr(pathlib.Path, "absolute", lambda self: tmp_path)
    assert slow_add(2, 3) == 5
    assert slow_add(2, 3) == 5
    assert calls["n"] == 1  # second call served from the pickle cache


def test_standard_to_minmax_intended_semantics():
    cfg = {
        "output_mean": 2.0,
        "output_std": 4.0,
        "output_min": -6.0,
        "output_max": 10.0,
    }
    x = np.array([0.0, 1.0])  # standard units
    got = standard_to_minmax(x, cfg, output_bool=True)
    # un-standardize: 0→2, 1→6; min-max: (v+6)/16
    np.testing.assert_allclose(got, [(2 + 6) / 16, (6 + 6) / 16])


def test_evaluate_from_loss_table_selects_first_accepted_lambda():
    rng = np.random.RandomState(0)
    n = 40
    # monotone-decreasing risk columns over λ
    base = np.sort(rng.rand(2 * n))[::-1]
    table = np.tile(base, (2 * n, 1)) > rng.rand(2 * n, 1) * 1.3
    table = table.astype(np.float64)
    alpha = delta = 0.2
    risk = evaluate_from_loss_table(table, n, alpha, delta, rng=np.random.RandomState(7))
    # oracle replay with the same permutation
    perm = np.random.RandomState(7).permutation(table.shape[0])
    calib, val = table[perm][:n], table[perm][n:]
    rhats = calib.mean(axis=0)
    idx = 0
    for j, r in enumerate(rhats):
        if HB_mu_plus(float(r), n, delta) <= delta:
            idx = j
            break
    assert risk == pytest.approx(float(val[:, idx].mean()))


def test_device_busy_breakdown_parses_trace(tmp_path):
    """The profiling harness parses a trace of real device work (CPU lanes
    yield None gracefully; category parsing is covered via a synthetic
    trace file in the chrome trace-event schema)."""
    import gzip
    import json as _json

    from im2im_uq_tpu.utils.profiling import device_busy_breakdown

    d = tmp_path / "plugins" / "profile" / "run1"
    d.mkdir(parents=True)
    events = [
        {"ph": "M", "pid": 1, "name": "process_name", "args": {"name": "/device:TPU:0"}},
        {"ph": "M", "pid": 2, "name": "process_name", "args": {"name": "/host:CPU"}},
        {"ph": "X", "pid": 1, "name": "convolution.1", "dur": 3000, "ts": 0},
        {"ph": "X", "pid": 1, "name": "fusion.7", "dur": 1500, "ts": 3000},
        {"ph": "X", "pid": 1, "name": "while.2", "dur": 500, "ts": 4500},
        {"ph": "X", "pid": 1, "name": "jit_train_step(123)", "dur": 9999, "ts": 0},
        {"ph": "X", "pid": 2, "name": "hostwork", "dur": 77777, "ts": 0},
    ]
    with gzip.open(d / "x.trace.json.gz", "wt") as fh:
        _json.dump({"traceEvents": events}, fh)
    b = device_busy_breakdown(str(tmp_path), steps=1)
    assert b["total_ms"] == 5.0  # 3 + 1.5 + 0.5; containers + host excluded
    assert b["categories"]["convolution"] == 3.0
    assert b["categories"]["while/dynamic-slice"] == 0.5
    assert device_busy_breakdown(str(tmp_path / "nothing")) is None


def test_device_busy_charges_containers_their_self_time(tmp_path):
    """A lax.scan train loop's ``while`` event SPANS its body ops on the
    same lane — summing raw durations double-counts (measured on the TPU:
    251.7 "ms/step" vs 125.9 true for the K=20 loop). Each op must be
    charged only its self time: duration minus direct children."""
    import gzip
    import json as _json

    from im2im_uq_tpu.utils.profiling import device_busy_breakdown

    d = tmp_path / "plugins" / "profile" / "run1"
    d.mkdir(parents=True)
    events = [
        {"ph": "M", "pid": 1, "name": "process_name", "args": {"name": "/device:TPU:0"}},
        # while container: 0..10000, self time = 10000 - 9000 = 1000
        {"ph": "X", "pid": 1, "tid": 3, "name": "while.5", "dur": 10000, "ts": 0},
        {"ph": "X", "pid": 1, "tid": 3, "name": "convolution.9", "dur": 6000, "ts": 200},
        {"ph": "X", "pid": 1, "tid": 3, "name": "fusion.11", "dur": 3000, "ts": 6500},
        # a flat op after the loop on the same lane
        {"ph": "X", "pid": 1, "tid": 3, "name": "fusion.12", "dur": 2000, "ts": 10000},
        # redundant container lanes (different tids) are excluded by name
        {"ph": "X", "pid": 1, "tid": 1, "name": "jit_loop(1)", "dur": 12000, "ts": 0},
        {"ph": "X", "pid": 1, "tid": 2, "name": "7", "dur": 12000, "ts": 0},
    ]
    with gzip.open(d / "x.trace.json.gz", "wt") as fh:
        _json.dump({"traceEvents": events}, fh)
    b = device_busy_breakdown(str(tmp_path), steps=1)
    # 1 (while self) + 6 (conv) + 3 + 2 (fusions) = 12 ms, NOT 10+9+2=21
    assert b["total_ms"] == 12.0
    assert b["categories"]["convolution"] == 6.0
    assert b["categories"]["while/dynamic-slice"] == 1.0
    assert b["categories"]["fusion"] == 5.0


def test_device_busy_is_per_chip_mean_on_multichip_traces(tmp_path):
    """A multi-chip trace has one lane per device; bench.py divides the
    busy-derived throughput by n_chips, so the breakdown must report the
    per-chip MEAN, not the cross-mesh sum (which would undercount
    imgs/sec/chip n-fold)."""
    import gzip
    import json as _json

    from im2im_uq_tpu.utils.profiling import device_busy_breakdown

    d = tmp_path / "plugins" / "profile" / "run1"
    d.mkdir(parents=True)
    events = [
        {"ph": "M", "pid": 1, "name": "process_name", "args": {"name": "/device:TPU:0"}},
        {"ph": "M", "pid": 2, "name": "process_name", "args": {"name": "/device:TPU:1"}},
        {"ph": "X", "pid": 1, "tid": 3, "name": "convolution.1", "dur": 4000, "ts": 0},
        {"ph": "X", "pid": 2, "tid": 3, "name": "convolution.1", "dur": 4000, "ts": 0},
        {"ph": "X", "pid": 1, "tid": 3, "name": "fusion.2", "dur": 2000, "ts": 4000},
        {"ph": "X", "pid": 2, "tid": 3, "name": "fusion.2", "dur": 2000, "ts": 4000},
    ]
    with gzip.open(d / "x.trace.json.gz", "wt") as fh:
        _json.dump({"traceEvents": events}, fh)
    b = device_busy_breakdown(str(tmp_path), steps=1)
    assert b["total_ms"] == 6.0  # per-chip mean, not the 12 ms mesh sum
    assert b["categories"]["convolution"] == 4.0
