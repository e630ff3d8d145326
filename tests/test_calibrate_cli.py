"""Calibrate-only CLI test: checkpoint → RCPS → calibrated artifact.

Drives scripts.calibrate end-to-end on the synthetic dataset: an
uncalibrated training checkpoint goes in, a λ̂-bearing calibrated checkpoint
plus loss table come out, and scripts.infer can serve from the result.
"""

import json

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
import yaml

from im2im_uq_tpu.models.assembly import add_uncertainty, build_trunk
from im2im_uq_tpu.scripts import calibrate, infer
from im2im_uq_tpu.training.checkpoint import checkpoint_path, save_checkpoint
from im2im_uq_tpu.training.train import TrainState
from im2im_uq_tpu.utils.cache import enable_compilation_cache

pytestmark = pytest.mark.full  # compile-heavy: excluded from -m smoke

enable_compilation_cache()

CFG = {
    "dataset": "synthetic",
    "num_examples": 24,
    "image_size": 32,
    "model": "UNet",
    "uncertainty_type": "quantiles",
    "alpha": 0.3,
    "delta": 0.3,
    "num_lambdas": 40,
    "minimum_lambda": 0.0,
    "maximum_lambda": 6.0,
    "batch_size": 8,
    "lr": 1e-3,
    "epochs": 1,
    "input_normalization": "standard",
    "output_normalization": "min-max",
    "q_lo": 0.05,
    "q_hi": 0.95,
    "q_lo_weight": 1.0,
    "q_hi_weight": 1.0,
    "mse_weight": 1.0,
    "num_inputs": 1,
}


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    root = tmp_path_factory.mktemp("calib_cli")
    state = add_uncertainty(
        build_trunk(CFG), CFG, rng=jax.random.key(0),
        example_input=jnp.zeros((1, 32, 32, 1)),
    )
    tx = optax.adam(CFG["lr"])
    ts = TrainState(
        params=state.variables["params"],
        batch_stats=state.variables["batch_stats"],
        opt_state=tx.init(state.variables["params"]),
        step=jnp.zeros((), jnp.int32),
    )
    ckpt = checkpoint_path(str(root), 1, CFG)
    save_checkpoint(ckpt, ts, None, 1)  # uncalibrated
    cfg_yaml = root / "config.yml"
    cfg_yaml.write_text(
        yaml.safe_dump({"parameters": {k: {"value": v} for k, v in CFG.items()}})
    )
    return root, ckpt, cfg_yaml


def test_calibrate_cli_end_to_end(setup, tmp_path):
    root, ckpt, cfg_yaml = setup
    out = tmp_path / "calib_out"
    rc = calibrate.main(
        ["--config", str(cfg_yaml), "--checkpoint", str(ckpt),
         "--output-dir", str(out)]
    )
    assert rc == 0
    summary = json.loads((out / "calibration_summary.json").read_text())
    assert summary["lhat"] is not None
    assert summary["num_calibration_examples"] == 24
    assert summary["num_lambdas"] == 40
    with np.load(out / "calibration_loss_table.npz") as z:
        assert z["loss_table"].shape == (24, 40)
    # the produced checkpoint serves through infer with the calibrated λ̂
    restored = infer.load_uq_state_for_inference(dict(CFG), summary["checkpoint"])
    assert restored.lhat == pytest.approx(summary["lhat"])
    x = np.zeros((2, 32, 32, 1), np.float32)
    res = infer.predict_intervals(restored, x, batch_size=2)
    assert np.all(res["lower"] <= res["upper"])


def test_calibrate_cli_fraction_and_overrides(setup, tmp_path):
    root, ckpt, cfg_yaml = setup
    out = tmp_path / "calib_frac"
    rc = calibrate.main(
        ["--config", str(cfg_yaml), "--checkpoint", str(ckpt),
         "--output-dir", str(out), "--calib-fraction", "0.5",
         "--alpha", "0.4", "--delta", "0.4"]
    )
    assert rc == 0
    summary = json.loads((out / "calibration_summary.json").read_text())
    assert summary["num_calibration_examples"] == 12
    assert summary["alpha"] == 0.4 and summary["delta"] == 0.4
