"""The full migration workflow, three CLIs chained end-to-end:

reference torch checkpoint → scripts.import_torch → scripts.calibrate
(re-run RCPS on synthetic data) → scripts.infer (serve calibrated
intervals). This is the path a reference user takes to move a trained
model into production here without retraining.
"""

import os
import sys

import numpy as np
import pytest
import yaml

sys.path.insert(0, "/root/reference")
if not os.path.exists("/root/reference/core"):
    pytest.skip("reference tree not mounted", allow_module_level=True)

import torch  # noqa: E402
from core.models.add_uncertainty import add_uncertainty as ref_add_uncertainty  # noqa: E402
from core.models.trunks.unet import UNet as RefUNet  # noqa: E402

from im2im_uq_tpu.utils.cache import enable_compilation_cache  # noqa: E402

pytestmark = pytest.mark.full  # compile-heavy: excluded from -m smoke

enable_compilation_cache()


def test_import_calibrate_infer_chain(tmp_path):
    from im2im_uq_tpu.scripts.calibrate import main as calibrate_main
    from im2im_uq_tpu.scripts.import_torch import main as import_main
    from im2im_uq_tpu.scripts.infer import main as infer_main

    params = {"uncertainty_type": "quantiles", "q_lo": 0.05, "q_hi": 0.95,
              "q_lo_weight": 1.0, "q_hi_weight": 1.0, "mse_weight": 1.0,
              "device": "cpu"}
    torch.manual_seed(0)
    ref = ref_add_uncertainty(RefUNet(1, 1), params)
    ckpt = str(tmp_path / "CP_epoch2_synthetic_quantiles_4_0.001_standard_min-max.pth")
    torch.save(ref, ckpt)  # uncalibrated reference checkpoint (no lhat)

    cfg = {"model": "UNet", "uncertainty_type": "quantiles",
           "dataset": "synthetic", "num_examples": 24, "image_size": 16,
           "num_inputs": 1, "batch_size": 4, "lr": 0.001, "epochs": 2,
           "alpha": 0.3, "delta": 0.3, "num_lambdas": 40,
           "minimum_lambda": 0.0, "maximum_lambda": 6.0,
           "rcps_loss": "fraction_missed",
           "data_split_percentages": [0.5, 0.25, 0.25, 0.0],
           "input_normalization": "standard",
           "output_normalization": "min-max",
           "q_lo": 0.05, "q_hi": 0.95, "q_lo_weight": 1.0,
           "q_hi_weight": 1.0, "mse_weight": 1.0, "seed": 0}
    cfg_path = str(tmp_path / "config.yml")
    with open(cfg_path, "w") as fh:
        yaml.safe_dump(cfg, fh)

    # 1. import the torch checkpoint into our layout
    outdir = str(tmp_path / "imported")
    assert import_main([
        "--checkpoint", ckpt, "--config", cfg_path,
        "--reference-path", "/root/reference", "--output-dir", outdir,
    ]) == 0
    imported = os.path.join(
        outdir, "CP_epoch2_synthetic_quantiles_4_0.001_standard_min-max.msgpack"
    )
    assert os.path.exists(imported)

    # 2. calibrate the imported model (RCPS on synthetic data, no retraining)
    caldir = str(tmp_path / "calibrated")
    assert calibrate_main([
        "--config", cfg_path, "--checkpoint", imported, "--output-dir", caldir,
    ]) == 0
    calibrated = os.path.join(
        caldir, "CP_calibrated_synthetic_quantiles_4_0.001_standard_min-max.msgpack"
    )
    assert os.path.exists(calibrated)

    # 3. serve calibrated intervals from the artifact
    x = np.random.RandomState(0).rand(3, 16, 16, 1).astype(np.float32)
    np.save(str(tmp_path / "inputs.npy"), x)
    servedir = str(tmp_path / "served")
    assert infer_main([
        "--config", cfg_path, "--checkpoint", calibrated,
        "--input", str(tmp_path / "inputs.npy"), "--output", servedir,
        "--batch-size", "4",
    ]) == 0
    outs = [f for f in os.listdir(servedir) if f.endswith(".npz")]
    assert outs
    z = np.load(os.path.join(servedir, outs[0]))
    lo, pred, hi = z["lower"], z["prediction"], z["upper"]
    assert lo.shape == pred.shape == hi.shape == (3, 16, 16, 1)
    # calibrated λ̂ produced genuine intervals around the prediction
    assert np.all(lo <= pred + 1e-6) and np.all(pred - 1e-6 <= hi)
    assert (hi - lo).mean() > 0
