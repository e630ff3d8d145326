"""BSBCM experiment figures (counterpart of reference
experiments/bsbcm_test/plot.py:193-230, using the shared plotting module)."""

import os
import sys

sys.path.insert(1, os.path.join(os.path.dirname(__file__), "../../"))

from im2im_uq_tpu.scripts.plots import generate_plots

METHODNAMES = ["Residual Magnitude", "Gaussian", "Softmax", "Quantile Regression"]
RESULTS = [
    "outputs/raw/results_bsbcm_residual_magnitude_64_0.0001_standard_min-max.pkl",
    "outputs/raw/results_bsbcm_gaussian_64_0.0001_standard_min-max.pkl",
    "outputs/raw/results_bsbcm_softmax_64_0.001_standard_min-max.pkl",
    "outputs/raw/results_bsbcm_quantiles_64_0.0001_standard_min-max.pkl",
]
LOSS_TABLES = [f.replace("results_", "loss_table_").replace(".pkl", ".pth") for f in RESULTS]

if __name__ == "__main__":
    generate_plots(
        METHODNAMES,
        RESULTS,
        LOSS_TABLES,
        alpha=0.1,
        delta=0.1,
        outdir="outputs",
        prefix="bsbcm",
    )
