"""FastMRI experiment figures (counterpart of reference
experiments/fastmri_test/plot.py:192-230, using the shared plotting module)."""

import os
import sys

sys.path.insert(1, os.path.join(os.path.dirname(__file__), "../../"))

from im2im_uq_tpu.scripts.plots import generate_plots

METHODNAMES = ["Residual Magnitude", "Gaussian", "Softmax", "Quantile Regression"]
RESULTS = [
    "outputs/raw/results_fastmri_residual_magnitude_78_0.0001_standard_standard.pkl",
    "outputs/raw/results_fastmri_gaussian_78_0.0001_standard_standard.pkl",
    "outputs/raw/results_fastmri_softmax_64_0.001_standard_min-max.pkl",
    "outputs/raw/results_fastmri_quantiles_78_0.0001_standard_standard.pkl",
]
LOSS_TABLES = [f.replace("results_", "loss_table_").replace(".pkl", ".pth") for f in RESULTS]

# dataset std/max rescaling constants for 'standard' runs
# (reference plot.py:200-201)
RESCALE = {"std": 7.01926983310841e-05, "max": 0.0026554432697594166}

if __name__ == "__main__":
    generate_plots(
        METHODNAMES,
        RESULTS,
        LOSS_TABLES,
        alpha=0.1,
        delta=0.1,
        outdir="outputs",
        prefix="fastmri",
        rescale=RESCALE,
    )
