"""Synthetic experiment figures — exercises the full plotting path hermetically."""

import os
import sys

sys.path.insert(1, os.path.join(os.path.dirname(__file__), "../../"))

from im2im_uq_tpu.scripts.plots import generate_plots

METHODNAMES = ["Quantile Regression"]
RESULTS = ["outputs/raw/results_synthetic_quantiles_16_0.001_standard_min-max.pkl"]
LOSS_TABLES = [f.replace("results_", "loss_table_").replace(".pkl", ".pth") for f in RESULTS]

if __name__ == "__main__":
    os.chdir(os.path.dirname(os.path.abspath(__file__)))
    generate_plots(
        METHODNAMES,
        RESULTS,
        LOSS_TABLES,
        alpha=0.1,
        delta=0.1,
        outdir="outputs",
        prefix="synthetic",
    )
