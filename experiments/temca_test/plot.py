"""TEMCA experiment figures (counterpart of reference
experiments/temca_test/plot.py:152-181, using the shared plotting module)."""

import os
import sys

sys.path.insert(1, os.path.join(os.path.dirname(__file__), "../../"))

from im2im_uq_tpu.scripts.plots import generate_plots

METHODNAMES = ["Quantile Regression"]
RESULTS = ["outputs/raw/results_temca_quantiles_16_0.001_standard_standard.pkl"]
LOSS_TABLES = [f.replace("results_", "loss_table_").replace(".pkl", ".pth") for f in RESULTS]

if __name__ == "__main__":
    generate_plots(
        METHODNAMES,
        RESULTS,
        LOSS_TABLES,
        alpha=0.1,
        delta=0.1,
        outdir="outputs",
        prefix="temca",
    )
