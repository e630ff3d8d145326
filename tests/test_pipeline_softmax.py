"""Compact e2e for the softmax head (its loss, set geometry, and λ grid all
differ from the quantile path exercised in test_pipeline.py)."""

import numpy as np

from im2im_uq_tpu.utils.cache import enable_compilation_cache
import pytest

pytestmark = pytest.mark.full  # compile-heavy: excluded from -m smoke

enable_compilation_cache()


def test_softmax_pipeline_end_to_end():
    import jax
    import jax.numpy as jnp

    from im2im_uq_tpu.calibration.metrics import eval_set_metrics
    from im2im_uq_tpu.calibration.rcps import calibrate_model
    from im2im_uq_tpu.data.core import random_split, split_lengths
    from im2im_uq_tpu.data.synthetic import SyntheticDataset
    from im2im_uq_tpu.models.assembly import add_uncertainty, build_trunk
    from im2im_uq_tpu.parallel.mesh import data_parallel_mesh
    from im2im_uq_tpu.training.train import train_net
    from im2im_uq_tpu.utils.random import fix_randomness

    config = {
        "dataset": "synthetic",
        "uncertainty_type": "softmax",
        "model": "UNet",
        "alpha": 0.3,
        "delta": 0.3,
        "num_lambdas": 40,
        "minimum_lambda": 0.0,
        "maximum_lambda": 6.0,
        "minimum_lambda_softmax": 0.0,
        "maximum_lambda_softmax": 1.2,
        "rcps_loss": "fraction_missed",
        "epochs": 1,
        "batch_size": 8,
        "lr": 1e-3,
        "num_softmax": 10,
        "q_lo": 0.05,
        "q_hi": 0.95,
        "q_lo_weight": 1.0,
        "q_hi_weight": 1.0,
        "mse_weight": 1.0,
        "input_normalization": "standard",
        "output_normalization": "min-max",
    }
    key = fix_randomness(0)
    ds = SyntheticDataset(num_examples=24, image_size=32)
    tr, ca, va, _ = random_split(
        ds, split_lengths(len(ds), [0.5, 0.25, 0.25, 0.0]), np.random.RandomState(0)
    )
    state = add_uncertainty(
        build_trunk(config), config, rng=key, example_input=jnp.asarray(ds[0][0])[None]
    )
    mesh = data_parallel_mesh()
    state = train_net(
        state, tr, va, mesh, epochs=1, batch_size=8, lr=1e-3, config=config
    )
    state, table = calibrate_model(state, ca, config, mesh=mesh)
    # softmax uses its own λ grid (calibrate_model.py:97-100)
    dlam = 1.2 / (config["num_lambdas"] - 1)
    assert 0.0 <= state.lhat <= 1.2 + dlam
    assert table.shape == (len(ca), 40)
    m = eval_set_metrics(state, va, config, mesh=mesh, rng=np.random.RandomState(1))
    assert 0.0 <= m.risk <= 1.0
    # softmax predictions are bin centers in [0, 1]
    lo, pred, hi = state.nested_sets(jnp.asarray(ds[0][0])[None])
    assert float(pred.min()) >= 0.0 and float(pred.max()) <= 1.0
