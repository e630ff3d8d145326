"""End-to-end pipeline test on the 8-device virtual CPU mesh.

The counterpart of the reference's single integration test (reference:
tests/test_add_uncertainty/main.py:24-103), but hermetic (synthetic data, no
wandb, no downloads) and with assertions. Runs the full
dataset → add_uncertainty → train_net → calibrate_model → eval_set_metrics
flow, sharded over all 8 virtual devices.
"""

import numpy as np
import pytest

from im2im_uq_tpu.utils.cache import enable_compilation_cache

pytestmark = pytest.mark.full  # compile-heavy: excluded from -m smoke

enable_compilation_cache()

CONFIG = {
    "dataset": "synthetic",
    "uncertainty_type": "quantiles",
    "model": "UNet",
    "alpha": 0.2,
    "delta": 0.2,
    "num_lambdas": 60,
    "minimum_lambda": 0.0,
    "maximum_lambda": 6.0,
    "minimum_lambda_softmax": 0.0,
    "maximum_lambda_softmax": 1.2,
    "rcps_loss": "fraction_missed",
    "epochs": 1,
    "batch_size": 8,
    "lr": 1e-3,
    "q_lo": 0.05,
    "q_hi": 0.95,
    "q_lo_weight": 1.0,
    "q_hi_weight": 1.0,
    "mse_weight": 1.0,
    "input_normalization": "standard",
    "output_normalization": "min-max",
    "num_validation_images": 2,
}


@pytest.fixture(scope="module")
def pipeline_result(tmp_path_factory):
    import jax
    import jax.numpy as jnp

    from im2im_uq_tpu.calibration.metrics import eval_set_metrics
    from im2im_uq_tpu.calibration.rcps import calibrate_model
    from im2im_uq_tpu.data.core import random_split, split_lengths
    from im2im_uq_tpu.data.synthetic import SyntheticDataset
    from im2im_uq_tpu.models.assembly import add_uncertainty, build_trunk
    from im2im_uq_tpu.parallel.mesh import data_parallel_mesh
    from im2im_uq_tpu.training.evaluate import get_images, get_loss_table
    from im2im_uq_tpu.training.train import train_net
    from im2im_uq_tpu.utils.random import fix_randomness

    assert len(jax.devices()) == 8, "conftest must provide 8 virtual devices"
    config = dict(CONFIG)
    key = fix_randomness(0)
    ds = SyntheticDataset(num_examples=40, image_size=32)
    tr, ca, va, _ = random_split(
        ds, split_lengths(len(ds), [0.6, 0.2, 0.2, 0.0]), np.random.RandomState(0)
    )
    state = add_uncertainty(
        build_trunk(config), config, rng=key, example_input=jnp.asarray(ds[0][0])[None]
    )
    mesh = data_parallel_mesh()
    ckpt_dir = str(tmp_path_factory.mktemp("ckpts"))
    state = train_net(
        state,
        tr,
        va,
        mesh,
        epochs=config["epochs"],
        batch_size=config["batch_size"],
        lr=config["lr"],
        checkpoint_dir=ckpt_dir,
        checkpoint_every=1,
        validate_every=5,
        config=config,
    )
    val_table = get_loss_table(state, va, config, mesh=mesh)
    state, calib_table = calibrate_model(state, ca, config, mesh=mesh)
    metrics = eval_set_metrics(state, va, config, mesh=mesh, rng=np.random.RandomState(1))
    images = get_images(state, va, [0, 1], config)
    return dict(
        state=state,
        val_table=val_table,
        calib_table=calib_table,
        metrics=metrics,
        images=images,
        ckpt_dir=ckpt_dir,
        config=config,
        splits=(tr, ca, va),
        mesh=mesh,
    )


def test_training_ran_and_calibrated(pipeline_result):
    state = pipeline_result["state"]
    assert state.lhat is not None
    cfg = pipeline_result["config"]
    lo = cfg["minimum_lambda"]
    dlam = (cfg["maximum_lambda"] - lo) / (cfg["num_lambdas"] - 1)
    assert lo <= state.lhat <= cfg["maximum_lambda"] + dlam


def test_loss_table_shapes_and_monotone(pipeline_result):
    val_table = pipeline_result["val_table"]
    cfg = pipeline_result["config"]
    _, ca, va = pipeline_result["splits"]
    assert val_table.shape == (len(va), cfg["num_lambdas"])
    assert np.all(np.diff(val_table, axis=1) <= 1e-7)  # nested sets ⇒ monotone
    calib_table = pipeline_result["calib_table"]
    assert calib_table.shape == (len(ca), cfg["num_lambdas"])


def test_calib_table_zero_below_stop(pipeline_result):
    """Columns below the stopping λ stay zero (reference break semantics)."""
    table = pipeline_result["calib_table"]
    state = pipeline_result["state"]
    cfg = pipeline_result["config"]
    lambdas = np.linspace(cfg["minimum_lambda"], cfg["maximum_lambda"], cfg["num_lambdas"])
    j = int(np.argmin(np.abs(lambdas - state.lhat)))
    if j > 0:
        assert np.all(table[:, :j] == 0.0)


def test_metrics_are_coherent(pipeline_result):
    m = pipeline_result["metrics"]
    _, _, va = pipeline_result["splits"]
    assert 0.0 <= m.risk <= 1.0
    assert m.losses.shape == (len(va),)
    assert m.sizes.shape == (len(va),) and np.all(m.sizes > 0)
    assert m.spatial_miscoverage.shape == (32, 32)
    assert m.stratified_risks.shape == (4,)
    assert np.isfinite(m.mse)


def test_images_panels(pipeline_result):
    panels = pipeline_result["images"]["panels"]
    raw = pipeline_result["images"]["raw"]
    assert len(raw["predictions"]) == 2
    for key in (
        "examples_input",
        "examples_lower_edge",
        "examples_prediction",
        "examples_upper_edge",
        "examples_ground_truth",
        "examples_lower_length",
        "examples_upper_length",
    ):
        assert len(panels[key]) == 2
        assert panels[key][0].dtype == np.uint8
    # set ordering holds pixelwise
    lo, pred, hi = raw["lower_edge"][0], raw["predictions"][0], raw["upper_edge"][0]
    assert np.all(lo <= pred) and np.all(pred <= hi)


def test_checkpoint_resume_short_circuits(pipeline_result):
    """A final-epoch checkpoint makes train_net return without training."""
    from im2im_uq_tpu.training.train import train_net

    cfg = pipeline_result["config"]
    tr, ca, va = pipeline_result["splits"]
    state = pipeline_result["state"]
    resumed = train_net(
        state,
        tr,
        va,
        pipeline_result["mesh"],
        epochs=cfg["epochs"],
        batch_size=cfg["batch_size"],
        lr=cfg["lr"],
        load_from_checkpoint=True,
        checkpoint_dir=pipeline_result["ckpt_dir"],
        config=cfg,
    )
    np.testing.assert_array_equal(
        np.asarray(resumed.variables["params"]["trunk"]["inc"]["conv0"]["kernel"]),
        np.asarray(state.variables["params"]["trunk"]["inc"]["conv0"]["kernel"]),
    )


def test_risk_control_against_bruteforce_oracle(pipeline_result):
    """λ̂ must equal a brute-force replay of the reference stopping rule."""
    from im2im_uq_tpu.calibration.bounds import HB_mu_plus

    table = pipeline_result["calib_table"]
    state = pipeline_result["state"]
    cfg = pipeline_result["config"]
    lambdas = np.linspace(cfg["minimum_lambda"], cfg["maximum_lambda"], cfg["num_lambdas"])
    n = table.shape[0]
    expected = lambdas[-1] + (lambdas[1] - lambdas[0]) - 1e-9
    for j in range(len(lambdas) - 1, -1, -1):
        rhat = table[:, j].mean()
        if rhat >= cfg["alpha"] or HB_mu_plus(float(rhat), n, cfg["delta"]) > cfg["alpha"]:
            expected = lambdas[j]
            break
    assert state.lhat == pytest.approx(expected)
