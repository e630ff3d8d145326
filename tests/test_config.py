"""Config system: wandb sweep YAML schema ingestion + grid expansion."""

import textwrap

from im2im_uq_tpu.utils.config import expand_grid, load_sweep


def test_expand_grid_wandb_schema(tmp_path):
    yml = tmp_path / "config.yml"
    yml.write_text(
        textwrap.dedent(
            """
            program: core/scripts/router.py
            method: grid
            metric: {goal: minimize, name: mean_size}
            parameters:
              dataset: {value: fastmri}
              uncertainty_type: {values: [gaussian, quantiles]}
              lr: {values: [0.001, 0.0001]}
              batch_size: {value: 78}
            """
        )
    )
    grid = expand_grid(load_sweep(str(yml)))
    assert len(grid) == 4
    combos = {(g["uncertainty_type"], g["lr"]) for g in grid}
    assert combos == {
        ("gaussian", 0.001),
        ("gaussian", 0.0001),
        ("quantiles", 0.001),
        ("quantiles", 0.0001),
    }
    assert all(g["dataset"] == "fastmri" and g["batch_size"] == 78 for g in grid)
    # defaults fill unspecified keys
    assert all(g["rcps_loss"] == "fraction_missed" for g in grid)


def test_reference_config_schema_loads():
    """The actual reference sweep YAMLs must parse unchanged."""
    import os

    ref = "/root/reference/experiments/fastmri_test/config.yml"
    if not os.path.exists(ref):
        import pytest

        pytest.skip("reference tree not mounted")
    grid = expand_grid(load_sweep(ref))
    # 4 heads x 2 lrs
    assert len(grid) == 8
    assert {g["uncertainty_type"] for g in grid} == {
        "gaussian",
        "residual_magnitude",
        "softmax",
        "quantiles",
    }
    assert grid[0]["alpha"] == 0.1 and grid[0]["num_lambdas"] == 1000


def test_flat_config_single_point():
    grid = expand_grid({"dataset": "synthetic", "lr": 1e-3})
    assert len(grid) == 1 and grid[0]["dataset"] == "synthetic"
