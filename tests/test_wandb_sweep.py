"""wandb-sweep drop-in: the router runs as a sweep agent's ``program:``.

The reference's operational workflow is ``wandb sweep config.yml`` + agents
(reference: README.md:26-34; config.yml:2 ``program: core/scripts/router.py``).
An agent spawns the program with NO CLI args and publishes the grid point via
``wandb.config``. These tests drive that path with a mock wandb module —
no network, no wandb account.
"""

import os
import sys
import types

import numpy as np
import pytest

pytestmark = pytest.mark.full  # runs a (tiny) full experiment

TINY = {
    "dataset": "synthetic",
    "num_examples": 32,
    "image_size": 16,
    "uncertainty_type": "quantiles",
    "model": "UNet",
    "alpha": 0.2,
    "delta": 0.2,
    "num_lambdas": 20,
    "minimum_lambda": 0.0,
    "maximum_lambda": 6.0,
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
    "num_validation_images": 1,
    "data_split_percentages": [0.5, 0.25, 0.25, 0.0],
}


def _mock_wandb(config: dict):
    mod = types.ModuleType("wandb")
    mod.config = dict(config)
    mod.run = None

    def init(*a, **k):
        mod.run = types.SimpleNamespace(name="mock", id="mock")
        return mod.run

    def log(*a, **k):
        pass

    mod.init = init
    mod.log = log
    mod.Image = lambda *a, **k: None
    return mod


def test_router_main_reads_wandb_config(tmp_path, monkeypatch):
    from im2im_uq_tpu.scripts import router

    cfg = dict(TINY, output_dir=str(tmp_path))
    monkeypatch.setenv("WANDB_SWEEP_ID", "mocksweep")
    monkeypatch.setenv("WANDB_MODE", "disabled")  # MetricsLogger: no mirror
    monkeypatch.setitem(sys.modules, "wandb", _mock_wandb(cfg))

    router.main([])  # agent mode: no --config
    assert os.path.exists(router.results_filename(cfg))
    assert os.path.exists(router.loss_table_filename(cfg))


def test_router_main_requires_config_outside_agent(monkeypatch):
    from im2im_uq_tpu.scripts import router

    monkeypatch.delenv("WANDB_SWEEP_ID", raising=False)
    with pytest.raises(SystemExit):
        router.main([])


def test_core_scripts_shim_exists():
    """The reference sweep YAML's literal ``program:`` path resolves here."""
    shim = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "core",
        "scripts",
        "router.py",
    )
    assert os.path.exists(shim)
    src = open(shim).read()
    assert "im2im_uq_tpu.scripts.router" in src


def test_shim_does_not_shadow_reference_core():
    """/root/repo/core must not shadow the reference's ``core`` package for
    the oracle-parity tests (regular package at sys.path[0] wins)."""
    if not os.path.exists("/root/reference/core/__init__.py"):
        pytest.skip("reference tree not mounted")
    saved = dict(sys.modules)
    sys.path.insert(0, "/root/reference")
    try:
        for k in [k for k in sys.modules if k == "core" or k.startswith("core.")]:
            del sys.modules[k]
        import core  # noqa: F401

        assert "/root/reference" in os.path.abspath(core.__file__)
    finally:
        sys.path.remove("/root/reference")
        sys.modules.update(saved)
