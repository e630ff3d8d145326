"""Regression tests for the round-3 precompile-thread device race.

Round-3 postmortem: ``precompile_calibration``'s background thread executed
a dummy batch on the device; concurrent dispatch from two threads aborts the
TPU backend (main thread INVALID_ARGUMENT → wedged backend, worker SIGABRT
"FATAL: exception not rethrown"), and the same thread runs in production
``train_net``. The fix contract, pinned here:

1. the background thread performs NO device execution — it only lowers and
   compiles from abstract shapes (compiler-service work);
2. the resulting AOT executable is what ``compute_loss_table`` actually runs
   (so the first calibration still pays ~0 rather than the ~12 s jit-cache
   population the old execute-a-dummy-batch design bought);
3. results are bit-identical to the plain jit path.

The live two-thread drive on the real chip is tools/tpu_race_check.py (this
suite is pinned to CPU by conftest).
"""

import threading

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from im2im_uq_tpu.calibration import rcps
from im2im_uq_tpu.models.assembly import add_uncertainty, build_trunk
from im2im_uq_tpu.parallel.mesh import data_parallel_mesh

CFG = {
    "model": "UNet",
    "uncertainty_type": "quantiles",
    "q_lo": 0.05,
    "q_hi": 0.95,
    "q_lo_weight": 1.0,
    "q_hi_weight": 1.0,
    "mse_weight": 1.0,
    "alpha": 0.1,
    "delta": 0.1,
    "num_lambdas": 8,
    "minimum_lambda": 0.0,
    "maximum_lambda": 6.0,
    "rcps_loss": "fraction_missed",
    "batch_size": 4,
}


class _DS:
    def __len__(self):
        return 8

    def __getitem__(self, i):
        r = np.random.RandomState(i)
        return (
            r.randn(16, 16, 1).astype(np.float32),
            r.randn(16, 16, 1).astype(np.float32),
        )


@pytest.fixture(scope="module")
def uq_state():
    x0 = jnp.zeros((1, 16, 16, 1), jnp.float32)
    return add_uncertainty(
        build_trunk(CFG), CFG, rng=jax.random.key(0), example_input=x0
    )


class _CallForbidden:
    """Proxy around the jitted table step: lower() works, __call__ raises."""

    def __init__(self, step, log):
        self._step, self._log = step, log

    def lower(self, *a, **k):
        self._log.append(("lower", threading.current_thread().name))
        return self._step.lower(*a, **k)

    def __call__(self, *a, **k):
        raise AssertionError(
            "jitted table step executed — the precompile thread must never "
            "dispatch device work, and the table must run the AOT executable"
        )


def test_precompile_thread_never_executes(uq_state, monkeypatch):
    """The background thread only lowers+compiles; zero device dispatch."""
    rcps._AOT_TABLE.clear()
    log = []
    real = rcps._cached_table_step

    def spy(*a, **k):
        return _CallForbidden(real(*a, **k), log)

    monkeypatch.setattr(rcps, "_cached_table_step", spy)
    t = rcps.precompile_calibration(uq_state, CFG, _DS()[0], batch_size=4)
    t.join(timeout=300)
    assert not t.is_alive()
    assert len(rcps._AOT_TABLE) == 1, "AOT executable not registered"
    assert [op for op, _ in log] == ["lower"]
    assert log[0][1] == "calib-precompile"  # compile work stays off the caller


def test_table_runs_the_aot_executable(uq_state, monkeypatch):
    """compute_loss_table consumes the registered executable, not the jit
    step, and the numbers match the jit path exactly."""
    rcps._AOT_TABLE.clear()
    lam = rcps.lambda_grid(CFG)
    dl = lam[1] - lam[0]
    expected = rcps.compute_loss_table(uq_state, _DS(), lam - dl, batch_size=4)

    rcps.precompile_calibration(uq_state, CFG, _DS()[0], batch_size=4, block=True)
    assert len(rcps._AOT_TABLE) == 1
    real = rcps._cached_table_step
    monkeypatch.setattr(
        rcps, "_cached_table_step", lambda *a, **k: _CallForbidden(real(*a, **k), [])
    )
    table = rcps.compute_loss_table(uq_state, _DS(), lam - dl, batch_size=4)
    np.testing.assert_array_equal(table, expected)


def test_aot_path_under_mesh(uq_state):
    """Mesh variant: precompile → calibrate_model reproduces the jit path."""
    mesh = data_parallel_mesh()
    rcps._AOT_TABLE.clear()
    st_jit, tbl_jit = rcps.calibrate_model(
        uq_state, _DS(), CFG, mesh=mesh, batch_size=4
    )
    t = rcps.precompile_calibration(uq_state, CFG, _DS()[0], mesh=mesh, batch_size=4)
    t.join(timeout=300)
    assert len(rcps._AOT_TABLE) == 1
    st_aot, tbl_aot = rcps.calibrate_model(
        uq_state, _DS(), CFG, mesh=mesh, batch_size=4
    )
    np.testing.assert_array_equal(tbl_aot, tbl_jit)
    assert st_aot.lhat == st_jit.lhat


def test_shape_mismatch_falls_back(uq_state):
    """A registry miss (different batch size) silently uses the jit path."""
    rcps._AOT_TABLE.clear()
    rcps.precompile_calibration(uq_state, CFG, _DS()[0], batch_size=8, block=True)
    lam = rcps.lambda_grid(CFG)
    table = rcps.compute_loss_table(uq_state, _DS(), lam, batch_size=4)
    assert table.shape == (8, CFG["num_lambdas"])
