"""Regression tests for round-2 review findings (VERDICT.md / ADVICE.md)."""

import logging

import jax
import jax.numpy as jnp
import numpy as np


def _tiny_state():
    from im2im_uq_tpu.models.assembly import add_uncertainty, build_trunk

    config = {
        "model": "UNet",
        "uncertainty_type": "quantiles",
        "q_lo": 0.05,
        "q_hi": 0.95,
        "q_lo_weight": 1.0,
        "q_hi_weight": 1.0,
        "mse_weight": 1.0,
    }
    x = jnp.zeros((1, 16, 16, 1), jnp.float32)
    state = add_uncertainty(
        build_trunk(config), config, rng=jax.random.key(0), example_input=x
    )
    return state, config


class _ShortStream:
    """Iterable (no __getitem__) dataset yielding fewer items than asked."""

    def __init__(self, n):
        self.n = n
        self.resets = 0

    def __iter__(self):
        rng = np.random.RandomState(0)
        for _ in range(self.n):
            yield (
                rng.randn(16, 16, 1).astype(np.float32),
                rng.randn(16, 16, 1).astype(np.float32),
            )

    def reset(self):
        self.resets += 1


def test_get_images_short_iterable_caps_at_stream_length():
    """VERDICT weak #7: a stream shorter than num_validation_images must not
    raise StopIteration out of the final artifact step."""
    from im2im_uq_tpu.training.evaluate import get_images

    state, config = _tiny_state()
    out = get_images(state, _ShortStream(1), [0, 1, 2], config)
    assert len(out["raw"]["inputs"]) == 1
    assert len(out["panels"]["examples_prediction"]) == 1


def test_mesh_batch_size_rounding_warns_once(caplog):
    """ADVICE: silent batch-size rounding must be surfaced in the log."""
    from im2im_uq_tpu.parallel import mesh as mesh_lib

    mesh = mesh_lib.data_parallel_mesh(8)
    mesh_lib._ROUNDING_WARNED.clear()
    with caplog.at_level(logging.WARNING, logger="im2im_uq_tpu.parallel.mesh"):
        assert mesh_lib.mesh_batch_size(78, mesh) == 80
        assert mesh_lib.mesh_batch_size(78, mesh) == 80  # second call: silent
    msgs = [r for r in caplog.records if "rounded up" in r.getMessage()]
    assert len(msgs) == 1
    assert mesh_lib.mesh_batch_size(80, mesh) == 80  # exact: no warning


def test_torch_import_restores_sys_path(tmp_path):
    """ADVICE: load_reference_checkpoint must not permanently mutate sys.path."""
    import sys

    import torch

    from im2im_uq_tpu.interop.torch_export import export_state_dict
    from im2im_uq_tpu.interop.torch_import import load_reference_checkpoint

    state, config = _tiny_state()
    sd = export_state_dict(state.variables, config["model"], config["uncertainty_type"])
    path = tmp_path / "cp.pth"
    torch.save(sd, str(path))
    fake_ref = str(tmp_path / "refroot")
    (tmp_path / "refroot").mkdir()
    load_reference_checkpoint(str(path), config, reference_path=fake_ref)
    assert fake_ref not in sys.path


def test_precompile_calibration_matches_lazy_compile():
    """VERDICT weak #6: the calibration program can be compiled ahead of
    calibrate_model (overlapped with training); results are unchanged."""
    from im2im_uq_tpu.calibration.rcps import calibrate_model, precompile_calibration

    state, config = _tiny_state()
    config = dict(
        config,
        alpha=0.2,
        delta=0.2,
        num_lambdas=10,
        minimum_lambda=0.0,
        maximum_lambda=6.0,
        rcps_loss="fraction_missed",
        batch_size=4,
    )

    class _DS:
        def __len__(self):
            return 8

        def __getitem__(self, i):
            r = np.random.RandomState(i)
            return (
                r.randn(16, 16, 1).astype(np.float32),
                r.randn(16, 16, 1).astype(np.float32),
            )

    ds = _DS()
    t = precompile_calibration(state, config, ds[0], batch_size=4)
    assert t is not None
    t.join(timeout=300)
    assert not t.is_alive()
    st, table = calibrate_model(state, ds, config, batch_size=4)
    assert table.shape == (8, 10)
    assert st.lhat is not None
    # blocking form is also fine (used by bench warmup)
    assert precompile_calibration(state, config, ds[0], batch_size=4, block=True) is None


def test_watch_gradients_emits_norms():
    """VERDICT missing #3 (wandb.watch parity): watch_gradients adds global
    and per-module grad-norm scalars to the train step output."""
    import optax

    from im2im_uq_tpu.models.heads import head_loss_pe_fn
    from im2im_uq_tpu.training.train import TrainState, make_train_step

    state, config = _tiny_state()
    config = dict(config, watch_gradients=True)
    tx = optax.adam(1e-3)
    ts = TrainState(
        params=state.variables["params"],
        batch_stats=state.variables["batch_stats"],
        opt_state=tx.init(state.variables["params"]),
        step=jnp.zeros((), jnp.int32),
    )
    step = make_train_step(state.model, head_loss_pe_fn("quantiles"), config, tx)
    x = np.random.RandomState(0).randn(2, 16, 16, 1).astype(np.float32)
    y = np.random.RandomState(1).randn(2, 16, 16, 1).astype(np.float32)
    mask = np.ones((2,), np.float32)
    ts, loss, norms = step(ts, x, y, mask)
    assert "grad_norm/global" in norms and "grad_norm/trunk" in norms
    assert all(np.isfinite(float(v)) and float(v) > 0 for v in norms.values())


class _SpawnableDS:
    """Module-level so the spawn-based worker pool can pickle it."""

    def __len__(self):
        return 8

    def __getitem__(self, i):
        return np.zeros((2, 2, 1), np.float32), np.zeros((2, 2, 1), np.float32)


def test_process_pool_fetcher_close_does_not_hang():
    """ADVICE: close() must terminate workers promptly even though they
    ignore SIGTERM (bounded join + SIGKILL escalation)."""
    import time

    from im2im_uq_tpu.data.core import ProcessPoolFetcher

    f = ProcessPoolFetcher(_SpawnableDS(), num_procs=2)
    f.fetch(range(4))
    t0 = time.monotonic()
    f.close()
    assert time.monotonic() - t0 < 15.0
