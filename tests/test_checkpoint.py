"""Checkpoint save/restore/resume with the reference filename contract."""

import jax.numpy as jnp
import numpy as np
import optax
import pytest

from im2im_uq_tpu.training.checkpoint import (
    checkpoint_key,
    checkpoint_path,
    find_resume_checkpoint,
    restore_checkpoint,
    save_checkpoint,
)
from im2im_uq_tpu.training.train import TrainState

CONFIG = {
    "dataset": "fastmri",
    "uncertainty_type": "quantiles",
    "batch_size": 78,
    "lr": 0.0001,
    "input_normalization": "standard",
    "output_normalization": "min-max",
}


def _tiny_state(seed=0):
    rng = np.random.RandomState(seed)
    params = {"w": jnp.asarray(rng.randn(4, 4), jnp.float32), "b": jnp.zeros((4,))}
    bs = {"mean": jnp.asarray(rng.randn(4), jnp.float32)}
    tx = optax.adam(1e-3)
    return TrainState(
        params=params, batch_stats=bs, opt_state=tx.init(params), step=jnp.int32(seed)
    )


def test_checkpoint_key_matches_reference_fields():
    # same fields and order as reference train.py:81 filename keying
    assert checkpoint_key(CONFIG) == "fastmri_quantiles_78_0.0001_standard_min-max"
    cfg2 = dict(CONFIG, output_normalization="0.5")
    assert checkpoint_key(cfg2).endswith("_0_5")


def test_save_restore_roundtrip(tmp_path):
    state = _tiny_state(3)
    path = checkpoint_path(str(tmp_path), 5, CONFIG)
    save_checkpoint(path, state, lhat=2.25, epoch=5)
    fresh = _tiny_state(0)
    restored, lhat, epoch = restore_checkpoint(path, fresh)
    assert lhat == 2.25 and epoch == 5
    np.testing.assert_array_equal(np.asarray(restored.params["w"]), np.asarray(state.params["w"]))
    np.testing.assert_array_equal(
        np.asarray(restored.batch_stats["mean"]), np.asarray(state.batch_stats["mean"])
    )
    assert int(restored.step) == 3


def test_lhat_none_roundtrip(tmp_path):
    state = _tiny_state()
    path = checkpoint_path(str(tmp_path), 1, CONFIG)
    save_checkpoint(path, state, lhat=None, epoch=1)
    _, lhat, _ = restore_checkpoint(path, _tiny_state())
    assert lhat is None


def test_resume_scan_prefers_final_then_descends(tmp_path):
    state = _tiny_state()
    epochs = 10
    # nothing → (None, 0)
    assert find_resume_checkpoint(str(tmp_path), epochs, CONFIG) == (None, 0)
    # intermediate epochs 3 and 7 → picks 7
    for e in (3, 7):
        save_checkpoint(checkpoint_path(str(tmp_path), e, CONFIG), state, None, e)
    path, start = find_resume_checkpoint(str(tmp_path), epochs, CONFIG)
    assert start == 7 and path.endswith(f"CP_epoch7_{checkpoint_key(CONFIG)}.msgpack")
    # final epoch present → short-circuits with starting_epoch == epochs
    save_checkpoint(checkpoint_path(str(tmp_path), epochs, CONFIG), state, 1.5, epochs)
    path, start = find_resume_checkpoint(str(tmp_path), epochs, CONFIG)
    assert start == epochs


def test_calibrated_checkpoint_path_contract():
    from im2im_uq_tpu.training.checkpoint import calibrated_checkpoint_path

    cfg = {"dataset": "synthetic", "uncertainty_type": "quantiles",
           "batch_size": 16, "lr": 0.001, "input_normalization": "standard",
           "output_normalization": "min-max"}
    p = calibrated_checkpoint_path("/ckpts", cfg)
    assert p == "/ckpts/CP_calibrated_synthetic_quantiles_16_0.001_standard_min-max.msgpack"
