"""Checkpoint save/restore/resume with the reference filename contract."""

import os

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


def test_orbax_backend_roundtrip(tmp_path):
    state = _tiny_state(5)
    cfg = dict(CONFIG, checkpoint_backend="orbax")
    path = checkpoint_path(str(tmp_path), 4, cfg)
    assert path.endswith(".orbax")
    save_checkpoint(path, state, lhat=1.75, epoch=4)
    restored, lhat, epoch = restore_checkpoint(path, _tiny_state(0))
    assert lhat == 1.75 and epoch == 4
    np.testing.assert_array_equal(
        np.asarray(restored.params["w"]), np.asarray(state.params["w"])
    )
    assert int(restored.step) == 5


def test_orbax_async_save(tmp_path):
    from im2im_uq_tpu.training.checkpoint import wait_for_async_saves

    state = _tiny_state(7)
    cfg = dict(CONFIG, checkpoint_backend="orbax")
    path = checkpoint_path(str(tmp_path), 2, cfg)
    save_checkpoint(path, state, lhat=None, epoch=2, async_save=True)
    wait_for_async_saves()
    restored, lhat, epoch = restore_checkpoint(path, _tiny_state(0))
    assert lhat is None and epoch == 2
    np.testing.assert_array_equal(
        np.asarray(restored.params["b"]), np.asarray(state.params["b"])
    )


def test_resume_scan_finds_either_backend(tmp_path):
    state = _tiny_state()
    epochs = 6
    # an orbax checkpoint at epoch 4 is found even with flax configured
    ocfg = dict(CONFIG, checkpoint_backend="orbax")
    save_checkpoint(checkpoint_path(str(tmp_path), 4, ocfg), state, None, 4)
    path, start = find_resume_checkpoint(str(tmp_path), epochs, CONFIG)
    assert start == 4 and path.endswith(".orbax")
    # a newer flax checkpoint wins the scan
    save_checkpoint(checkpoint_path(str(tmp_path), 5, CONFIG), state, None, 5)
    path, start = find_resume_checkpoint(str(tmp_path), epochs, CONFIG)
    assert start == 5 and path.endswith(".msgpack")


def test_train_net_orbax_async_end_to_end(tmp_path):
    """train_net with the orbax backend + async saves: checkpoints commit,
    and a second call resumes from the final epoch without training."""
    import jax

    from im2im_uq_tpu.data.synthetic import SyntheticDataset
    from im2im_uq_tpu.models.assembly import add_uncertainty, build_trunk
    from im2im_uq_tpu.training.train import train_net
    from im2im_uq_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    cfg = {
        "dataset": "synthetic", "model": "UNet", "uncertainty_type": "quantiles",
        "batch_size": 4, "lr": 1e-3, "epochs": 1, "input_normalization": "standard",
        "output_normalization": "min-max", "q_lo": 0.05, "q_hi": 0.95,
        "q_lo_weight": 1.0, "q_hi_weight": 1.0, "mse_weight": 1.0,
        "checkpoint_backend": "orbax", "async_checkpoint": True,
    }
    ds = SyntheticDataset(num_examples=8, image_size=16, seed=0)
    state = add_uncertainty(
        build_trunk(cfg), cfg, rng=jax.random.key(0),
        example_input=jnp.zeros((1, 16, 16, 1)),
    )
    trained = train_net(
        state, ds, ds, None, epochs=1, batch_size=4, lr=1e-3,
        checkpoint_dir=str(tmp_path), checkpoint_every=1, validate_every=10,
        config=cfg,
    )
    path = checkpoint_path(str(tmp_path), 1, cfg)
    assert path.endswith(".orbax") and os.path.isdir(path)
    resumed = train_net(
        trained, ds, ds, None, epochs=1, batch_size=4, lr=1e-3,
        load_from_checkpoint=True, checkpoint_dir=str(tmp_path),
        checkpoint_every=1, validate_every=10, config=cfg,
    )
    np.testing.assert_array_equal(
        np.asarray(resumed.variables["params"]["trunk"]["inc"]["conv0"]["kernel"]),
        np.asarray(trained.variables["params"]["trunk"]["inc"]["conv0"]["kernel"]),
    )


def test_restore_waits_for_pending_async_save(tmp_path):
    """restore_checkpoint must block on an in-flight async orbax save even
    though the target directory does not exist yet at call time."""
    state = _tiny_state(11)
    cfg = dict(CONFIG, checkpoint_backend="orbax")
    path = checkpoint_path(str(tmp_path), 3, cfg)
    save_checkpoint(path, state, lhat=0.5, epoch=3, async_save=True)
    # no manual wait_for_async_saves(): restore must do it itself
    restored, lhat, epoch = restore_checkpoint(path, _tiny_state(0))
    assert lhat == 0.5 and epoch == 3
    np.testing.assert_array_equal(
        np.asarray(restored.params["w"]), np.asarray(state.params["w"])
    )


def test_save_calibrated_checkpoint_honors_backend(tmp_path):
    import jax

    from im2im_uq_tpu.models.assembly import add_uncertainty, build_trunk
    from im2im_uq_tpu.training.checkpoint import save_calibrated_checkpoint

    base = {"dataset": "synthetic", "model": "UNet", "uncertainty_type": "quantiles",
            "batch_size": 4, "lr": 1e-3, "epochs": 2,
            "input_normalization": "standard", "output_normalization": "min-max",
            "q_lo": 0.05, "q_hi": 0.95, "q_lo_weight": 1.0, "q_hi_weight": 1.0,
            "mse_weight": 1.0}
    st = add_uncertainty(build_trunk(base), base, rng=jax.random.key(0),
                         example_input=jnp.zeros((1, 16, 16, 1))).set_lhat(3.5)
    for backend, check in (("flax", os.path.isfile), ("orbax", os.path.isdir)):
        cfg = dict(base, checkpoint_backend=backend)
        path = save_calibrated_checkpoint(st, cfg, str(tmp_path / backend))
        assert check(path), (backend, path)
        from im2im_uq_tpu.scripts.infer import load_uq_state_for_inference

        restored = load_uq_state_for_inference(cfg, path)
        assert restored.lhat == pytest.approx(3.5)
