"""Serving CLI test: checkpoint → calibrated intervals via scripts.infer.

Covers the full serving path end-to-end — save a training checkpoint with a
calibrated λ̂, rebuild + restore through the CLI loader, stream a
non-batch-multiple input set through the fixed-shape program, and verify
interval ordering and the λ override. Hermetic: tiny UNet, synthetic arrays.
"""

import json

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
import yaml

from im2im_uq_tpu.models.assembly import add_uncertainty, build_trunk
from im2im_uq_tpu.scripts import infer
from im2im_uq_tpu.training.checkpoint import checkpoint_path, save_checkpoint
from im2im_uq_tpu.training.train import TrainState
from im2im_uq_tpu.utils.cache import enable_compilation_cache

pytestmark = pytest.mark.full  # compile-heavy: excluded from -m smoke

enable_compilation_cache()

CFG = {
    "dataset": "synthetic",
    "model": "UNet",
    "uncertainty_type": "quantiles",
    "batch_size": 4,
    "lr": 1e-3,
    "input_normalization": "standard",
    "output_normalization": "min-max",
    "q_lo": 0.05,
    "q_hi": 0.95,
    "q_lo_weight": 1.0,
    "q_hi_weight": 1.0,
    "mse_weight": 1.0,
    "num_inputs": 1,
}
LHAT = 2.25


@pytest.fixture(scope="module")
def ckpt_and_config(tmp_path_factory):
    root = tmp_path_factory.mktemp("infer")
    state = add_uncertainty(
        build_trunk(CFG), CFG, rng=jax.random.key(0),
        example_input=jnp.zeros((1, 32, 32, 1)),
    )
    tx = optax.adam(CFG["lr"])
    ts = TrainState(
        params=state.variables["params"],
        batch_stats=state.variables["batch_stats"],
        opt_state=tx.init(state.variables["params"]),
        step=jnp.zeros((), jnp.int32),
    )
    path = checkpoint_path(str(root), 1, CFG)
    save_checkpoint(path, ts, LHAT, 1)
    cfg_yaml = root / "config.yml"
    cfg_yaml.write_text(
        yaml.safe_dump({"parameters": {k: {"value": v} for k, v in CFG.items()}})
    )
    return root, path, cfg_yaml, state


def test_loader_restores_params_and_lhat(ckpt_and_config):
    _, path, _, state = ckpt_and_config
    restored = infer.load_uq_state_for_inference(dict(CFG), str(path))
    assert restored.lhat == pytest.approx(LHAT)
    k0 = state.variables["params"]["trunk"]["inc"]["conv0"]["kernel"]
    k1 = restored.variables["params"]["trunk"]["inc"]["conv0"]["kernel"]
    np.testing.assert_array_equal(np.asarray(k0), np.asarray(k1))


def test_predict_intervals_tail_padding_and_ordering(ckpt_and_config):
    _, path, _, _ = ckpt_and_config
    state = infer.load_uq_state_for_inference(dict(CFG), str(path))
    x = np.random.RandomState(0).randn(5, 32, 32, 1).astype(np.float32)
    out = infer.predict_intervals(state, x, batch_size=4)  # 5 = 4 + ragged 1
    assert out["prediction"].shape == (5, 32, 32, 1)
    assert np.all(out["lower"] <= out["prediction"])
    assert np.all(out["prediction"] <= out["upper"])
    # tail result must equal the same example run in a full batch
    full = infer.predict_intervals(state, x[4:5], batch_size=1)
    np.testing.assert_allclose(
        out["prediction"][4], full["prediction"][0], rtol=1e-5, atol=1e-6
    )


def test_cli_end_to_end(ckpt_and_config, tmp_path):
    root, path, cfg_yaml, _ = ckpt_and_config
    x = np.random.RandomState(1).randn(3, 32, 32, 1).astype(np.float32)
    np.save(tmp_path / "batch0.npy", x)
    out_dir = tmp_path / "out"
    rc = infer.main(
        [
            "--config", str(cfg_yaml),
            "--checkpoint", str(path),
            "--input", str(tmp_path / "batch0.npy"),
            "--output", str(out_dir),
            "--batch-size", "4",
        ]
    )
    assert rc == 0
    with np.load(out_dir / "batch0_intervals.npz") as z:
        assert z["lam"] == pytest.approx(LHAT)  # λ̂ came from the checkpoint
        assert z["lower"].shape == (3, 32, 32, 1)
        assert np.all(z["lower"] <= z["upper"])
    summary = json.loads((out_dir / "inference_summary.json").read_text())
    assert summary["images"] == 3 and summary["uncertainty_type"] == "quantiles"


def test_cli_lam_override_and_uncalibrated_guard(ckpt_and_config, tmp_path):
    root, path, cfg_yaml, _ = ckpt_and_config
    # uncalibrated checkpoint + no --lam → hard error
    state = infer.load_uq_state_for_inference(dict(CFG), str(path))
    tx = optax.adam(CFG["lr"])
    ts = TrainState(
        params=state.variables["params"],
        batch_stats=state.variables["batch_stats"],
        opt_state=tx.init(state.variables["params"]),
        step=jnp.zeros((), jnp.int32),
    )
    uncal = tmp_path / "uncal.msgpack"
    save_checkpoint(str(uncal), ts, None, 1)
    np.save(tmp_path / "x.npy", np.zeros((1, 32, 32, 1), np.float32))
    args = [
        "--config", str(cfg_yaml),
        "--checkpoint", str(uncal),
        "--input", str(tmp_path / "x.npy"),
        "--output", str(tmp_path / "out2"),
    ]
    with pytest.raises(SystemExit):
        infer.main(args)
    # explicit λ unblocks it, and a wider λ widens the intervals
    assert infer.main(args + ["--lam", "1.0"]) == 0
    assert infer.main(args + ["--lam", "3.0", "--output", str(tmp_path / "out3")]) == 0
    with np.load(tmp_path / "out2" / "x_intervals.npz") as z1, np.load(
        tmp_path / "out3" / "x_intervals.npz"
    ) as z3:
        w1 = float(np.mean(z1["upper"] - z1["lower"]))
        w3 = float(np.mean(z3["upper"] - z3["lower"]))
    assert w3 >= w1


def test_input_iteration_name_collision_and_empty(tmp_path):
    x = np.zeros((2, 8, 8, 1), np.float32)
    np.save(tmp_path / "a.npy", x)
    np.savez(tmp_path / "a.npz", x=x + 1)
    names = [n for n, _ in infer._iter_input_arrays(str(tmp_path))]
    assert len(names) == len(set(names)) == 2  # no silent overwrite
    np.save(tmp_path / "empty.npy", np.zeros((0, 8, 8, 1), np.float32))
    with pytest.raises(ValueError, match="no images"):
        list(infer._iter_input_arrays(str(tmp_path / "empty.npy")))


def test_predict_intervals_empty_input(ckpt_and_config):
    _, path, _, _ = ckpt_and_config
    state = infer.load_uq_state_for_inference(dict(CFG), str(path))
    out = infer.predict_intervals(state, np.zeros((0, 32, 32, 1), np.float32))
    assert out["prediction"].shape == (0, 32, 32, 1)


def test_predict_intervals_spatial_matches_single_device(ckpt_and_config, tmp_path):
    """Giant-tile serving: HEIGHT-sharded forward equals the single-device
    one (GSPMD halo exchanges are exact), through both the library call and
    the CLI's --spatial flag."""
    from im2im_uq_tpu.parallel.mesh import data_parallel_mesh

    root, path, cfg_yaml, _ = ckpt_and_config
    state = infer.load_uq_state_for_inference(dict(CFG), str(path))
    x = np.random.RandomState(3).randn(3, 32, 32, 1).astype(np.float32)
    ref = infer.predict_intervals(state, x, batch_size=4)
    out = infer.predict_intervals_spatial(state, x, data_parallel_mesh())
    for key in ("lower", "prediction", "upper"):
        assert out[key].shape == (3, 32, 32, 1)
        np.testing.assert_allclose(out[key], ref[key], rtol=1e-5, atol=1e-6)

    np.save(tmp_path / "tiles.npy", x)
    rc = infer.main(
        [
            "--config", str(cfg_yaml),
            "--checkpoint", str(path),
            "--input", str(tmp_path / "tiles.npy"),
            "--output", str(tmp_path / "out_spatial"),
            "--spatial",
        ]
    )
    assert rc == 0
    with np.load(tmp_path / "out_spatial" / "tiles_intervals.npz") as z:
        np.testing.assert_allclose(
            z["prediction"], ref["prediction"], rtol=1e-5, atol=1e-6
        )
    # mutual exclusion guard
    with pytest.raises(SystemExit, match="mutually exclusive"):
        infer.main(
            [
                "--config", str(cfg_yaml),
                "--checkpoint", str(path),
                "--input", str(tmp_path / "tiles.npy"),
                "--output", str(tmp_path / "out_x"),
                "--spatial", "--data-parallel",
            ]
        )


def test_predict_intervals_mesh_matches_single_device(ckpt_and_config):
    """Data-parallel serving (mesh path) reproduces the single-device outputs.

    Eval-mode BatchNorm uses running stats, so sharding the batch over the
    8-device mesh must be bit-compatible with running it on one device.
    Ragged tail (10 = 8 + 2) exercises mesh rounding + zero padding: the
    requested batch_size 4 is rounded up to the mesh's 8.
    """
    from im2im_uq_tpu.parallel.mesh import data_parallel_mesh

    _, path, _, _ = ckpt_and_config
    state = infer.load_uq_state_for_inference(dict(CFG), str(path))
    x = np.random.RandomState(2).randn(10, 32, 32, 1).astype(np.float32)
    ref = infer.predict_intervals(state, x, batch_size=4)
    mesh = data_parallel_mesh()
    out = infer.predict_intervals(state, x, batch_size=4, mesh=mesh)
    for key in ("lower", "prediction", "upper"):
        assert out[key].shape == (10, 32, 32, 1)
        np.testing.assert_allclose(out[key], ref[key], rtol=1e-5, atol=1e-6)


@pytest.mark.full
def test_predict_intervals_mesh_with_pallas_resize_island():
    """Round-5: mesh serving opens resize_mesh_scope, so a pallas-resize
    decoder serves as per-shard shard_map islands; outputs must match the
    single-device run (eval-mode BN: running stats, so exactness up to the
    kernel's f32-accumulating W pass)."""
    from im2im_uq_tpu.models.assembly import add_uncertainty, build_trunk
    from im2im_uq_tpu.parallel.mesh import data_parallel_mesh

    cfg = dict(CFG, resize_backend="pallas")
    state = infer_state = add_uncertainty(
        build_trunk(cfg), cfg, rng=jax.random.key(0),
        example_input=jnp.zeros((1, 64, 64, 1)),
    ).set_lhat(LHAT)
    x = np.random.RandomState(5).randn(9, 64, 64, 1).astype(np.float32)

    single = infer.predict_intervals(state, x, batch_size=8)
    mesh = data_parallel_mesh()
    sharded = infer.predict_intervals(infer_state, x, batch_size=8, mesh=mesh)
    for k in ("lower", "prediction", "upper"):
        np.testing.assert_allclose(
            sharded[k], single[k], rtol=1e-4, atol=1e-5, err_msg=k
        )
