"""AOT serving artifact: export → load → serve, with no model code needed.

Covers scripts.export_serving end-to-end: the exported StableHLO module
must reproduce the live model's calibrated nested-sets outputs exactly
(same program, params baked as constants), λ̂ must be immutable in the
artifact, the platform guard must refuse mismatched hosts, and the infer
CLI must serve an artifact byte-identically to config+checkpoint serving.
"""

import json

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
import yaml

from im2im_uq_tpu.models.assembly import add_uncertainty, build_trunk
from im2im_uq_tpu.scripts import export_serving, infer
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
def artifact_env(tmp_path_factory):
    root = tmp_path_factory.mktemp("serving_export")
    state = add_uncertainty(
        build_trunk(CFG), CFG, rng=jax.random.key(0),
        example_input=jnp.zeros((1, 32, 32, 1)),
    ).set_lhat(LHAT)
    tx = optax.adam(CFG["lr"])
    ts = TrainState(
        params=state.variables["params"],
        batch_stats=state.variables["batch_stats"],
        opt_state=tx.init(state.variables["params"]),
        step=jnp.zeros((), jnp.int32),
    )
    ckpt = checkpoint_path(str(root), 1, CFG)
    save_checkpoint(ckpt, ts, LHAT, 1)
    cfg_yaml = root / "config.yml"
    cfg_yaml.write_text(
        yaml.safe_dump({"parameters": {k: {"value": v} for k, v in CFG.items()}})
    )
    art = root / "model.uq.npz"
    meta = export_serving.export_serving_artifact(
        state, str(art), batch_size=4, height=32, width=32, lam=LHAT
    )
    return root, ckpt, cfg_yaml, state, art, meta


def test_artifact_matches_live_model(artifact_env):
    _, _, _, state, art, meta = artifact_env
    assert meta["lam"] == LHAT and meta["param_count"] > 0
    assert "cpu" in meta["platforms"] and "tpu" in meta["platforms"]
    loaded = export_serving.load_serving_artifact(str(art))
    assert loaded.lhat == pytest.approx(LHAT)
    x = np.random.RandomState(0).randn(4, 32, 32, 1).astype(np.float32)
    got = loaded.nested_sets(x)
    ref = state.nested_sets(jnp.asarray(x), lam=LHAT)
    for g, r in zip(got, ref):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r), rtol=1e-6, atol=1e-7)


def test_artifact_serves_through_predict_intervals(artifact_env):
    """ServingArtifact is a drop-in UQState for infer.predict_intervals
    (ragged tail 6 = 4 + 2 exercises the fixed-shape padding)."""
    _, _, _, state, art, _ = artifact_env
    loaded = export_serving.load_serving_artifact(str(art))
    x = np.random.RandomState(1).randn(6, 32, 32, 1).astype(np.float32)
    got = infer.predict_intervals(loaded, x, batch_size=4)
    ref = infer.predict_intervals(state, x, batch_size=4, lam=LHAT)
    for key in ("lower", "prediction", "upper"):
        assert got[key].shape == (6, 32, 32, 1)
        np.testing.assert_allclose(got[key], ref[key], rtol=1e-6, atol=1e-7)


def test_lambda_is_baked(artifact_env):
    _, _, _, _, art, _ = artifact_env
    loaded = export_serving.load_serving_artifact(str(art))
    x = np.zeros((4, 32, 32, 1), np.float32)
    loaded.nested_sets(x, lam=LHAT)  # matching λ is fine
    with pytest.raises(ValueError, match="baked"):
        loaded.nested_sets(x, lam=1.0)


def test_platform_guard(artifact_env, tmp_path):
    _, _, _, state, _, _ = artifact_env
    art = tmp_path / "tpu_only.uq.npz"
    export_serving.export_serving_artifact(
        state, str(art), batch_size=4, height=32, width=32, lam=LHAT,
        platforms=("tpu",),
    )
    with pytest.raises(ValueError, match="platforms"):
        export_serving.load_serving_artifact(str(art))


def test_uncalibrated_export_refused(artifact_env):
    _, _, _, state, _, _ = artifact_env
    with pytest.raises(ValueError, match="λ̂"):
        export_serving.export_serving_artifact(
            state.replace(lhat=None), "/tmp/nope.npz",
            batch_size=4, height=32, width=32,
        )


def test_cli_export_then_infer_artifact(artifact_env, tmp_path):
    root, ckpt, cfg_yaml, _, _, _ = artifact_env
    art = tmp_path / "cli.uq.npz"
    rc = export_serving.main(
        [
            "--config", str(cfg_yaml),
            "--checkpoint", str(ckpt),
            "--output", str(art),
            "--batch-size", "4", "--height", "32", "--width", "32",
        ]
    )
    assert rc == 0

    x = np.random.RandomState(2).randn(5, 32, 32, 1).astype(np.float32)
    np.save(tmp_path / "vol.npy", x)
    rc = infer.main(
        [
            "--artifact", str(art),
            "--input", str(tmp_path / "vol.npy"),
            "--output", str(tmp_path / "out_art"),
        ]
    )
    assert rc == 0
    rc = infer.main(
        [
            "--config", str(cfg_yaml),
            "--checkpoint", str(ckpt),
            "--input", str(tmp_path / "vol.npy"),
            "--output", str(tmp_path / "out_ckpt"),
            "--batch-size", "4",
        ]
    )
    assert rc == 0
    with np.load(tmp_path / "out_art" / "vol_intervals.npz") as za, np.load(
        tmp_path / "out_ckpt" / "vol_intervals.npz"
    ) as zc:
        assert za["lam"] == pytest.approx(LHAT)
        for key in ("lower", "prediction", "upper"):
            np.testing.assert_allclose(za[key], zc[key], rtol=1e-6, atol=1e-7)
    summary = json.loads(
        (tmp_path / "out_art" / "inference_summary.json").read_text()
    )
    assert summary["uncertainty_type"] == "quantiles" and summary["images"] == 5


def test_data_parallel_artifact(artifact_env, tmp_path):
    """n_devices=4 export binds to a concrete 4-device mesh at load and
    reproduces the single-device program exactly (eval-mode BN → shard
    outputs are independent of the sharding)."""
    _, _, _, state, _, _ = artifact_env
    art = tmp_path / "dp4.uq.npz"
    meta = export_serving.export_serving_artifact(
        state, str(art), batch_size=4, height=32, width=32, lam=LHAT,
        platforms=("cpu",), n_devices=4,
    )
    assert meta["n_devices"] == 4
    loaded = export_serving.load_serving_artifact(str(art))
    x = np.random.RandomState(3).randn(4, 32, 32, 1).astype(np.float32)
    got = loaded.nested_sets(x)
    ref = state.nested_sets(jnp.asarray(x), lam=LHAT)
    for g, r in zip(got, ref):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r), rtol=1e-6, atol=1e-7)
    # drop-in through the batching/padding serving driver too
    got = infer.predict_intervals(loaded, x[:3], batch_size=4)
    for key, r in zip(("lower", "prediction", "upper"), ref):
        np.testing.assert_allclose(
            got[key], np.asarray(r)[:3], rtol=1e-6, atol=1e-7
        )


def test_data_parallel_export_validation(artifact_env, tmp_path):
    _, _, _, state, _, _ = artifact_env
    # batch must divide by n_devices
    with pytest.raises(ValueError, match="divide"):
        export_serving.export_serving_artifact(
            state, str(tmp_path / "bad.npz"), batch_size=4, height=32,
            width=32, lam=LHAT, n_devices=3,
        )
    # a pod-sized artifact exports fine anywhere (abstract mesh) but
    # refuses to LOAD on a host with fewer devices
    art = tmp_path / "dp16.uq.npz"
    export_serving.export_serving_artifact(
        state, str(art), batch_size=16, height=32, width=32, lam=LHAT,
        platforms=("cpu",), n_devices=16,
    )
    with pytest.raises(ValueError, match="data-parallel over 16"):
        export_serving.load_serving_artifact(str(art))


def test_cli_argument_validation(artifact_env, tmp_path):
    root, ckpt, cfg_yaml, _, art, _ = artifact_env
    x = np.zeros((1, 32, 32, 1), np.float32)
    np.save(tmp_path / "x.npy", x)
    base = ["--input", str(tmp_path / "x.npy"), "--output", str(tmp_path / "o")]
    # artifact AND config/checkpoint → error
    with pytest.raises(SystemExit, match="either"):
        infer.main(["--artifact", str(art), "--config", str(cfg_yaml)] + base)
    # neither → error
    with pytest.raises(SystemExit, match="either"):
        infer.main(base)
    # conflicting --lam vs baked λ̂ → error
    with pytest.raises(SystemExit, match="baked"):
        infer.main(["--artifact", str(art), "--lam", "1.0"] + base)


def test_cli_artifact_batch_size_warning_sentinel(artifact_env, tmp_path, capsys):
    """Round-5 (ADVICE r4): explicit-passing detection uses an argparse
    sentinel (default None), not argv prefix scanning — any spelling of a
    mismatching --batch-size warns; omitting it stays silent."""
    _, _, _, _, art, _ = artifact_env
    x = np.random.RandomState(3).randn(2, 32, 32, 1).astype(np.float32)
    np.save(tmp_path / "w.npy", x)
    base = ["--artifact", str(art), "--input", str(tmp_path / "w.npy")]

    # abbreviated spelling, mismatching the artifact's baked batch of 4
    rc = infer.main(base + ["--output", str(tmp_path / "o1"), "--batch=64"])
    assert rc == 0
    assert "ignored" in capsys.readouterr().err

    # not passed: no warning
    rc = infer.main(base + ["--output", str(tmp_path / "o2")])
    assert rc == 0
    assert "ignored" not in capsys.readouterr().err

    # passed but equal to the baked batch: no warning
    rc = infer.main(base + ["--output", str(tmp_path / "o3"),
                            "--batch-size", "4"])
    assert rc == 0
    assert "ignored" not in capsys.readouterr().err


def test_artifact_nested_sets_rejects_live_mesh(artifact_env):
    """UQState.nested_sets grew a mesh= kwarg (round-5 serving islands);
    artifacts keep signature compatibility but must refuse a live mesh —
    their sharding is baked at export time."""
    _, _, _, _, art, _ = artifact_env
    loaded = export_serving.load_serving_artifact(str(art))
    with pytest.raises(ValueError, match="bake"):
        loaded.nested_sets(np.zeros((4, 32, 32, 1), np.float32), mesh=object())
