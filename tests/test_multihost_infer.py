"""Two-process data-parallel SERVING vs the single-process run.

Counterpart of tests/test_multihost_router.py for the serving surface:
``scripts.infer`` with ``--data-parallel`` runs

  (a) in ONE process over a 2-virtual-device CPU mesh, and
  (b) in TWO coordinated ``jax.distributed`` processes (1 CPU device
      each — the same 2-device global mesh, now spanning processes),

and the interval .npz artifacts must be identical to a plain
single-device run: eval-mode BatchNorm uses running statistics, so
sharding the batch (``parallel.mesh.put_batch`` global-array feed,
``fetch`` process_allgather of the sharded outputs) must be numerically
invisible. This pins the multi-process branch of
``infer.predict_intervals`` that no in-process test can reach.
"""

import os
import socket
import subprocess
import sys
import textwrap

import numpy as np
import pytest

pytestmark = pytest.mark.full  # spawns interpreters + CPU compiles

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_SETUP = textwrap.dedent(
    """
    import os, sys
    os.environ["JAX_PLATFORMS"] = "cpu"
    root = sys.argv[2]
    import jax

    jax.config.update("jax_platforms", "cpu")

    import numpy as np, yaml, optax
    import jax.numpy as jnp
    from im2im_uq_tpu.models.assembly import add_uncertainty, build_trunk
    from im2im_uq_tpu.training.checkpoint import checkpoint_path, save_checkpoint
    from im2im_uq_tpu.training.train import TrainState
    from im2im_uq_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    CFG = {
        "dataset": "synthetic", "model": "UNet",
        "uncertainty_type": "quantiles", "batch_size": 4, "lr": 1e-3,
        "input_normalization": "standard", "output_normalization": "min-max",
        "q_lo": 0.05, "q_hi": 0.95, "q_lo_weight": 1.0, "q_hi_weight": 1.0,
        "mse_weight": 1.0, "num_inputs": 1,
    }
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
    ckpt = checkpoint_path(root, 1, CFG)
    save_checkpoint(ckpt, ts, 2.25, 1)
    with open(os.path.join(root, "config.yml"), "w") as f:
        yaml.safe_dump({"parameters": {k: {"value": v} for k, v in CFG.items()}}, f)
    x = np.random.RandomState(0).randn(7, 32, 32, 1).astype(np.float32)
    np.save(os.path.join(root, "vol.npy"), x)
    with open(os.path.join(root, "ckpt_path.txt"), "w") as f:
        f.write(ckpt)
    print("SETUP_OK", flush=True)
    """
)

_WORKER = textwrap.dedent(
    """
    import os, sys
    os.environ["JAX_PLATFORMS"] = "cpu"
    mode = sys.argv[1]            # "plain" | "single" | process id "0"/"1"
    root = sys.argv[2]
    if mode == "single":
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + " --xla_force_host_platform_device_count=2"
        )
    import jax

    jax.config.update("jax_platforms", "cpu")

    from im2im_uq_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    if mode not in ("plain", "single"):
        from im2im_uq_tpu.parallel.distributed import init_distributed

        init_distributed(
            coordinator_address=sys.argv[3], num_processes=2, process_id=int(mode)
        )
        assert len(jax.devices()) == 2, jax.devices()

    from im2im_uq_tpu.scripts import infer

    with open(os.path.join(root, "ckpt_path.txt")) as f:
        ckpt = f.read().strip()
    args = [
        "--config", os.path.join(root, "config.yml"),
        "--checkpoint", ckpt,
        "--input", os.path.join(root, "vol.npy"),
        "--output", os.path.join(root, "out_" + mode),
        "--batch-size", "4",
    ]
    if mode != "plain":
        args.append("--data-parallel")
    rc = infer.main(args)
    assert rc == 0
    print("INFER_OK", mode, flush=True)
    """
)


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _env():
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env.pop("XLA_FLAGS", None)  # workers set their own device counts
    return env


def _intervals(root, mode):
    path = os.path.join(root, f"out_{mode}", "vol_intervals.npz")
    with np.load(path) as z:
        return {k: np.asarray(z[k]) for k in ("lower", "prediction", "upper")}


def test_two_process_serving_matches_single_device(tmp_path):
    setup = tmp_path / "setup.py"
    setup.write_text(_SETUP)
    worker = tmp_path / "worker.py"
    worker.write_text(_WORKER)
    root = str(tmp_path)

    r = subprocess.run(
        [sys.executable, str(setup), "setup", root],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        env=_env(), timeout=1200,
    )
    assert r.returncode == 0 and "SETUP_OK" in r.stdout, r.stdout

    # legs (a): plain single-device + single-process 2-device mesh
    for mode in ("plain", "single"):
        r = subprocess.run(
            [sys.executable, str(worker), mode, root],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=_env(), timeout=1200,
        )
        assert r.returncode == 0, f"{mode}:\n{r.stdout}"
        assert f"INFER_OK {mode}" in r.stdout

    # leg (b): two coordinated processes, 1 device each
    coord = f"127.0.0.1:{_free_port()}"
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), str(pid), root, coord],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=_env(),
        )
        for pid in (0, 1)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=1200)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out}"
        assert f"INFER_OK {pid}" in out

    ref = _intervals(root, "plain")
    for mode in ("single", "0", "1"):
        got = _intervals(root, mode)
        for key in ("lower", "prediction", "upper"):
            assert got[key].shape == (7, 32, 32, 1)
            np.testing.assert_allclose(
                got[key], ref[key], rtol=1e-5, atol=1e-6,
                err_msg=f"{mode}/{key} vs plain",
            )
