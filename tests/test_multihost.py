"""Multi-host (2-process) smoke test over the CPU backend.

VERDICT weak #5: ``parallel/distributed.py`` had no test at all. This spawns
two real OS processes, wires them through ``jax.distributed.initialize``
(coordinator on localhost), and asserts:
  - both processes see process_count()==2 and a consistent process_index;
  - a psum across hosts produces the correct global value;
  - VolumeShardSampler gives the two hosts a disjoint exact cover.

This is the minimal DCN-coordination analogue available without a TPU pod
(SURVEY.md §7: jax.distributed + DCN is the multi-host plan; the reference
itself never runs multi-process — volume_sampler.py:17 is dead code there).
"""

import os
import socket
import subprocess
import sys
import textwrap

import pytest

pytestmark = pytest.mark.full  # spawns interpreters; seconds-scale but not free

_WORKER = textwrap.dedent(
    """
    import os, sys
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")
    pid = int(sys.argv[1]); coord = sys.argv[2]

    from im2im_uq_tpu.parallel.distributed import (
        init_distributed, process_shard_info,
    )

    init_distributed(coordinator_address=coord, num_processes=2, process_id=pid)
    idx, cnt = process_shard_info()
    assert cnt == 2, f"process_count {cnt}"
    assert idx == pid, f"process_index {idx} != {pid}"

    # cross-host psum over the global (2-device) mesh
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P
    from im2im_uq_tpu.parallel.distributed import global_mesh

    mesh = global_mesh()
    assert len(jax.devices()) == 2  # one cpu device per process, global view

    @jax.jit
    def total(x):
        return jnp.sum(x)

    sharding = NamedSharding(mesh, P("data"))
    local = np.full((1,), float(pid + 1), np.float32)
    garr = jax.make_array_from_process_local_data(sharding, local, (2,))
    out = total(garr)  # GSPMD all-reduce across the two processes
    assert float(out) == 3.0, float(out)

    # host-side sharding: disjoint volume-granular cover
    from im2im_uq_tpu.data.volume_sampler import VolumeShardSampler

    vols = ["a", "a", "b", "b", "b", "c", "c", "c", "c"]
    sampler = VolumeShardSampler(vols, num_shards=2, shard_index=pid,
                                 shuffle=False, seed=0)
    mine = sorted(set(sampler.indices()))  # indices() pads by repetition
    print("SHARD", pid, mine, flush=True)
    print("WORKER_OK", pid, flush=True)
    """
)


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_init_psum_and_shard(tmp_path):
    worker = tmp_path / "worker.py"
    worker.write_text(_WORKER)
    coord = f"127.0.0.1:{_free_port()}"
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    env["PYTHONPATH"] = (
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        + os.pathsep
        + env.get("PYTHONPATH", "")
    )
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), str(pid), coord],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
            env=env,
        )
        for pid in (0, 1)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out}"
        assert f"WORKER_OK {pid}" in out

    # disjoint exact cover across the two shards
    shards = {}
    for out in outs:
        for line in out.splitlines():
            if line.startswith("SHARD "):
                _, pid, rest = line.split(" ", 2)
                shards[int(pid)] = eval(rest)  # list literal printed above
    s0, s1 = set(shards[0]), set(shards[1])
    assert not (s0 & s1), "shards must be disjoint"
    assert s0 | s1 == set(range(9)), "shards must cover every example"
    # volume-granular: every volume's slices live on exactly one shard
    vols = ["a", "a", "b", "b", "b", "c", "c", "c", "c"]
    for shard in (s0, s1):
        for i in shard:
            assert all(j in shard for j in range(9) if vols[j] == vols[i])
