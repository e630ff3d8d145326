"""Parallelism layers on the 8-device virtual mesh: data-parallel equality,
spatial (height) sharding exactness, and the multi-seed sweep."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from im2im_uq_tpu.models.assembly import add_uncertainty, build_trunk
from im2im_uq_tpu.parallel.mesh import data_parallel_mesh, replicate_tree
from im2im_uq_tpu.parallel.spatial import spatial_sharded_forward
from im2im_uq_tpu.training.multiseed import (
    init_multiseed_states,
    make_multiseed_train_step,
    replica_state,
    shard_multiseed_state,
)
from im2im_uq_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

CONFIG = {
    "model": "UNet",
    "uncertainty_type": "gaussian",
    "q_lo": 0.05,
    "q_hi": 0.95,
    "q_lo_weight": 1.0,
    "q_hi_weight": 1.0,
    "mse_weight": 1.0,
}


@pytest.fixture(scope="module")
def small_state():
    return add_uncertainty(
        build_trunk(CONFIG),
        CONFIG,
        rng=jax.random.key(0),
        example_input=jnp.zeros((1, 32, 32, 1)),
    )


def test_mesh_has_eight_devices():
    assert len(jax.devices()) == 8
    mesh = data_parallel_mesh()
    assert mesh.devices.size == 8


def test_spatial_sharding_matches_unsharded(small_state):
    mesh = data_parallel_mesh()
    x = jnp.asarray(np.random.RandomState(0).randn(1, 64, 48, 1).astype(np.float32))
    fwd = spatial_sharded_forward(small_state, mesh)
    sharded = np.asarray(fwd(small_state.variables, x))
    plain = np.asarray(small_state.apply(x))
    # GSPMD halo exchange must reproduce the single-device forward
    np.testing.assert_allclose(sharded, plain, rtol=2e-5, atol=1e-6)


def test_multiseed_training_independent_replicas():
    # quantile head: its loss is Lipschitz in the params, so the sharded and
    # solo paths agree tightly (gaussian NLL's 1/var amplifies conv-lowering
    # reduction-order noise by ~1e6 and cannot be compared this way)
    cfg = dict(CONFIG, uncertainty_type="quantiles")
    small_state = add_uncertainty(
        build_trunk(cfg), cfg, rng=jax.random.key(0), example_input=jnp.zeros((1, 32, 32, 1))
    )
    # seed axis must divide the mesh; 2 seeds on a 2-device submesh keeps the
    # per-seed UNet CPU compile affordable for CI
    mesh = data_parallel_mesh(2)
    tx = optax.adam(1e-3)
    seeds = [0, 1]
    states = init_multiseed_states(
        small_state, seeds, tx, jnp.zeros((1, 32, 32, 1))
    )
    states = shard_multiseed_state(states, mesh)
    step = make_multiseed_train_step(small_state, tx, mesh)
    rng = np.random.RandomState(0)
    x = rng.randn(4, 32, 32, 1).astype(np.float32)
    y = rng.randn(4, 32, 32, 1).astype(np.float32)
    mask = np.ones((4,), np.float32)
    states, losses1 = step(states, x, y, mask)
    states, losses2 = step(states, x, y, mask)
    losses1, losses2 = np.asarray(losses1), np.asarray(losses2)
    assert losses2.shape == (2,)
    # different seeds → different replicas → different losses
    assert len(np.unique(np.round(losses2, 8))) > 1

    # replica extraction gives a usable single-model state
    r0 = replica_state(small_state, jax.device_get(states), 0)
    out = r0.apply(jnp.asarray(x[:1]))
    assert out.shape == (1, 3, 32, 32, 1)

    # per-replica update equals a solo train step with the same seed/batch
    from im2im_uq_tpu.training.train import TrainState, make_train_step
    from im2im_uq_tpu.models.heads import head_loss_pe_fn

    solo_vars = jax.jit(lambda r, xx: small_state.model.init(r, xx, train=False))(
        jax.random.key(seeds[1]), jnp.zeros((1, 32, 32, 1))
    )
    solo = TrainState(
        params=solo_vars["params"],
        batch_stats=solo_vars["batch_stats"],
        opt_state=tx.init(solo_vars["params"]),
        step=jnp.zeros((), jnp.int32),
    )
    solo_step = make_train_step(
        small_state.model, head_loss_pe_fn(cfg["uncertainty_type"]), cfg, tx
    )
    solo, l0 = solo_step(solo, x, y, mask)
    # vmapped convs lower differently than solo convs (batched tiling), and
    # ReLU/BN boundaries amplify the reduction-order noise — equivalence here
    # is statistical, not bitwise
    assert float(l0) == pytest.approx(float(losses1[1]), rel=2e-2)
    solo, l1 = solo_step(solo, x, y, mask)
    assert float(l1) == pytest.approx(float(losses2[1]), rel=1e-1)


def test_distributed_risk_psum_matches_host_mean(small_state):
    """compute_risks_device (on-device sharded reduction) must equal the
    host-side mean of the full loss table."""
    from im2im_uq_tpu.calibration.rcps import compute_loss_table, compute_risks_device

    class _DS:
        def __len__(self):
            return 12

        def __getitem__(self, i):
            rng = np.random.RandomState(i)
            return (
                rng.randn(32, 32, 1).astype(np.float32),
                rng.randn(32, 32, 1).astype(np.float32),
            )

    mesh = data_parallel_mesh()
    lam = np.linspace(0.0, 4.0, 16)
    ds = _DS()
    risks = compute_risks_device(small_state, ds, lam, batch_size=8, mesh=mesh)
    table = compute_loss_table(small_state, ds, lam, batch_size=8, mesh=mesh)
    np.testing.assert_allclose(risks, table.mean(axis=0), rtol=1e-6, atol=1e-7)


def test_pallas_table_method_under_mesh_matches_direct(small_state):
    """The TPU-default 'pallas' loss-table backend must run on a multi-device
    mesh (shard_map over the data axis) and reproduce the 'direct' XLA path.
    Guards the pod-mesh calibration contract: the reference's calibration
    runs on whatever hardware exists (calibrate_model.py:89-145), so the
    default backend may not silently require a single chip."""
    from im2im_uq_tpu.calibration.rcps import compute_loss_table, compute_risks_device

    class _DS:
        def __len__(self):
            return 12

        def __getitem__(self, i):
            rng = np.random.RandomState(100 + i)
            return (
                rng.randn(32, 32, 1).astype(np.float32),
                rng.randn(32, 32, 1).astype(np.float32),
            )

    mesh = data_parallel_mesh()
    lam = np.linspace(0.0, 4.0, 16)
    ds = _DS()
    t_pallas = compute_loss_table(
        small_state, ds, lam, batch_size=8, mesh=mesh, method="pallas"
    )
    t_direct = compute_loss_table(
        small_state, ds, lam, batch_size=8, mesh=mesh, method="direct"
    )
    assert t_pallas.shape == (12, 16)
    np.testing.assert_allclose(t_pallas, t_direct, rtol=1e-6, atol=1e-7)

    # the distributed-risk primitive takes the same shard_map path
    r_pallas = compute_risks_device(
        small_state, ds, lam, batch_size=8, mesh=mesh, method="pallas"
    )
    np.testing.assert_allclose(r_pallas, t_direct.mean(axis=0), rtol=1e-6, atol=1e-7)


def test_mesh_train_step_matches_single_device():
    """One data-parallel SPMD train step over the 8-device mesh reproduces
    the single-device step: GSPMD all-reduces the gradients and the
    BatchNorm batch statistics (sync-BN), so the mesh executes exactly the
    full-batch program. Guards the semantics the reference gets for free
    from single-process nn.DataParallel (reference train.py:112-115).

    Single-step with SGD on purpose: per-step program equivalence IS the
    semantic claim. Multi-step trajectories amplify reduction-order noise
    through the pinball loss's sign-based gradients, and Adam turns any
    noise-level gradient element (e.g. conv biases that BatchNorm cancels)
    into a ±lr coin flip — with SGD, parameter differences stay
    proportional to the gradient noise itself.
    """
    from im2im_uq_tpu.models.heads import head_loss_pe_fn
    from im2im_uq_tpu.training.train import TrainState, make_train_step

    cfg = dict(CONFIG, uncertainty_type="quantiles")
    state = add_uncertainty(
        build_trunk(cfg), cfg, rng=jax.random.key(0),
        example_input=jnp.zeros((1, 16, 16, 1)),
    )
    tx = optax.sgd(1e-2)
    rng = np.random.RandomState(0)
    x = rng.randn(8, 16, 16, 1).astype(np.float32)
    y = rng.randn(8, 16, 16, 1).astype(np.float32)
    mask = np.ones((8,), np.float32)

    def one_step(mesh):
        ts = TrainState(
            params=jax.tree.map(jnp.array, state.variables["params"]),
            batch_stats=jax.tree.map(jnp.array, state.variables["batch_stats"]),
            opt_state=tx.init(state.variables["params"]),
            step=jnp.zeros((), jnp.int32),
        )
        if mesh is not None:
            ts = replicate_tree(mesh, ts)
        step = make_train_step(
            state.model, head_loss_pe_fn("quantiles"), cfg, tx, mesh
        )
        ts, loss = step(ts, x, y, mask)
        return jax.device_get(ts), float(loss)

    ts_single, loss_single = one_step(None)
    ts_mesh, loss_mesh = one_step(data_parallel_mesh())
    assert loss_mesh == pytest.approx(loss_single, rel=1e-6)
    for tree_s, tree_m in (
        (ts_single.params, ts_mesh.params),
        (ts_single.batch_stats, ts_mesh.batch_stats),
    ):
        flat_s, _ = jax.tree_util.tree_flatten_with_path(tree_s)
        flat_m, _ = jax.tree_util.tree_flatten_with_path(tree_m)
        for (path, a), (_, b) in zip(flat_s, flat_m):
            np.testing.assert_allclose(
                np.asarray(b), np.asarray(a), rtol=1e-4, atol=2e-6,
                err_msg=jax.tree_util.keystr(path),
            )


def test_mesh_batch_size_rounds_to_data_axis():
    from im2im_uq_tpu.parallel.mesh import mesh_batch_size

    mesh = data_parallel_mesh()
    assert mesh_batch_size(78, mesh) == 80  # the reference's fastmri batch
    assert mesh_batch_size(8, mesh) == 8
    assert mesh_batch_size(1, mesh) == 8
    assert mesh_batch_size(78, None) == 78


@pytest.mark.full
def test_mesh_train_step_with_pallas_resize_island():
    """Round-5: the mesh train step opens resize_mesh_scope, so a
    resize_backend='pallas' decoder runs the fused upsample as per-shard
    shard_map islands on the 1-D data mesh (a bare pallas_call would be
    all-gathered by the partitioner). One step with the island must match
    the XLA-resize step from identical init."""
    from im2im_uq_tpu.models.heads import head_loss_pe_fn
    from im2im_uq_tpu.training.train import TrainState, make_train_step

    mesh = data_parallel_mesh()
    rng = np.random.RandomState(0)
    # 64x64: decoder widths 8/16/32/64 clear the kernel's W%8 gate
    x = rng.randn(8, 64, 64, 1).astype(np.float32)
    y = rng.randn(8, 64, 64, 1).astype(np.float32)
    mask = np.ones((8,), np.float32)

    losses, params = [], []
    for backend in ("xla", "pallas"):
        cfg = dict(CONFIG, uncertainty_type="quantiles",
                   resize_backend=backend)
        state = add_uncertainty(
            build_trunk(cfg), cfg, rng=jax.random.key(0),
            example_input=jnp.zeros((1, 64, 64, 1)),
        )
        tx = optax.adam(1e-3)
        ts = TrainState(
            params=state.variables["params"],
            batch_stats=state.variables["batch_stats"],
            opt_state=tx.init(state.variables["params"]),
            step=jnp.zeros((), jnp.int32),
        )
        ts = replicate_tree(mesh, ts)
        step = make_train_step(
            state.model, head_loss_pe_fn("quantiles"), cfg, tx, mesh
        )
        ts, loss = step(ts, x, y, mask)
        jax.block_until_ready(loss)
        losses.append(float(loss))
        params.append(jax.device_get(ts.params))

    assert np.isfinite(losses[0]) and np.isfinite(losses[1])
    np.testing.assert_allclose(losses[1], losses[0], rtol=1e-4)
    # post-adam params: the normalized first step maps ULP-level backend
    # gradient noise on tiny-|g| coordinates to O(lr) update differences,
    # so the bound is the adam step scale (2*lr), not grad precision —
    # op-level exactness is pinned by tests/test_pallas_resize.py
    flat_x = jax.tree_util.tree_leaves_with_path(params[0])
    flat_p = jax.tree_util.tree_leaves_with_path(params[1])
    for (path, a), (_, b) in zip(flat_x, flat_p):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), atol=2e-3, rtol=0,
            err_msg=jax.tree_util.keystr(path),
        )
