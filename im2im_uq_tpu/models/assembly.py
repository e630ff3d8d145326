"""Model assembly: trunk + uncertainty head + calibrated-λ state.

Counterpart of the reference's ModelWithUncertainty / add_uncertainty
(reference: core/models/add_uncertainty.py:15-87), redesigned functionally:
the network is a single Flax module (``UQModel``), and the mutable bits the
reference kept on the nn.Module — the calibrated ``lhat`` buffer, the loss
function, the nested-set function, the params dict — live in an immutable
pytree-friendly wrapper (``UQState``) whose apply paths are pure functions,
so the whole train/calibrate/predict surface jits and shards cleanly.
"""

from __future__ import annotations

import contextlib
import dataclasses
import functools
from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn
from flax.core import FrozenDict

from im2im_uq_tpu.models.heads import build_head, head_loss_fn
from im2im_uq_tpu.models.unet import UNet, WNet
from im2im_uq_tpu.ops import sets as set_ops

__all__ = ["UQModel", "UQState", "add_uncertainty", "build_trunk"]


class UQModel(nn.Module):
    """trunk features → head output (forward = head(trunk(x)), add_uncertainty.py:25-27)."""

    trunk: nn.Module
    head: nn.Module

    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        # lane-packed trunks (UNet.lane_pack, ops/lane_pack.py) emit packed
        # (B/2, H, W, 2C) features; the head runs its conv block-diagonal
        # and unpacks its own (tiny-C) output, so callers see normal shapes
        packed = bool(getattr(self.trunk, "packs", lambda _x: False)(x))
        feats = self.trunk(x, train=train)
        if packed:
            return self.head(feats, packed=True)
        return self.head(feats)


@functools.lru_cache(maxsize=32)
def _jitted_forward(model: UQModel):
    """Jitted eval-mode apply, cached per model structure (flax modules hash
    by structure, so UQState.replace/set_lhat reuse the compiled program)."""
    return jax.jit(lambda variables, x: model.apply(variables, x, train=False))


@functools.lru_cache(maxsize=32)
def _jitted_nested_sets(model: UQModel, uncertainty_type: str, mesh=None):
    """Jitted forward + set construction: (variables, x, λ) → (lo, pred, hi).

    ``mesh`` (hashable, part of the cache key) bakes the per-shard Pallas
    resize island into the program for data-parallel serving — the scope
    opens INSIDE the traced fn so it cannot depend on which caller traced
    first (ops/resize.resize_mesh_scope)."""
    from im2im_uq_tpu.ops.resize import resize_mesh_scope

    def fn(variables, x, lam):
        ctx = resize_mesh_scope(mesh) if mesh is not None else contextlib.nullcontext()
        with ctx:
            out = model.apply(variables, x, train=False)
        return set_ops.nested_sets_from_output(out, lam, uncertainty_type)

    return jax.jit(fn)


@dataclasses.dataclass(frozen=True)
class UQState:
    """A UQModel plus its variables, config params, and calibrated λ̂.

    ``lhat is None`` until calibration, mirroring the reference's
    uninitialized lhat buffer (add_uncertainty.py:20); ``nested_sets``
    raises without an explicit λ in that case (add_uncertainty.py:40-44).
    """

    model: UQModel
    variables: FrozenDict | dict
    params: dict
    lhat: Optional[float] = None

    @property
    def uncertainty_type(self) -> str:
        return self.params["uncertainty_type"]

    def apply(self, x: jax.Array, train: bool = False, mutable: Any = False):
        if not train and mutable is False:
            return _jitted_forward(self.model)(self.variables, x)
        return self.model.apply(self.variables, x, train=train, mutable=mutable)

    def forward(self, x: jax.Array) -> jax.Array:
        return self.apply(x, train=False)

    def loss_fn(self, pred: jax.Array, target: jax.Array) -> jax.Array:
        return head_loss_fn(self.uncertainty_type)(pred, target, self.params)

    def interval_params(self, output: jax.Array) -> set_ops.IntervalParams:
        return set_ops.interval_params(output, self.uncertainty_type)

    def _resolve_lam(self, lam):
        if lam is None:
            if self.lhat is None:
                raise ValueError(
                    "You have to specify lambda unless your model is already calibrated."
                )
            lam = self.lhat
        return lam

    def nested_sets_from_output(self, output: jax.Array, lam=None):
        return set_ops.nested_sets_from_output(
            output, self._resolve_lam(lam), self.uncertainty_type
        )

    def nested_sets(self, x: jax.Array, lam=None, mesh=None):
        lam = self._resolve_lam(lam)
        return _jitted_nested_sets(self.model, self.uncertainty_type, mesh)(
            self.variables, x, jnp.float32(lam)
        )

    def set_lhat(self, lhat: float) -> "UQState":
        return dataclasses.replace(self, lhat=float(lhat))

    def replace(self, **kw) -> "UQState":
        return dataclasses.replace(self, **kw)


def resolve_dtype(params: dict, dtype: Any = None) -> Any:
    """Compute dtype from config: ``compute_dtype`` ∈ {float32, bfloat16}.

    bfloat16 runs the convs on the MXU's native precision (params and
    BatchNorm statistics stay float32); float32 (default) matches the
    reference numerics.
    """
    if dtype is not None:
        return dtype
    name = params.get("compute_dtype")
    if name in (None, "float32", "f32"):
        return None
    if name in ("bfloat16", "bf16"):
        return jnp.bfloat16
    raise ValueError(f"unknown compute_dtype {name!r}")


def resolve_conv_backend(params: dict) -> str:
    """``conv_backend`` ∈ {auto, xla, pallas} → concrete backend.

    'auto' (default) picks the Pallas 3×3 kernels (ops/pallas_conv.py) on
    real TPU hardware — they beat XLA's conv at every aligned UNet level —
    and XLA elsewhere (off-TPU the Pallas path would run interpreted).
    """
    backend = params.get("conv_backend", "auto")
    if backend == "auto":
        # measured (v5e, bf16 batch 32 @320^2, device-busy, full backend
        # matrix — benchmarks/bench_backend_matrix.py): with lane packing,
        # xla 126.0 ms < pallas 146.3 < pallas_fused 172.6. The standalone
        # Pallas conv beats XLA's *bare* conv, but in the real step XLA
        # fuses the BN/ReLU epilogue into its conv custom-call (its fused
        # conv ~2.5 ms vs our _conv3x3_fused_raw 3.1 ms at level 2) and
        # the custom-VJP boundary adds pad/convert glue XLA can't fuse
        # across (bwd-other 43 vs 14 ms). 'auto' therefore stays on XLA;
        # set 'pallas'/'pallas_fused' to opt in (parity-tested).
        return "xla"
    if backend not in ("xla", "pallas", "pallas_fused"):
        raise ValueError(f"unknown conv_backend {backend!r}")
    return backend


def resolve_lane_pack(params: dict) -> bool:
    """``lane_pack`` ∈ {auto, True, False} → concrete flag.

    'auto' (default) enables batch-to-lane packing of the UNet's level-0
    region on a single real TPU device — measured 160 → ~125 ms bf16
    train step (benchmarks/bench_batch_pack.py; the C=64 region stops
    paying the 128-lane tax). Off elsewhere: on CPU it is pure overhead,
    and under a multi-device mesh the pack reshape would reshard the
    batch axis. Forcing ``true`` works on any backend (pure XLA ops).
    """
    v = params.get("lane_pack", "auto")
    if v == "auto":
        try:
            return jax.device_count() == 1 and jax.default_backend() in (
                "tpu",
                "axon",
            )
        except Exception:
            return False
    return bool(v)


def resolve_bn_backend(params: dict) -> str:
    """``bn_backend`` ∈ {auto, flax, dot, barrier} → concrete backend.

    'auto' resolves to 'flax' (TorchBatchNorm / PackedBN) — MEASURED, not
    assumed (v5e bf16 batch 32 @320², device-busy, round 4,
    benchmarks/bench_backend_matrix.py): flax 126.0 ms < barrier 164.4 <
    dot 171.5. The dot/barrier variants were built to un-serialize the BN
    reduce epilogues XLA fuses into the elementwise passes (those run at
    ~50% of standalone-achievable HBM BW), but the bucket breakdown shows
    they make the BN buckets WORSE (fwd 38.0 vs 29.3 ms, bwd 33.1 vs
    26.6): separating the reductions forces a second full-tensor read per
    BN site, and one fused pass at 50% efficiency beats two passes at
    full efficiency. Kept as parity-tested, checkpoint-compatible opt-ins;
    the 126 ms step is the measured-achievable ceiling (STATUS.md).
    """
    backend = params.get("bn_backend", "auto")
    if backend == "auto":
        return "flax"
    if backend not in ("flax", "dot", "barrier"):
        raise ValueError(f"unknown bn_backend {backend!r}")
    return backend


def resolve_remat(params: dict):
    """``remat`` ∈ {False, True, 'full', 'conv', 'bn'} → UNet remat mode.

    Config files may carry booleans or 0/1 (the pre-round-3 flag was a
    bool); coerce True-like values to the 'full' policy here so a
    ``remat: 1`` config fails at the config layer, not at trace time
    inside the UNet."""
    v = params.get("remat", False)
    if v in (False, 0, None):
        return False
    if v is True or v == 1:
        return "full"
    if v in ("full", "conv", "bn"):
        return v
    raise ValueError(
        f"unknown remat mode {v!r} (expected false, true, 'full', 'conv', "
        "or 'bn')"
    )


def build_trunk(params: dict, dtype: Any = None) -> nn.Module:
    """Trunk factory for the router's model dispatch (reference router.py:80-84)."""
    dtype = resolve_dtype(params, dtype)
    cb = resolve_conv_backend(params)
    bb = resolve_bn_backend(params)
    if cb == "pallas_fused" and bb != "flax":
        # the _fused/_packed_fused DoubleConv paths hardwire FusedBN/PackedBN
        # (BN is fused INTO the Pallas conv kernels) — a non-flax bn_backend
        # would be silently ignored there
        raise ValueError(
            f"bn_backend={bb!r} is incompatible with conv_backend="
            "'pallas_fused' (its kernels fuse their own BN); use "
            "conv_backend xla/pallas or bn_backend flax/auto"
        )
    name = params.get("model", "UNet")
    rb = params.get("resize_backend", "auto")
    if name == "UNet":
        return UNet(n_channels_out=1, dtype=dtype, remat=resolve_remat(params),
                    conv_backend=cb, lane_pack=resolve_lane_pack(params),
                    pool_backend=params.get("pool_backend", "xla"),
                    resize_backend=rb, bn_backend=bb)
    if name == "WNet":
        return WNet(n_channels_out=1, dtype=dtype, conv_backend=cb, resize_backend=rb,
                    bn_backend=bb)
    if name == "ResNet18":
        from im2im_uq_tpu.models.resnet import ResNet18

        return ResNet18(n_channels_out=1, dtype=dtype)
    raise NotImplementedError(f"unknown trunk {name!r}")


def add_uncertainty(
    trunk: nn.Module,
    params: dict,
    *,
    rng: Optional[jax.Array] = None,
    example_input: Optional[jax.Array] = None,
    dtype: Any = None,
) -> UQState:
    """Wrap a trunk with the configured uncertainty head (add_uncertainty.py:51-87).

    When ``rng`` and ``example_input`` are given, the variables (params +
    batch stats) are initialized eagerly; otherwise initialize later with
    ``UQModel.init``.
    """
    head = build_head(
        params["uncertainty_type"],
        getattr(trunk, "n_channels_out", 1),
        params,
        resolve_dtype(params, dtype),
    )
    model = UQModel(trunk=trunk, head=head)
    variables = {}
    if rng is not None and example_input is not None:
        # jit the init: eager per-op dispatch of ~50 conv/BN inits is 10-100x
        # slower than one compiled program (measured 119s -> ~5s on CPU).
        variables = jax.jit(lambda r, x: model.init(r, x, train=False))(
            rng, example_input
        )
    return UQState(model=model, variables=variables, params=dict(params), lhat=None)
