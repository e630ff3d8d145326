"""Spatial (height-axis) sharding for very large tiles.

The reference handles giant TEMCA EM images by tiling them into patches on
the host (TEMCADataset.py:47-75). The TPU-native complement for inference
on tiles too large for one chip's HBM: shard the activations' height axis
across the mesh and let GSPMD insert the conv halo exchanges automatically
(SURVEY.md §5 "long-context" analogue — there is no sequence axis in a conv
UNet; the spatial axes play that role).

This is exact — XLA's spmd partitioner exchanges the 1-pixel halos each
3×3 conv needs and handles pool/upsample boundaries — so a sharded forward
equals the single-device forward bit-for-bit (tested on the 8-device CPU
mesh).
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from im2im_uq_tpu.models.assembly import UQState
from im2im_uq_tpu.parallel.mesh import DATA_AXIS

__all__ = ["spatial_sharded_forward", "spatial_nested_sets"]


def _height_sharding(mesh: Mesh) -> NamedSharding:
    # (B, H, W, C): shard H over the mesh axis
    return NamedSharding(mesh, P(None, DATA_AXIS))


def spatial_sharded_forward(uq_state: UQState, mesh: Mesh):
    """Jitted forward with activations sharded along H across the mesh.

    Use for single large tiles (batch 1, H ≫ HBM) where batch-sharding has
    nothing to split; XLA emits halo exchanges (collective-permutes) over
    ICI for every conv/pool/resize window that crosses a shard boundary.
    """
    model = uq_state.model
    repl = NamedSharding(mesh, P())

    def forward(variables, x):
        return model.apply(variables, x, train=False)

    # input is (B, H, W, C); the head output is (B, K, H, W, C) — H sits at
    # axis 2 there, so the output spec shards the third dimension.
    out_sharding = NamedSharding(mesh, P(None, None, DATA_AXIS))
    return jax.jit(
        forward,
        in_shardings=(repl, _height_sharding(mesh)),
        out_shardings=out_sharding,
    )


def spatial_nested_sets(uq_state: UQState, mesh: Mesh, lam=None):
    """(lower, pred, upper) for a giant tile, computed height-sharded."""
    from im2im_uq_tpu.ops import sets as set_ops

    model = uq_state.model
    utype = uq_state.uncertainty_type
    if lam is None:
        if uq_state.lhat is None:
            raise ValueError("calibrate first or pass an explicit lam")
        lam = uq_state.lhat
    repl = NamedSharding(mesh, P())
    shard = _height_sharding(mesh)

    def sets(variables, x, lam):
        out = model.apply(variables, x, train=False)
        return set_ops.nested_sets_from_output(out, lam, utype)

    fn = jax.jit(
        sets,
        in_shardings=(repl, shard, repl),
        out_shardings=(shard, shard, shard),
    )
    return lambda x: fn(uq_state.variables, x, jax.numpy.float32(lam))
