"""Isolate which Pallas kernel fails remote compile at a given shape.

Compiles each fused-path kernel (fwd, wgrad, dgrad, plain) standalone at
the packed level-1 geometry and reports per-kernel PASS/FAIL. Usage:
  PYTHONPATH=... python benchmarks/isolate_compile.py [B H W C [COUT]]
"""
import sys

import jax
import jax.numpy as jnp
import numpy as np

from im2im_uq_tpu.ops import pallas_conv as pc
from im2im_uq_tpu.ops import pallas_conv_bwd as pcb

B, H, W, C = (int(a) for a in (sys.argv[1:5] or (16, 320, 320, 128)))
COUT = int(sys.argv[5]) if len(sys.argv) > 5 else C
dt = jnp.bfloat16

rng = np.random.RandomState(0)
x = jnp.asarray(rng.randn(B, H, W, C), dt)
k = jnp.asarray(rng.randn(3, 3, C, COUT), dt)
bias = jnp.zeros((COUT,), dt)
scale = jnp.ones((C,), jnp.float32)
shift = jnp.zeros((C,), jnp.float32)
wp = -(-(W + 2) // 8) * 8
frame = ((0, 0), (1, 1), (1, wp - W - 1), (0, 0))
xq = jnp.pad(x, frame)
g = jnp.asarray(rng.randn(B, H, W, COUT), dt)
gq = jnp.pad(g, frame)
ps = jnp.zeros((2, C), jnp.float32)


def check(name, fn, *args, **kw):
    try:
        out = jax.jit(lambda *a: fn(*a, **kw))(*args)
        jax.block_until_ready(out)
        print(f"{name:30s} PASS")
    except Exception as e:
        msg = str(e).replace("\n", " ")[:300]
        print(f"{name:30s} FAIL {type(e).__name__}: {msg}")


check("fwd stats=T prologue=F", pc._conv3x3_fused_raw, x, k, bias, ps, False, True)
check("fwd stats=T prologue=T", pc._conv3x3_fused_raw, x, k, bias, ps, True, True)
check("plain fwd", pc.conv3x3_pallas_raw, x, k, bias)
check(
    "wgrad prologue=T", pcb.wgrad3x3_pallas_raw, xq, gq,
    jnp.ones((C,), jnp.float32), jnp.zeros((C,), jnp.float32),
    w=W, prologue=True, out_dtype=jnp.float32,
)
check(
    "wgrad prologue=F", pcb.wgrad3x3_pallas_raw, xq, gq,
    jnp.ones((C,), jnp.float32), jnp.zeros((C,), jnp.float32),
    w=W, prologue=False, out_dtype=jnp.float32,
)
check(
    "dgrad prologue=T", pcb.dgrad3x3_pallas_raw, gq, x, k,
    jnp.ones((C,), jnp.float32), jnp.zeros((C,), jnp.float32), prologue=True,
)
check(
    "dgrad prologue=F", pcb.dgrad3x3_pallas_raw, gq, x, k,
    jnp.ones((C,), jnp.float32), jnp.zeros((C,), jnp.float32), prologue=False,
)
