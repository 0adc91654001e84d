"""Fused Pallas TPU kernel for the 3×3-neighborhood graph attention.

The decode-step GNN is memory-bound, not FLOP-bound: the dense
reference formulation materializes a [N, HW, HW] edge tensor (1.7 GB
per beam-decode step), and even the exact 9-shift jnp reformulation
(ops/gnn.py:gnn_step_neighbors) makes XLA materialize nine shifted
copies of the feature map.  This kernel does the whole step —
l2-normalize, 9 neighbor cosine similarities, border-masked softmax,
weighted neighbor aggregation — in one pass over VMEM-resident blocks:
each input byte is read once from HBM and the only write is the
aggregated output.

Numerics match gnn_step / gnn_step_neighbors (asserted in tests, CPU
interpret mode): similarities and softmax accumulate in f32; the
values dtype (bf16 on the fast path) is preserved for the products.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _gnn_kernel(hidden_ref, scene_ref, out_ref, *, with_scene: bool):
    h = hidden_ref[:]                     # [B, H, W, D]
    B, H, W, D = h.shape
    if with_scene:
        node = jnp.concatenate([h, scene_ref[:]], axis=-1)
    else:
        node = h
    # l2-normalize in f32 (tf.nn.l2_normalize semantics)
    node_f = node.astype(jnp.float32)
    sumsq = jnp.sum(node_f * node_f, axis=-1, keepdims=True)
    node_f = node_f * jax.lax.rsqrt(jnp.maximum(sumsq, 1e-12))

    node_p = jnp.pad(node_f, ((0, 0), (1, 1), (1, 1), (0, 0)))
    states_p = jnp.pad(
        h.astype(jnp.float32), ((0, 0), (1, 1), (1, 1), (0, 0)))

    yy = jax.lax.broadcasted_iota(jnp.int32, (B, H, W), 1)
    xx = jax.lax.broadcasted_iota(jnp.int32, (B, H, W), 2)

    sims = []
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            nb = jax.lax.dynamic_slice(
                node_p, (0, 1 + dy, 1 + dx, 0), node_f.shape)
            sim = jnp.sum(node_f * nb, axis=-1)      # [B, H, W]
            valid = ((yy + dy >= 0) & (yy + dy < H)
                     & (xx + dx >= 0) & (xx + dx < W))
            sims.append(jnp.where(valid, sim, -1e30))

    stacked = jnp.stack(sims, axis=-1)               # [B, H, W, 9]
    m = jnp.max(stacked, axis=-1, keepdims=True)
    e = jnp.exp(stacked - m)
    denom = jnp.sum(e, axis=-1, keepdims=True)
    attn = e / denom                                  # [B, H, W, 9]

    acc = jnp.zeros((B, H, W, D), jnp.float32)
    idx = 0
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            nb = jax.lax.dynamic_slice(
                states_p, (0, 1 + dy, 1 + dx, 0), (B, H, W, D))
            acc = acc + attn[..., idx:idx + 1] * nb
            idx += 1
    out_ref[:] = acc.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_n", "interpret"))
def gnn_step_pallas(
    hidden: jnp.ndarray,                  # [N, H, W, D]
    scene_feat: Optional[jnp.ndarray] = None,   # [N, H, W, C]
    block_n: int = 8,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused neighborhood attention; returns [N, H, W, D] f32.

    N must be divisible by block_n (callers pad or pick a divisor —
    beam decode uses N·K which is a multiple of typical blocks).
    """
    N, H, W, D = hidden.shape
    if N % block_n != 0:
        # fall back to a compatible divisor
        block_n = int(np.gcd(N, block_n))
    grid = (N // block_n,)
    with_scene = scene_feat is not None

    in_specs = [pl.BlockSpec(
        (block_n, H, W, D), lambda i: (i, 0, 0, 0),
        memory_space=pltpu.ANY if interpret else pltpu.VMEM)]
    inputs = [hidden]
    if with_scene:
        C = scene_feat.shape[-1]
        in_specs.append(pl.BlockSpec(
            (block_n, H, W, C), lambda i: (i, 0, 0, 0),
            memory_space=pltpu.ANY if interpret else pltpu.VMEM))
        inputs.append(scene_feat)
    else:
        # pallas needs a concrete operand; pass a dummy scalar block
        in_specs.append(pl.BlockSpec(
            (1, 1, 1, 1), lambda i: (0, 0, 0, 0),
            memory_space=pltpu.ANY if interpret else pltpu.VMEM))
        inputs.append(jnp.zeros((1, 1, 1, 1), hidden.dtype))

    return pl.pallas_call(
        functools.partial(_gnn_kernel, with_scene=with_scene),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (block_n, H, W, D), lambda i: (i, 0, 0, 0),
            memory_space=pltpu.ANY if interpret else pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, H, W, D), jnp.float32),
        interpret=interpret,
    )(*inputs)
