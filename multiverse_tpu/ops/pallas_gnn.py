"""Fused Pallas TPU kernel for the 3×3-neighborhood graph attention.

The decode-step GNN is memory-bound, not FLOP-bound: the dense
reference formulation materializes a [N, HW, HW] edge tensor (1.7 GB
per beam-decode step), and even the exact 9-shift jnp reformulation
(ops/gnn.py:gnn_step_neighbors) makes XLA materialize nine shifted
copies of the feature map.  This kernel computes the nine neighbor
similarities, border-masked softmax, and weighted aggregation in one
pass over VMEM-resident batch blocks — each input byte is read from
HBM once and the only write is the aggregated output.

Kernel-side code is deliberately Mosaic-friendly: inputs arrive
l2-normalized and spatially pre-padded (one cheap fused XLA pass), all
slices are static, and the border mask is a tiny constant input.
Numerics match gnn_step / gnn_step_neighbors (asserted in tests via
interpret mode): similarities and softmax accumulate in f32.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _gnn_kernel(node_ref, states_ref, mask_ref, out_ref):
    """One sample per grid program — 3D blocks keep the Mosaic IR
    simple.  node_ref: [H+2, W+2, Dn] normalized+padded features;
    states_ref: [H+2, W+2, Ds] padded values; mask_ref: [9·H, W]
    row-stacked 1/0 validity; out: [H, W, Ds] f32.

    Streaming softmax: cosine similarities are bounded in [-1, 1], so
    exp needs no max-shift; out-of-frame neighbors multiply to weight
    exactly 0 — identical to the reference's −1e30 additive mask.  One
    neighbor is live at a time."""
    Hp, Wp, Dn = node_ref.shape
    H, W = Hp - 2, Wp - 2
    Ds = states_ref.shape[-1]

    center = node_ref[1:1 + H, 1:1 + W, :].astype(jnp.float32)
    num = jnp.zeros((H, W, Ds), jnp.float32)
    den = jnp.zeros((H, W, 1), jnp.float32)
    idx = 0
    for dy in (0, 1, 2):
        for dx in (0, 1, 2):
            nb = node_ref[dy:dy + H, dx:dx + W, :].astype(jnp.float32)
            sim = jnp.sum(center * nb, axis=-1, keepdims=True)
            w = jnp.exp(sim) * mask_ref[
                idx * H:(idx + 1) * H, :][:, :, None]
            num = num + w * states_ref[
                dy:dy + H, dx:dx + W, :].astype(jnp.float32)
            den = den + w
            idx += 1
    out_ref[:] = num / den


@functools.partial(
    jax.jit, static_argnames=("block_n", "interpret"))
def gnn_step_pallas(
    hidden: jnp.ndarray,                        # [N, H, W, D]
    scene_feat: Optional[jnp.ndarray] = None,   # [N, H, W, C]
    block_n: int = 4,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused neighborhood attention; returns [N, H, W, D] f32."""
    N, H, W, D = hidden.shape
    if N % block_n != 0:
        block_n = int(np.gcd(N, block_n))

    node = hidden
    if scene_feat is not None:
        node = jnp.concatenate([hidden, scene_feat], axis=-1)
    node = node.astype(jnp.float32)
    sumsq = jnp.sum(node * node, axis=-1, keepdims=True)
    node = node * jax.lax.rsqrt(jnp.maximum(sumsq, 1e-12))
    node = node.astype(hidden.dtype)

    pad = ((0, 0), (1, 1), (1, 1), (0, 0))
    node_p = jnp.pad(node, pad)
    states_p = jnp.pad(hidden, pad)

    masks = np.zeros((9, H, W), np.float32)
    idx = 0
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            masks[idx,
                  max(0, -dy):H - max(0, dy),
                  max(0, -dx):W - max(0, dx)] = 1.0
            idx += 1
    masks = jnp.asarray(masks.reshape(9 * H, W))

    # fold block_n into the spatial axis: one (sample-sub-block) per
    # program with 3D refs — Mosaic handles these far better than 4D
    Dn = node_p.shape[-1]
    node_p = node_p.reshape(N * (H + 2), W + 2, Dn)
    states_p = states_p.reshape(N * (H + 2), W + 2, D)
    grid = (N,)
    out = pl.pallas_call(
        _gnn_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((H + 2, W + 2, Dn), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((H + 2, W + 2, D), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((9 * H, W), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((H, W, D), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N * H, W, D), jnp.float32),
        interpret=interpret,
    )(node_p, states_p, masks)
    return out.reshape(N, H, W, D)
