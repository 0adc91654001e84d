"""Fused Pallas TPU kernel for the grid graph attention.

The reference GNN is one dense masked softmax attention over grid
cells (reference: code/pred_models.py:808-909).  At beam-decode shapes
the XLA version materializes a [N·K, HW, HW] edge tensor in HBM
(1.7 GB per decode step) and even the exact 9-shift reformulation
(ops/gnn.py) leaves XLA shuffling nine shifted feature-map copies.

This kernel runs the *dense* attention per sample entirely in VMEM:
the [HW, HW] edge matrix (1.3 MB at 18×32) never touches HBM, both
matmuls ride the MXU (the 9-shift form is a VPU cross-lane-reduce
bound dead end), and each input byte is read once.  The math is the
reference's exactly — cosine-similarity matmul, additive −1e30
neighborhood mask, row softmax, aggregation matmul — asserted against
gnn_step in tests (interpret mode) and on device.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from multiverse_tpu.ops.gnn import gnn_neighbor_mask


def _gnn_kernel(node_ref, states_ref, mask_ref, out_ref):
    """One sample per program.  node_ref: [HW, Dn] l2-normalized node
    features; states_ref: [HW, Ds]; mask_ref: [HW, HW] additive mask
    (0 for neighbors, −1e30 outside); out: [HW, Ds] f32."""
    node = node_ref[:]
    edges = jnp.dot(node, node.T,
                    preferred_element_type=jnp.float32)    # MXU
    edges = edges + mask_ref[:]
    m = jnp.max(edges, axis=-1, keepdims=True)
    e = jnp.exp(edges - m)
    attn = e / jnp.sum(e, axis=-1, keepdims=True)
    out_ref[:] = jnp.dot(attn.astype(states_ref.dtype), states_ref[:],
                         preferred_element_type=jnp.float32)


def _gnn_bwd_kernel(node_ref, states_ref, mask_ref, g_ref,
                    dnode_ref, dstates_ref):
    """Backward of `_gnn_kernel`, one sample per program, everything
    VMEM-resident.  Recomputes attn (cheaper than storing [HW, HW] per
    sample to HBM), then four MXU matmuls:

        dstates = attnᵀ g
        dattn   = g statesᵀ
        dedges  = attn ⊙ (dattn − rowsum(dattn ⊙ attn))   (softmax VJP)
        dnode   = (dedges + dedgesᵀ) node        (edges = node nodeᵀ)

    The additive mask is constant — no gradient.
    """
    node = node_ref[:]
    states = states_ref[:]
    g = g_ref[:]

    edges = jnp.dot(node, node.T, preferred_element_type=jnp.float32)
    edges = edges + mask_ref[:]
    m = jnp.max(edges, axis=-1, keepdims=True)
    e = jnp.exp(edges - m)
    attn = e / jnp.sum(e, axis=-1, keepdims=True)          # f32 [HW,HW]

    attn_c = attn.astype(states.dtype)
    dstates_ref[:] = jnp.dot(attn_c.T, g.astype(states.dtype),
                             preferred_element_type=jnp.float32)
    dattn = jnp.dot(g.astype(states.dtype), states.T,
                    preferred_element_type=jnp.float32)    # [HW, HW]
    dedges = attn * (dattn - jnp.sum(dattn * attn, axis=-1,
                                     keepdims=True))
    sym = (dedges + dedges.T).astype(node.dtype)
    dnode_ref[:] = jnp.dot(sym, node,
                           preferred_element_type=jnp.float32)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _gnn_dense(node, states, mask, interpret=False):
    """Dense masked attention on pre-normalized node features:
    softmax(node·nodeᵀ + mask) @ states.  node: [N·HW, Dn] (rows are
    HW-blocks per sample), states: [N·HW, Ds], mask: [HW, HW] additive.
    Differentiable w.r.t. node and states via the fused backward
    kernel; the l2-normalize/concat around it is plain jnp handled by
    JAX AD."""
    return _gnn_dense_fwd(node, states, mask, interpret)[0]


def _pallas_specs(HW, Dn, Ds):
    return dict(
        in_specs=[
            pl.BlockSpec((HW, Dn), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((HW, Ds), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((HW, HW), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
    )


def _gnn_dense_fwd(node, states, mask, interpret):
    NHW, Dn = node.shape
    Ds = states.shape[-1]
    HW = mask.shape[0]
    N = NHW // HW
    out = pl.pallas_call(
        _gnn_kernel,
        grid=(N,),
        out_specs=pl.BlockSpec((HW, Ds), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((NHW, Ds), jnp.float32),
        interpret=interpret,
        **_pallas_specs(HW, Dn, Ds),
    )(node, states, mask)
    return out, (node, states, mask)


def _gnn_dense_bwd(interpret, res, g):
    node, states, mask = res
    NHW, Dn = node.shape
    Ds = states.shape[-1]
    HW = mask.shape[0]
    N = NHW // HW
    specs = _pallas_specs(HW, Dn, Ds)
    specs["in_specs"].append(
        pl.BlockSpec((HW, Ds), lambda i: (i, 0),
                     memory_space=pltpu.VMEM))
    dnode, dstates = pl.pallas_call(
        _gnn_bwd_kernel,
        grid=(N,),
        out_specs=[
            pl.BlockSpec((HW, Dn), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((HW, Ds), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((NHW, Dn), jnp.float32),
            jax.ShapeDtypeStruct((NHW, Ds), jnp.float32),
        ],
        interpret=interpret,
        **specs,
    )(node, states, mask, g.astype(jnp.float32))
    return (dnode.astype(node.dtype), dstates.astype(states.dtype),
            None)


_gnn_dense.defvjp(_gnn_dense_fwd, _gnn_dense_bwd)


@functools.partial(
    jax.jit, static_argnames=("block_n", "interpret"))
def gnn_step_pallas(
    hidden: jnp.ndarray,                        # [N, H, W, D]
    scene_feat: Optional[jnp.ndarray] = None,   # [N, H, W, C]
    block_n: int = 1,                           # kept for API compat
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused dense neighborhood attention; returns [N, H, W, D] f32.

    Differentiable: the attention core carries a custom VJP whose
    backward is itself a fused VMEM-resident kernel, so training and
    SimAug input-gradient attacks use the same fast path as inference
    (grad equality vs the jnp 9-neighbor path is tested)."""
    del block_n
    N, H, W, D = hidden.shape
    HW = H * W

    node = hidden
    if scene_feat is not None:
        node = jnp.concatenate([hidden, scene_feat], axis=-1)
    node = node.astype(jnp.float32)
    sumsq = jnp.sum(node * node, axis=-1, keepdims=True)
    node = node * jax.lax.rsqrt(jnp.maximum(sumsq, 1e-12))
    node = node.astype(hidden.dtype)

    Dn = node.shape[-1]
    node = node.reshape(N * HW, Dn)
    states = hidden.reshape(N * HW, D)
    mask = jnp.asarray(
        (1.0 - gnn_neighbor_mask(H, W)) * -1e30, jnp.float32)

    out = _gnn_dense(node, states, mask, interpret)
    return out.reshape(N, H, W, D)
