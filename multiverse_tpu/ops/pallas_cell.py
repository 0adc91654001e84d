"""Fused Pallas TPU kernel for the ConvLSTM cell step.

**Benchmarked SLOWER than the XLA path and therefore not wired into
the model** (31.6 vs 28.4 ms/step at beam shapes on v5e): the cell is
compute-bound on the gate conv, and XLA's batched implicit GEMM over
all N·K samples beats per-sample [HW, Cin]×[Cin, 4D] matmuls — the
1.5 GB/step of gate traffic this kernel saves is not the dominant
term.  Kept as the starting point for a future fully-fused decode-step
kernel (GNN + cell + readout in one VMEM pass), with exact-semantics
tests in place; numerics are strictly tighter than the XLA bf16 path
(f32 gates in VMEM vs bf16 gate storage).

Design: per sample, the 3×3 SAME conv is nine shifted
[HW, Cin]×[Cin, 4D] MXU matmuls accumulating into a VMEM gates buffer,
then the (i, g, f, o) gate math, emitting only new h/c.  The kernel
weights ride along as a constant block (same index for every program →
fetched once, kept resident).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from multiverse_tpu.ops.convlstm import ConvLSTMState


def _cell_kernel(xin_ref, c_ref, w_ref, b_ref, h_out_ref, c_out_ref,
                 *, forget_bias: float):
    """xin_ref: [H+2, W+2, Cin] padded concat(x, h); c_ref: [H, W, D];
    w_ref: [9·Cin, 4D] shift-major kernel; b_ref: [1, 4D] f32;
    outputs [H, W, D]."""
    Hp, Wp, Cin = xin_ref.shape
    H, W = Hp - 2, Wp - 2
    D4 = w_ref.shape[-1]
    D = D4 // 4

    gates = jnp.zeros((H * W, D4), jnp.float32)
    idx = 0
    for dy in (0, 1, 2):
        for dx in (0, 1, 2):
            patch = xin_ref[dy:dy + H, dx:dx + W, :].reshape(H * W, Cin)
            gates = gates + jnp.dot(
                patch, w_ref[idx * Cin:(idx + 1) * Cin, :],
                preferred_element_type=jnp.float32)
            idx += 1
    gates = gates + b_ref[:]
    i = gates[:, :D]
    g = gates[:, D:2 * D]
    f = gates[:, 2 * D:3 * D]
    o = gates[:, 3 * D:]
    c_old = c_ref[:].astype(jnp.float32).reshape(H * W, D)
    new_c = (jax.nn.sigmoid(f + forget_bias) * c_old
             + jax.nn.sigmoid(i) * jnp.tanh(g))
    new_h = jnp.tanh(new_c) * jax.nn.sigmoid(o)
    h_out_ref[:] = new_h.reshape(H, W, D).astype(h_out_ref.dtype)
    c_out_ref[:] = new_c.reshape(H, W, D).astype(c_out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("forget_bias", "interpret"))
def convlstm_step_pallas(
    params: dict,
    x: jnp.ndarray,                 # [N, H, W, Cx]
    state: ConvLSTMState,           # c/h [N, H, W, D]
    forget_bias: float = 1.0,
    interpret: bool = False,
):
    """Fused cell step; bf16 in/out (the fast path's state dtype).

    Returns (new_h, ConvLSTMState) like ops/convlstm.convlstm_step.
    """
    N, H, W, Cx = x.shape
    D = state.h.shape[-1]
    dtype = jnp.bfloat16
    Cin = Cx + D

    xin = jnp.concatenate(
        [x.astype(dtype), state.h.astype(dtype)], axis=-1)
    xin_p = jnp.pad(xin, ((0, 0), (1, 1), (1, 1), (0, 0))).reshape(
        N * (H + 2), W + 2, Cin)
    c_in = state.c.astype(dtype).reshape(N * H, W, D)

    # [3, 3, Cin, 4D] → shift-major [9·Cin, 4D]
    w = params["kernel"].astype(dtype).reshape(9 * Cin, 4 * D)
    b = params["bias"].astype(jnp.float32).reshape(1, 4 * D)

    new_h, new_c = pl.pallas_call(
        functools.partial(_cell_kernel, forget_bias=forget_bias),
        grid=(N,),
        in_specs=[
            pl.BlockSpec((H + 2, W + 2, Cin), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((H, W, D), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((9 * Cin, 4 * D), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4 * D), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((H, W, D), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((H, W, D), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((N * H, W, D), dtype),
            jax.ShapeDtypeStruct((N * H, W, D), dtype),
        ),
        interpret=interpret,
    )(xin_p, c_in, w, b)
    new_h = new_h.reshape(N, H, W, D)
    new_c = new_c.reshape(N, H, W, D)
    return new_h, ConvLSTMState(c=new_c, h=new_h)
