"""ConvLSTM cell with tf.contrib.rnn.ConvLSTMCell gate semantics.

The reference's recurrent core is ``tf.contrib.rnn.ConvLSTMCell``
(reference: code/pred_models.py:189-249). Its cell math (from the TF 1.15
contrib source, contrib/rnn/python/ops/rnn_cell.py ConvLSTMCell.call):

    conv_in = conv2d(concat([x, h], -1), kernel)   # one fused conv
    i, g, f, o = split(conv_in + bias, 4, axis=-1) # gate order: i, g, f, o
    c' = sigmoid(f + forget_bias) * c + sigmoid(i) * tanh(g)
    h' = tanh(c') * sigmoid(o)

with forget_bias = 1.0, bias initialised to zeros, kernel to
glorot_uniform (TF1 get_variable default).

TPU design: the fused conv over concat([x, h]) is a single large NHWC
conv — with hidden 256 channels it maps straight onto the MXU. Time
iteration is driven by ``lax.scan`` (see :func:`convlstm_scan`) instead
of TF's dynamic_rnn.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from multiverse_tpu.ops.layers import Params


def input_dropout(
    key: jax.Array, x: jnp.ndarray, keep_prob: float
) -> jnp.ndarray:
    """Inverted dropout on a cell input (tf.nn.dropout semantics).

    The reference wraps all four ConvLSTM cells in
    ``tf.nn.rnn_cell.DropoutWrapper(cell, keep_prob)`` — the second
    positional argument is ``input_keep_prob``, so this is dropout on
    the CELL INPUT, with a fresh full-shape mask every timestep (the
    wrapper is non-variational) and 1/keep_prob inverted scaling
    (reference: code/pred_models.py:130-131 train-only cond, applied at
    :195,:202,:242,:249; SimAug/code/pred_models.py:555-664).
    """
    mask = jax.random.bernoulli(key, p=keep_prob, shape=x.shape)
    scale = jnp.asarray(1.0 / keep_prob, x.dtype)
    return jnp.where(mask, x * scale, jnp.zeros((), x.dtype))


class ConvLSTMState(NamedTuple):
    c: jnp.ndarray  # [N, H, W, D] cell memory
    h: jnp.ndarray  # [N, H, W, D] hidden


def convlstm_init(
    key: jax.Array, in_ch: int, hidden_ch: int, kernel: int = 3
) -> Params:
    """Kernel [k, k, in+hidden, 4*hidden] (glorot_uniform) + zero bias."""
    init = jax.nn.initializers.glorot_uniform()
    return {
        "kernel": init(key, (kernel, kernel, in_ch + hidden_ch, 4 * hidden_ch)),
        "bias": jnp.zeros((4 * hidden_ch,), dtype=jnp.float32),
    }


def convlstm_step(
    params: Params,
    x: jnp.ndarray,
    state: ConvLSTMState,
    forget_bias: float = 1.0,
    compute_dtype: Optional[jnp.dtype] = None,
) -> Tuple[jnp.ndarray, ConvLSTMState]:
    """One cell step. x: [N, H, W, Cin]; state c/h: [N, H, W, D]."""
    c, h = state
    xin = jnp.concatenate([x, h], axis=-1)
    kernel = params["kernel"]
    precision = jax.lax.Precision.HIGHEST
    if compute_dtype is not None:
        xin = xin.astype(compute_dtype)
        kernel = kernel.astype(compute_dtype)
        precision = jax.lax.Precision.DEFAULT
    gates = jax.lax.conv_general_dilated(
        xin,
        kernel,
        window_strides=(1, 1),
        padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        # reduced-precision path: accumulate f32 inside the MXU but
        # store the 4·D gate map in the compute dtype — it is the
        # single largest per-step HBM tensor (3 GB/step at beam shapes)
        preferred_element_type=compute_dtype or jnp.float32,
        precision=precision,
    )
    gates = gates + params["bias"].astype(gates.dtype)
    i, g, f, o = jnp.split(gates, 4, axis=-1)
    new_c = jax.nn.sigmoid(f + forget_bias) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
    new_h = jnp.tanh(new_c) * jax.nn.sigmoid(o)
    if compute_dtype is not None:
        # on the reduced-precision path the recurrent state is carried
        # in the compute dtype too — halves the HBM traffic of the
        # state carry and the beam-search state gathers (the f32 path
        # remains the reference-parity path)
        new_c = new_c.astype(compute_dtype)
        new_h = new_h.astype(compute_dtype)
    return new_h, ConvLSTMState(c=new_c, h=new_h)


def convlstm_scan(
    params: Params,
    xs: jnp.ndarray,
    init_state: Optional[ConvLSTMState] = None,
    seq_lengths: Optional[jnp.ndarray] = None,
    forget_bias: float = 1.0,
    compute_dtype: Optional[jnp.dtype] = None,
    remat: bool = False,
    keep_prob: float = 1.0,
    dropout_rng: Optional[jax.Array] = None,
) -> Tuple[jnp.ndarray, ConvLSTMState]:
    """Run the cell over time with ``lax.scan``.

    Equivalent of tf.nn.dynamic_rnn with sequence_length semantics
    (reference: code/pred_models.py:212-234): past an example's length
    the emitted output is zero and the state is frozen.

    Args:
        xs: [N, T, H, W, Cin] time-major inside the scan.
        seq_lengths: optional [N] int; None = full length for all.
        remat: checkpoint each step — the backward recomputes the gate
            conv instead of keeping [T, N, H, W, 4D] residuals in HBM
            (cfg.remat; enables large-batch training).
        keep_prob / dropout_rng: train-time input dropout on the cell
            input, fresh mask per timestep (see :func:`input_dropout`);
            active only when keep_prob < 1 AND an rng is given.
    Returns:
        (outputs [N, T, H, W, D], final ConvLSTMState)
    """
    dropout = keep_prob < 1.0 and dropout_rng is not None
    N, T = xs.shape[0], xs.shape[1]
    H, W = xs.shape[2], xs.shape[3]
    D = params["kernel"].shape[-1] // 4
    state_dtype = compute_dtype or jnp.float32
    if init_state is None:
        zeros = jnp.zeros((N, H, W, D), dtype=state_dtype)
        init_state = ConvLSTMState(c=zeros, h=zeros)
    else:
        init_state = ConvLSTMState(
            c=init_state.c.astype(state_dtype),
            h=init_state.h.astype(state_dtype))

    xs_t = jnp.moveaxis(xs, 1, 0)  # [T, N, H, W, Cin]

    def body(carry, inp):
        state, t = carry
        x_t = inp
        if dropout:
            x_t = input_dropout(
                jax.random.fold_in(dropout_rng, t), x_t, keep_prob)
        out, new_state = convlstm_step(
            params, x_t, state, forget_bias, compute_dtype
        )
        if seq_lengths is not None:
            active = (t < seq_lengths)[:, None, None, None]
            out = jnp.where(active, out, 0.0)
            new_state = ConvLSTMState(
                c=jnp.where(active, new_state.c, state.c),
                h=jnp.where(active, new_state.h, state.h),
            )
        return (new_state, t + 1), out

    if remat:
        body = jax.checkpoint(body)
    (final_state, _), outs = jax.lax.scan(
        body, (init_state, jnp.asarray(0, jnp.int32)), xs_t
    )
    return jnp.moveaxis(outs, 0, 1), final_state
