"""Paired-scan fusion: run two independent ConvLSTM recurrences as ONE
`lax.scan` so every sequential step carries twice the MXU work.

Motivation (SEGMENTS_r04.json): the model's four recurrent stages run
at 38-62% of the matmul roofline because each scan step issues a single
gate conv whose matmul is too narrow to fill the MXU, and the carried
h/c dependency stops XLA from overlapping steps.  The class and
regression encoders are independent given their inputs (the reference
runs them as two separate dynamic_rnn calls over the same T_obs,
reference: code/pred_models.py:189-234), and the two decoders are
independent given their own feedback streams (two raw_rnn loops,
reference: code/pred_models.py:236-249,311-471) — so each pair can
legally share one scan.

Two fusion modes:

* ``two_convs`` — one scan body stepping both cells (identical math to
  the separate scans; the win is scheduling: per sequential step XLA
  sees two independent gate convs it can overlap/pipeline).
* ``blockdiag`` — ONE gate conv per step over the concatenated
  [x_a, h_a, x_b, h_b] input with a block-diagonal
  [k, k, C_a+D+C_b+D, 8D] kernel.  The matmul is twice as wide on both
  axes; the off-diagonal zero blocks are wasted FLOPs, which pays off
  exactly when the conv is launch/output-bound rather than
  contraction-bound (bench_pairscan.py measures which).

Both modes are probed on-chip by bench_pairscan.py before any wiring
into the model forward.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from multiverse_tpu.ops.convlstm import (
    ConvLSTMState,
    convlstm_step,
    input_dropout,
)
from multiverse_tpu.ops.layers import Params, conv2d


def _gate_conv(xin: jnp.ndarray, kernel: jnp.ndarray,
               compute_dtype) -> jnp.ndarray:
    """The ConvLSTM gate conv with the cell's precision conventions
    (see ops/convlstm.py convlstm_step)."""
    precision = jax.lax.Precision.HIGHEST
    if compute_dtype is not None:
        xin = xin.astype(compute_dtype)
        kernel = kernel.astype(compute_dtype)
        precision = jax.lax.Precision.DEFAULT
    return jax.lax.conv_general_dilated(
        xin, kernel, window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=compute_dtype or jnp.float32,
        precision=precision,
    )


def _gate_math(gates: jnp.ndarray, c: jnp.ndarray, forget_bias: float,
               compute_dtype) -> Tuple[jnp.ndarray, ConvLSTMState]:
    i, g, f, o = jnp.split(gates, 4, axis=-1)
    new_c = jax.nn.sigmoid(f + forget_bias) * c \
        + jax.nn.sigmoid(i) * jnp.tanh(g)
    new_h = jnp.tanh(new_c) * jax.nn.sigmoid(o)
    if compute_dtype is not None:
        new_c = new_c.astype(compute_dtype)
        new_h = new_h.astype(compute_dtype)
    return new_h, ConvLSTMState(c=new_c, h=new_h)


def _blockdiag_kernel(ka: jnp.ndarray, kb: jnp.ndarray) -> jnp.ndarray:
    """[k,k,Ca+D,4D] + [k,k,Cb+D,4D] -> block-diagonal
    [k,k,Ca+D+Cb+D,8D] (zeros off-block)."""
    kk, _, ca, da = ka.shape
    _, _, cb, db = kb.shape
    top = jnp.concatenate(
        [ka, jnp.zeros((kk, kk, ca, db), ka.dtype)], axis=-1)
    bot = jnp.concatenate(
        [jnp.zeros((kk, kk, cb, da), kb.dtype), kb], axis=-1)
    return jnp.concatenate([top, bot], axis=2)


def _paired_step(
    cell_a: Params,
    cell_b: Params,
    xa: jnp.ndarray,
    xb: jnp.ndarray,
    sa: ConvLSTMState,
    sb: ConvLSTMState,
    mode: str,
    forget_bias: float,
    compute_dtype,
) -> Tuple[Tuple[jnp.ndarray, ConvLSTMState],
           Tuple[jnp.ndarray, ConvLSTMState]]:
    if mode == "two_convs":
        oa, na = convlstm_step(cell_a, xa, sa, forget_bias, compute_dtype)
        ob, nb = convlstm_step(cell_b, xb, sb, forget_bias, compute_dtype)
        return (oa, na), (ob, nb)
    assert mode == "blockdiag", mode
    da = cell_a["kernel"].shape[-1]
    kbig = _blockdiag_kernel(cell_a["kernel"], cell_b["kernel"])
    xin = jnp.concatenate([xa, sa.h, xb, sb.h], axis=-1)
    gates = _gate_conv(xin, kbig, compute_dtype)
    bias = jnp.concatenate([cell_a["bias"], cell_b["bias"]])
    gates = gates + bias.astype(gates.dtype)
    oa, na = _gate_math(gates[..., :da], sa.c, forget_bias, compute_dtype)
    ob, nb = _gate_math(gates[..., da:], sb.c, forget_bias, compute_dtype)
    return (oa, na), (ob, nb)


def paired_convlstm_scan(
    cell_a: Params,
    cell_b: Params,
    xs_a: jnp.ndarray,              # [N, T, H, W, Ca]
    xs_b: jnp.ndarray,              # [N, T, H, W, Cb]
    forget_bias: float = 1.0,
    compute_dtype=None,
    mode: str = "two_convs",
    remat: bool = False,
    keep_prob: float = 1.0,
    dropout_rngs: Tuple[Optional[jax.Array], Optional[jax.Array]] =
        (None, None),
) -> Tuple[Tuple[jnp.ndarray, ConvLSTMState],
           Tuple[jnp.ndarray, ConvLSTMState]]:
    """Two independent encoder recurrences in one scan.  Semantics of
    each half == ops.convlstm.convlstm_scan on its own inputs
    (zero-init states, full-length sequences, per-cell input dropout
    with the SAME per-site rng streams model_forward would pass the
    separate scans)."""
    N, T, H, W = xs_a.shape[:4]
    da = cell_a["kernel"].shape[-1] // 4
    db = cell_b["kernel"].shape[-1] // 4
    sdt = compute_dtype or jnp.float32
    init = (
        ConvLSTMState(c=jnp.zeros((N, H, W, da), sdt),
                      h=jnp.zeros((N, H, W, da), sdt)),
        ConvLSTMState(c=jnp.zeros((N, H, W, db), sdt),
                      h=jnp.zeros((N, H, W, db), sdt)),
    )
    dropout = keep_prob < 1.0
    rng_a, rng_b = dropout_rngs

    def body(carry, inp):
        (sa, sb), t = carry
        xa, xb = inp
        if dropout and rng_a is not None:
            xa = input_dropout(jax.random.fold_in(rng_a, t), xa, keep_prob)
        if dropout and rng_b is not None:
            xb = input_dropout(jax.random.fold_in(rng_b, t), xb, keep_prob)
        (oa, na), (ob, nb) = _paired_step(
            cell_a, cell_b, xa, xb, sa, sb, mode, forget_bias,
            compute_dtype)
        return ((na, nb), t + 1), (oa, ob)

    if remat:
        body = jax.checkpoint(body)
    ((last_a, last_b), _), (outs_a, outs_b) = jax.lax.scan(
        body, (init, jnp.asarray(0, jnp.int32)),
        (jnp.moveaxis(xs_a, 1, 0), jnp.moveaxis(xs_b, 1, 0)))
    return ((jnp.moveaxis(outs_a, 0, 1), last_a),
            (jnp.moveaxis(outs_b, 0, 1), last_b))


def paired_decode_scan(
    scale_params: dict,
    cfg,
    first_onehot: jnp.ndarray,       # [N, h, w, 1]
    init_class: ConvLSTMState,
    first_reg: jnp.ndarray,          # [N, h, w, 2]
    init_reg: ConvLSTMState,
    T_pred: int,
    scene_mean: Optional[jnp.ndarray],
    compute_dtype=None,
    mode: str = "two_convs",
    remat: bool = False,
    keep_prob: float = 1.0,
    dropout_rngs: Tuple[Optional[jax.Array], Optional[jax.Array]] =
        (None, None),
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """The class decoder (GNN residual + argmax one-hot feedback) and
    the regression decoder (raw-readout feedback) in one scan —
    step-for-step the math of two models.multiverse.greedy_decode
    calls (feedback="onehot" with use_gnn, and feedback="raw" without).

    Returns (class_logits [N,T,h,w,1], class_states [N,T,h,w,D],
    reg_out [N,T,h,w,2]).
    """
    from multiverse_tpu.ops import gnn_step_auto
    from multiverse_tpu.ops.layers import get_activation

    act = get_activation(cfg.activation)
    emb_c = scale_params["dec_class_emb"]
    emb_r = scale_params["dec_reg_emb"]
    cell_c = scale_params["dec_class"]
    cell_r = scale_params["dec_reg"]
    h2g_c = scale_params["h2g_class"]
    h2g_r = scale_params["h2g_reg"]
    N, H, W = first_onehot.shape[:3]
    sdt = compute_dtype or jnp.float32
    init_class = ConvLSTMState(c=init_class.c.astype(sdt),
                               h=init_class.h.astype(sdt))
    init_reg = ConvLSTMState(c=init_reg.c.astype(sdt),
                             h=init_reg.h.astype(sdt))
    dropout = keep_prob < 1.0
    rng_c, rng_r = dropout_rngs
    smean = None if scene_mean is None else scene_mean.astype(sdt)

    def body(carry, t):
        sc, sr, xc, xr = carry
        if cfg.use_gnn:
            agg = gnn_step_auto(sc.h, smean, compute_dtype=compute_dtype,
                                allow_pallas=cfg.allow_pallas)
            sc = ConvLSTMState(c=sc.c, h=sc.h + agg)
        ec = conv2d(emb_c, xc, activation=act, compute_dtype=compute_dtype)
        er = conv2d(emb_r, xr, activation=act, compute_dtype=compute_dtype)
        if dropout and rng_c is not None:
            ec = input_dropout(jax.random.fold_in(rng_c, t), ec, keep_prob)
        if dropout and rng_r is not None:
            er = input_dropout(jax.random.fold_in(rng_r, t), er, keep_prob)
        (oc, nsc), (orr, nsr) = _paired_step(
            cell_c, cell_r, ec, er, sc, sr, mode, 1.0, compute_dtype)
        logits = conv2d(h2g_c, oc, compute_dtype=compute_dtype)
        reg = conv2d(h2g_r, orr, compute_dtype=compute_dtype)
        # feedback: class argmax one-hot, reg raw readout (conv2d
        # returns f32 like the separate decode — carries stay f32)
        flat = logits.reshape(N, H * W)
        nxt_c = jax.nn.one_hot(
            jnp.argmax(flat, axis=1), H * W,
            dtype=logits.dtype).reshape(N, H, W, 1)
        return (nsc, nsr, nxt_c, reg), (logits, oc, reg)

    if remat:
        body = jax.checkpoint(body)
    _, (logits, states, regs) = jax.lax.scan(
        body,
        (init_class, init_reg, first_onehot.astype(jnp.float32),
         first_reg.astype(jnp.float32)),
        jnp.arange(T_pred))
    return (jnp.moveaxis(logits, 0, 1), jnp.moveaxis(states, 0, 1),
            jnp.moveaxis(regs, 0, 1))
