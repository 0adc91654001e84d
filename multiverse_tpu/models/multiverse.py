"""The Multiverse model: scene CNN + ConvLSTM encoders + graph-attended
ConvLSTM decoders over coarse spatial grids.

TPU-first rebuild of the reference model graph
(reference: code/pred_models.py:36-1040):

* pure functions over an explicit parameter pytree (no variable scopes);
* `lax.scan` drives both encode and decode time loops (the reference uses
  dynamic_rnn / raw_rnn TensorArray loops);
* static shapes throughout: `pred_len` is a compile-time constant and
  variable-length samples are masked, never dynamically shaped;
* the soft-grid label smoothing runs on device as a tiny conv (the
  reference does per-example scipy.ndimage convolutions in the feed-dict
  path — a host bottleneck, reference: code/pred_models.py:1082-1143).

Parameter naming maps to the reference's variable scopes:
    scene_conv1/2            person_pred/scene_conv{1,2}      (:155-160)
    scales[i].enc_class      enc_grid_{i}                     (:189-195)
    scales[i].enc_reg        enc_grid_regress_{i}             (:196-202)
    scales[i].dec_class      dec_grid_{i}                     (:236-241)
    scales[i].dec_reg        dec_grid_reg_{i}                 (:243-249)
    scales[i].enc_grid_emb   person_pred/grid_emb             (:221-226)
    scales[i].dec_class_emb  decoder_grid_class_{i}/grid_emb  (:441-446)
    scales[i].dec_reg_emb    decoder_grid_reg_{i}/grid_emb
    scales[i].h2g_class      hidden2grid_decoder_grid_class_{i}/out_dec_grid
    scales[i].h2g_reg        hidden2grid_decoder_grid_reg_{i}/out_dec_grid
    scales[i].h2g_single     decode_reg/out_dec_grid (use_single_decoder)
"""

from __future__ import annotations

from typing import Dict, List, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from multiverse_tpu.config import MultiverseConfig
from multiverse_tpu.geometry import one_hot_grid
from multiverse_tpu.ops import (
    ConvLSTMState,
    conv2d,
    convlstm_init,
    convlstm_scan,
    convlstm_step,
    gnn_step_auto,
    init_conv,
)
from multiverse_tpu.ops.layers import get_activation, l2_weight_decay


class Batch(NamedTuple):
    """One device batch. All arrays static-shaped.

    Mirrors the placeholder set at reference: code/pred_models.py:62-115,
    minus everything the reference feeds but never uses.
    """

    obs_grid_class: jnp.ndarray        # [N, S, T_obs] int32 flat cell ids
    obs_grid_target_all: Tuple[jnp.ndarray, ...]   # per scale [N,T_obs,h,w,2]
    obs_scene: jnp.ndarray             # [N, T_obs] int32 -> scene_feat rows
    scene_feat: jnp.ndarray            # [F, SH, SW, C] float32 one-hot masks
    pred_grid_class: Optional[jnp.ndarray] = None  # [N, S, T_pred] int32
    pred_grid_target_all: Optional[Tuple[jnp.ndarray, ...]] = None
    pred_length: Optional[jnp.ndarray] = None      # [N] int32 (beam decode)


class ForwardOutputs(NamedTuple):
    class_logits: Dict[int, jnp.ndarray]   # scale -> [N, T_pred, h, w, 1]
    reg_out: Dict[int, jnp.ndarray]        # scale -> [N, T_pred, h, w, 2]
    dec_states: Dict[int, jnp.ndarray]     # scale -> [N, T_pred, h, w, D]
    scene_convs: List[jnp.ndarray]         # per scale [N, T_obs, h, w, Cc]


# --------------------------------------------------------------- params


def init_params(key: jax.Array, cfg: MultiverseConfig) -> dict:
    """Initialize the full parameter pytree."""
    cfg.validate()
    keys = iter(jax.random.split(key, 64))
    k = cfg.convlstm_kernel
    D = cfg.enc_hidden_size
    params: dict = {}
    if cfg.use_scene_enc:
        in_ch = cfg.scene_class
        for i in range(cfg.num_scales):
            params[f"scene_conv{i + 1}"] = init_conv(
                next(keys), in_ch, cfg.scene_conv_dim, cfg.scene_conv_kernel)
            in_ch = cfg.scene_conv_dim

    scales: dict = {}
    for i in cfg.active_scales:
        enc_in = cfg.scene_conv_dim if cfg.use_scene_enc else cfg.emb_size
        s: dict = {
            "enc_class": convlstm_init(next(keys), enc_in, D, k),
            "enc_reg": convlstm_init(next(keys), 2, D, k),
            "dec_class": convlstm_init(next(keys), cfg.emb_size, D, k),
            "dec_class_emb": init_conv(next(keys), 1, cfg.emb_size, 3),
            "h2g_class": init_conv(next(keys), D, 1, 3, add_bias=False),
        }
        if not cfg.use_scene_enc:
            s["enc_grid_emb"] = init_conv(next(keys), 1, cfg.emb_size, 3)
        if cfg.use_single_decoder:
            s["h2g_single"] = init_conv(next(keys), D, 2, 3, add_bias=False)
        else:
            s["dec_reg"] = convlstm_init(next(keys), cfg.emb_size, D, k)
            s["dec_reg_emb"] = init_conv(next(keys), 2, cfg.emb_size, 3)
            s["h2g_reg"] = init_conv(next(keys), D, 2, 3, add_bias=False)
        scales[str(i)] = s
    params["scales"] = scales
    return params


# --------------------------------------------------------------- scene CNN


def scene_encode(
    params: dict,
    scene_feat: jnp.ndarray,
    obs_scene: jnp.ndarray,
    cfg: MultiverseConfig,
    compute_dtype=None,
) -> List[jnp.ndarray]:
    """Strided conv pyramid over per-timestep one-hot semantic maps.

    reference: code/pred_models.py:146-165. Returns one feature map per
    grid scale: [N, T, h_i, w_i, scene_conv_dim].
    """
    act = get_activation(cfg.activation)
    N, T = obs_scene.shape
    x = scene_feat[obs_scene.reshape(-1)]  # [N*T, SH, SW, C]
    # scene masks ship as uint8 (11x less host->device traffic than the
    # reference's float32 feed); cast on device
    x = x.astype(compute_dtype or jnp.float32)
    if cfg.norm_input:
        # [-1, 1] input convention — applied for train AND eval, the
        # reference normalizes inside build_tower unconditionally
        # (reference: SimAug/code/pred_models.py:284-286); every
        # forward path (greedy eval, beam decode, serving) funnels
        # through here so a norm_input checkpoint evaluates correctly
        x = x * 2.0 - 1.0
    outs = []
    feats = x
    for i in range(cfg.num_scales):
        feats = conv2d(params[f"scene_conv{i + 1}"], feats, stride=2,
                       activation=act, compute_dtype=compute_dtype)
        h, w = cfg.scene_grids[i]
        if feats.shape[1:3] != (h, w):
            # same constraint as the reference reshape at
            # code/pred_models.py:161-164 — strides must halve successively
            raise ValueError(
                f"scene conv pyramid shape {feats.shape[1:3]} != grid "
                f"{(h, w)} at scale {i}; use strides like (2, 4)"
            )
        outs.append(feats.reshape(N, T, h, w, cfg.scene_conv_dim))
    return outs


# --------------------------------------------------------------- decoder


def _grid_argmax_onehot(logits: jnp.ndarray) -> jnp.ndarray:
    """[N, h, w, 1] logits -> one-hot of argmax cell, same shape.

    reference: code/pred_models.py:411-415.
    """
    N, h, w, _ = logits.shape
    flat = logits.reshape(N, h * w)
    am = jnp.argmax(flat, axis=1)
    return one_hot_grid(am, h, w)


def greedy_decode(
    scale_params: dict,
    cfg: MultiverseConfig,
    first_input: jnp.ndarray,        # [N, h, w, P]
    init_state: ConvLSTMState,       # from the encoder
    T_pred: int,
    emb_name: str,
    cell_name: str,
    h2g_name: str,
    use_gnn: bool,
    scene_mean: Optional[jnp.ndarray] = None,  # [N, h, w, Cc]
    feedback: str = "onehot",        # onehot | raw | teacher
    pred_gt: Optional[jnp.ndarray] = None,     # [N, T_pred, h, w, P]
    compute_dtype=None,
    allow_fused: bool = False,  # fused decode kernel (inference only)
    keep_prob: float = 1.0,     # train-time input dropout on the cell
    dropout_rng: Optional[jax.Array] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Autoregressive ConvLSTM decode via lax.scan.

    Equivalent of the reference's raw_rnn loop
    (reference: code/pred_models.py:311-471): per step, (1) optional GNN
    residual on the hidden state, (2) 3x3 conv spatial embedding of the
    input, (3) ConvLSTM step, (4) hidden2grid conv readout; feedback is
    the argmax one-hot (classification), the raw readout (regression), or
    the ground truth (teacher forcing — note the reference feeds
    pred_gt[t] when predicting step t, reference: :391-405; reproduced
    verbatim for parity).

    keep_prob / dropout_rng: the reference wraps the decoder cells in
    ``DropoutWrapper(cell, keep_prob)`` — input dropout on the embedded
    cell input, fresh mask per step, train-only (reference:
    code/pred_models.py:242,249).  Active only when keep_prob < 1 AND
    an rng is supplied (training); the fused inference kernel path
    never sees dropout because allow_fused is inference-only.

    Returns (readouts [N, T, h, w, P], hidden states [N, T, h, w, D]).
    """
    act = get_activation(cfg.activation)
    dropout = keep_prob < 1.0 and dropout_rng is not None

    emb_p = scale_params[emb_name]
    cell_p = scale_params[cell_name]
    h2g_p = scale_params[h2g_name]

    # the class decoder's argmax-feedback loop on the TPU bf16
    # inference path runs the fully-fused decode-step kernel (GNN +
    # cell + readout in one VMEM pass, ops/pallas_decode.py), carrying
    # the argmax CELL ID and looking its embedding up in a precomputed
    # table — same structure as the beam decode, identity "parents".
    # Gated on allow_fused because the fused kernel has no VJP
    # (training differentiates through this decode).
    from multiverse_tpu.ops import pallas_decode

    fused = (
        allow_fused
        and not dropout
        and cfg.allow_pallas
        and feedback == "onehot"
        and use_gnn
        and compute_dtype == jnp.bfloat16
        and pallas_decode.fused_decode_available()
        and first_input.shape[-1] == 1
        and h2g_p["w"].shape[-1] == 1
    )
    if fused:
        N, H, W, _ = first_input.shape
        HW = H * W
        emb_table = conv2d(
            emb_p, one_hot_grid(jnp.arange(HW), H, W),
            activation=act, compute_dtype=compute_dtype)
        ids0 = jnp.argmax(
            first_input.reshape(N, HW), axis=1).astype(jnp.int32)
        identity = jnp.arange(N, dtype=jnp.int32)
        state0 = ConvLSTMState(
            c=init_state.c.astype(compute_dtype),
            h=init_state.h.astype(compute_dtype))
        scene_f = None if scene_mean is None else \
            scene_mean.astype(compute_dtype)
        quant8 = cfg.decode_quant in ("int8", "int8a", "int8_dyn")
        if quant8:
            quant, q8_step = pallas_decode.select_quant(
                cfg.decode_quant, cell_p, emb_table)

        def fused_step(carry, t):
            state, ids = carry
            if quant8:
                out, new_state, logits = q8_step(
                    quant, cell_p["bias"], h2g_p, ids, identity,
                    state, scene_f, H, W,
                    interpret=pallas_decode.fused_decode_interpret())
            else:
                out, new_state, logits = \
                    pallas_decode.decode_step_pallas_gathered(
                        cell_p, h2g_p, ids, identity, emb_table, state,
                        scene_f, H, W,
                        interpret=pallas_decode.fused_decode_interpret())
            nxt = jnp.argmax(
                logits.reshape(N, HW), axis=1).astype(jnp.int32)
            return (new_state, nxt), (out, logits)

        (_, _), (outs, logits) = jax.lax.scan(
            fused_step, (state0, ids0), jnp.arange(T_pred))
        return jnp.moveaxis(logits, 0, 1), jnp.moveaxis(outs, 0, 1)

    def step(carry, t):
        state, x = carry
        if use_gnn:
            # gnn_step_auto picks the fused Pallas kernel on the TPU
            # bf16 path (inference AND training/attack gradients — the
            # kernel carries a custom VJP with a fused backward) and
            # the exact jnp 9-neighbor reformulation elsewhere
            agg = gnn_step_auto(state.h, scene_mean,
                                compute_dtype=compute_dtype,
                                allow_pallas=cfg.allow_pallas)
            state = ConvLSTMState(c=state.c, h=state.h + agg)
        emb = conv2d(emb_p, x, activation=act, compute_dtype=compute_dtype)
        if dropout:
            from multiverse_tpu.ops.convlstm import input_dropout
            emb = input_dropout(
                jax.random.fold_in(dropout_rng, t), emb, keep_prob)
        out, state = convlstm_step(cell_p, emb, state,
                                   compute_dtype=compute_dtype)
        logits = conv2d(h2g_p, out, compute_dtype=compute_dtype)
        if feedback == "teacher":
            nxt_t = jnp.minimum(t + 1, T_pred - 1)
            nxt = jnp.take(pred_gt, nxt_t, axis=1)
        elif feedback == "onehot":
            nxt = _grid_argmax_onehot(logits)
        else:
            nxt = logits
        return (state, nxt), (out, logits)

    if cfg.remat:
        # recompute the step in the backward instead of storing the
        # per-step gate/conv residuals (see config.remat)
        step = jax.checkpoint(step)
    (_, _), (outs, logits) = jax.lax.scan(
        step, (init_state, first_input), jnp.arange(T_pred)
    )
    # [T, N, ...] -> [N, T, ...]
    return jnp.moveaxis(logits, 0, 1), jnp.moveaxis(outs, 0, 1)


# --------------------------------------------------------------- forward


def model_forward(
    params: dict,
    batch: Batch,
    cfg: MultiverseConfig,
    is_train: bool = False,
    rng: Optional[jax.Array] = None,
) -> ForwardOutputs:
    """Full forward pass (greedy decode path).

    reference: code/pred_models.py:123-308 `build_forward`.

    ``rng`` drives train-time input dropout on the four ConvLSTM cells
    when ``cfg.keep_prob < 1`` (the reference's DropoutWrapper under the
    is_train cond, reference: code/pred_models.py:130-131); required at
    train time then, unused otherwise.
    """
    compute_dtype = (
        jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else None
    )
    dropout_rng = None
    if is_train and cfg.keep_prob < 1.0:
        if rng is None:
            raise ValueError(
                "training with keep_prob < 1 needs an rng "
                "(model_forward(..., rng=...))")
        dropout_rng = rng

    def site_rng(scale: int, site: int):
        if dropout_rng is None:
            return None
        return jax.random.fold_in(dropout_rng, scale * 4 + site)

    act = get_activation(cfg.activation)
    N = batch.obs_grid_class.shape[0]
    T_obs = batch.obs_grid_class.shape[2]
    T_pred = cfg.pred_len

    scene_convs: List[jnp.ndarray] = []
    if cfg.use_scene_enc:
        scene_convs = scene_encode(
            params, batch.scene_feat, batch.obs_scene, cfg, compute_dtype
        )

    class_logits: Dict[int, jnp.ndarray] = {}
    reg_out: Dict[int, jnp.ndarray] = {}
    dec_states: Dict[int, jnp.ndarray] = {}

    for idx, i in enumerate(cfg.active_scales):
        h, w = cfg.scene_grids[i]
        sp = params["scales"][str(i)]

        # [N, T, h, w, 1]
        obs_onehot = one_hot_grid(batch.obs_grid_class[:, i], h, w)

        if cfg.use_scene_enc:
            enc_in = scene_convs[i] * obs_onehot
        else:
            flat = obs_onehot.reshape(N * T_obs, h, w, 1)
            emb = conv2d(sp["enc_grid_emb"], flat, activation=act,
                         compute_dtype=compute_dtype)
            enc_in = emb.reshape(N, T_obs, h, w, cfg.emb_size)

        fuse_pairs = cfg.fuse_scan_pairs and not cfg.use_single_decoder
        if fuse_pairs:
            # both encoder recurrences in ONE scan (ops/fused_scans.py;
            # identical math — equality-tested — ~3% faster at the
            # published train shape, bench_pairscan.py)
            from multiverse_tpu.ops.fused_scans import (
                paired_convlstm_scan,
            )

            (_, enc_last), (_, enc_reg_last) = paired_convlstm_scan(
                sp["enc_class"], sp["enc_reg"], enc_in,
                batch.obs_grid_target_all[idx],
                compute_dtype=compute_dtype, remat=cfg.remat,
                keep_prob=cfg.keep_prob,
                dropout_rngs=(site_rng(i, 0), site_rng(i, 1)),
            )
        else:
            _, enc_last = convlstm_scan(
                sp["enc_class"], enc_in, compute_dtype=compute_dtype,
                remat=cfg.remat,
                keep_prob=cfg.keep_prob, dropout_rng=site_rng(i, 0),
            )
        if not cfg.use_single_decoder and not fuse_pairs:
            _, enc_reg_last = convlstm_scan(
                sp["enc_reg"], batch.obs_grid_target_all[idx],
                compute_dtype=compute_dtype, remat=cfg.remat,
                keep_prob=cfg.keep_prob, dropout_rng=site_rng(i, 1),
            )

        scene_mean = None
        if cfg.use_scene_enc and cfg.use_gnn:
            # time-averaged scene features as extra node features
            # (reference: code/pred_models.py:824-838)
            scene_mean = jnp.mean(scene_convs[i], axis=1)

        if cfg.use_teacher_forcing and is_train:
            class_fb = "teacher"
            class_gt = one_hot_grid(batch.pred_grid_class[:, i], h, w)
        elif (not is_train) or cfg.train_w_onehot:
            class_fb, class_gt = "onehot", None
        else:
            class_fb, class_gt = "raw", None

        if fuse_pairs and is_train and class_fb == "onehot" \
                and not cfg.use_teacher_forcing:
            # both decoder recurrences in one scan — train-time only:
            # at inference the separate class decode takes the fused
            # Pallas kernel path, which no scan pairing approaches
            from multiverse_tpu.ops.fused_scans import paired_decode_scan

            logits, states, reg = paired_decode_scan(
                sp, cfg, obs_onehot[:, -1], enc_last,
                batch.obs_grid_target_all[idx][:, -1], enc_reg_last,
                T_pred, scene_mean, compute_dtype=compute_dtype,
                remat=cfg.remat, keep_prob=cfg.keep_prob,
                dropout_rngs=(site_rng(i, 2), site_rng(i, 3)),
            )
            class_logits[i] = logits
            dec_states[i] = states
            reg_out[i] = reg
            continue

        logits, states = greedy_decode(
            sp, cfg,
            first_input=obs_onehot[:, -1],
            init_state=enc_last,
            T_pred=T_pred,
            emb_name="dec_class_emb",
            cell_name="dec_class",
            h2g_name="h2g_class",
            use_gnn=cfg.use_gnn,
            scene_mean=scene_mean,
            feedback=class_fb,
            pred_gt=class_gt,
            compute_dtype=compute_dtype,
            allow_fused=not is_train,
            keep_prob=cfg.keep_prob,
            dropout_rng=site_rng(i, 2),
        )
        class_logits[i] = logits
        dec_states[i] = states

        if cfg.use_single_decoder:
            # regression read out of the class decoder's hidden states
            # (reference: code/pred_models.py:287-296)
            flat = states.reshape(N * T_pred, h, w, cfg.dec_hidden_size)
            reg = conv2d(sp["h2g_single"], flat, compute_dtype=compute_dtype)
            reg_out[i] = reg.reshape(N, T_pred, h, w, 2)
        else:
            reg_fb = "teacher" if (cfg.use_teacher_forcing and is_train) \
                else "raw"
            reg_gt = (batch.pred_grid_target_all[idx]
                      if reg_fb == "teacher" else None)
            reg, _ = greedy_decode(
                sp, cfg,
                first_input=batch.obs_grid_target_all[idx][:, -1],
                init_state=enc_reg_last,
                T_pred=T_pred,
                emb_name="dec_reg_emb",
                cell_name="dec_reg",
                h2g_name="h2g_reg",
                use_gnn=False,
                feedback=reg_fb,
                pred_gt=reg_gt,
                compute_dtype=compute_dtype,
                keep_prob=cfg.keep_prob,
                dropout_rng=site_rng(i, 3),
            )
            reg_out[i] = reg

    return ForwardOutputs(class_logits, reg_out, dec_states, scene_convs)


# --------------------------------------------------------------- losses


# The 7 hand-tuned soft-grid spatial smoothing kernels
# (reference: code/pred_models.py:1088-1124).
SOFT_GRID_KERNELS = {
    1: [[0.1] * 3, [0.1, 1.0, 0.1], [0.1] * 3],
    2: [[0.01] * 3, [0.01, 1.0, 0.01], [0.01] * 3],
    3: [[0.05] * 3, [0.05, 1.0, 0.05], [0.05] * 3],
    4: [[0.0125] * 3, [0.0125, 0.9, 0.0125], [0.0125] * 3],
    5: [[0.05] * 3, [0.05, 0.6, 0.05], [0.05] * 3],
    6: [[0.1] * 3, [0.1, 0.2, 0.1], [0.1] * 3],
    7: [
        [0.0625, 0.0625, 0.0625, 0.0625, 0.0625],
        [0.0625, 0.0125, 0.0125, 0.0125, 0.0625],
        [0.0625, 0.0125, 0.8, 0.0125, 0.0625],
        [0.0625, 0.0125, 0.0125, 0.0125, 0.0625],
        [0.0625, 0.0625, 0.0625, 0.0625, 0.0625],
    ],
}


def soft_grid_labels(
    labels: jnp.ndarray, h: int, w: int, soft_grid: int = 1
) -> jnp.ndarray:
    """Spatially smoothed one-hot labels, on device.

    Replaces the reference's per-example scipy.ndimage.convolve host loop
    (reference: code/pred_models.py:1085-1136) with one batched conv.

    Args:
        labels: [..., ] int cell ids.
    Returns:
        [..., h, w, 1] float soft label maps.
    """
    k = np.asarray(SOFT_GRID_KERNELS[soft_grid], dtype=np.float32)
    onehot = one_hot_grid(labels, h, w)  # [..., h, w, 1]
    lead = onehot.shape[:-3]
    x = onehot.reshape((-1, h, w, 1))
    out = jax.lax.conv_general_dilated(
        x,
        jnp.asarray(k)[:, :, None, None],
        window_strides=(1, 1),
        padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=jax.lax.Precision.HIGHEST,
    )
    return out.reshape(lead + (h, w, 1))


def compute_loss(
    params: dict,
    batch: Batch,
    outputs: ForwardOutputs,
    cfg: MultiverseConfig,
    axis_name: Optional[str] = None,
) -> Tuple[jnp.ndarray, dict]:
    """Grid CE + Huber offset regression + L2 weight decay.

    reference: code/pred_models.py:961-1040 `build_loss`.
    Returns (total loss, dict of per-head losses).

    ``axis_name``: set when this runs inside ``shard_map`` over a batch
    axis and the caller pmean-averages losses/grads over that axis.
    Every plain-mean term is exact under mean-of-equal-shard-means, but
    the masked regression's normalizer (the per-shard mask count) is
    not — with ``axis_name`` the mask count is psum'd globally and the
    local term scaled by the axis size, so the caller's pmean recovers
    exactly ``sum_shards(num) / global_count`` for both the value and
    (because only the numerator depends on params) the gradient.
    """
    losses = {}
    total = jnp.asarray(0.0, jnp.float32)
    for idx, i in enumerate(cfg.active_scales):
        h, w = cfg.scene_grids[i]
        logits = outputs.class_logits[i].reshape(-1, h * w)  # [N*T, HW]
        labels_t = batch.pred_grid_class[:, i]  # [N, T]

        if cfg.use_soft_grid_class:
            soft = soft_grid_labels(labels_t, h, w, cfg.soft_grid)
            soft = soft.reshape(-1, h * w)
            # tf.nn.softmax_cross_entropy_with_logits on unnormalized
            # label maps: -sum(label * log_softmax(logits))
            ce = -jnp.sum(soft * jax.nn.log_softmax(logits, -1), axis=-1)
            label_mask = soft
        else:
            ce = optax.softmax_cross_entropy_with_integer_labels(
                logits, labels_t.reshape(-1)
            )
            label_mask = None
        ce = jnp.mean(ce)

        reg = outputs.reg_out[i]                   # [N, T, h, w, 2]
        reg_tgt = batch.pred_grid_target_all[idx]  # [N, T, h, w, 2]
        hub = optax.huber_loss(reg, reg_tgt, delta=1.0)
        if cfg.mask_grid_regression:
            # only cells whose (soft) label is > 0
            # (reference: code/pred_models.py:999-1018)
            if label_mask is None:
                label_mask = jax.nn.one_hot(
                    labels_t.reshape(-1), h * w, dtype=jnp.float32
                )
            m = (label_mask > 0).astype(jnp.float32)
            m = m.reshape(reg.shape[:-1])[..., None]  # [N,T,h,w,1]
            num, den = jnp.sum(hub * m), jnp.sum(m)
            if axis_name is not None:
                n_shards = jax.lax.psum(jnp.ones((), jnp.float32),
                                        axis_name)
                reg_loss = n_shards * num / jnp.maximum(
                    jax.lax.psum(den, axis_name) * 2.0, 1.0)
            else:
                reg_loss = num / jnp.maximum(den * 2.0, 1.0)
        else:
            reg_loss = jnp.mean(hub)

        ce = ce * cfg.grid_loss_weight
        reg_loss = reg_loss * cfg.grid_reg_loss_weight
        losses[f"grid{i}_class"] = ce
        losses[f"grid{i}_reg"] = reg_loss
        total = total + ce + reg_loss

    wd = l2_weight_decay(params, cfg.wd)
    losses["wd"] = wd
    total = total + wd
    return total, losses
