"""Diverse beam search over grid cells, as a static-shape lax.scan.

TPU-first rebuild of the reference's raw_rnn + TensorArray beam decoder
(reference: code/pred_models.py:474-806 `grid_decoder_beam_search`,
:1197-1223 `add_div_penalty`, :1225-1251 `gather_helper`):

* beams are folded into the batch axis for every conv (the ConvLSTM and
  GNN see [N*K, h, w, ·] — full MXU tiles), and unfolded to [N, K, ·]
  only for the per-step top-k / gather;
* the diversity rank penalty uses a double argsort instead of
  tf.map_fn(tf.invert_permutation);
* the parent-pointer backtrace is a reverse lax.scan instead of a
  tf.while_loop over TensorArrays;
* variable per-sample prediction lengths are handled by *freezing*
  finished samples (identity parents, carried logprobs) so one static
  T_max batch decodes trajectories of mixed length with per-sample
  results identical to the reference's per-sample dynamic loop.

Step-t semantics (t is 0-based; the reference's loop `time` is t+1):
  1. GNN residual on the hidden state, then ConvLSTM step on the
     embedded previous cell one-hot;
  2. logits -> log_softmax, add to running beam logprobs;
  3. optional rank-based diversity penalty log(gamma)·rank
     (Li et al. 2016);
  4. flat top-k over K·H·W candidates (t=0 restricted to beam 0 — all
     beams are identical then, reference: :572-573);
  5. carried logprobs zeroed while t+1 <= fix_num_timestep
     (reference: :580-584).
"""

from __future__ import annotations

import math
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from multiverse_tpu.config import MultiverseConfig
from multiverse_tpu.geometry import one_hot_grid
from multiverse_tpu.ops import (
    ConvLSTMState,
    conv2d,
    convlstm_step,
    gnn_step_auto,
)
from multiverse_tpu.ops.layers import get_activation

NEG_INF = -1e30


class BeamOutputs(NamedTuple):
    """Mirrors the reference beam decode outputs
    (reference: code/pred_models.py:805-806 return tuple)."""

    best_logits: jnp.ndarray        # [N, T, h, w, 1] best beam's logits
    logits: jnp.ndarray             # [N, K, T, H*W]
    ids: jnp.ndarray                # [N, K, T] int32 grid cell per step
    logprobs: jnp.ndarray           # [N, K] total log-likelihood
    states: Optional[jnp.ndarray]   # [N, K, T, h, w, D] (single-decoder)


def add_diversity_penalty(logprobs: jnp.ndarray, gamma: float) -> jnp.ndarray:
    """Rank-based diversity penalty (Li et al. 2016).

    penalty[v] = log(gamma) * rank(v) where rank 0 is the best entry of
    each [.., V] row (reference: code/pred_models.py:1197-1223 via
    top_k + invert_permutation).

    Ranks come from a comparison count instead of a sort: TPU sorts
    are slow and this runs twice per decode step at [N·K, H·W].  The
    count `Σ_j [x_j > x_i] + Σ_{j<i} [x_j == x_i]` reproduces a stable
    descending argsort-of-argsort exactly, including tie order — XLA
    fuses the broadcasted compare into the reduction, so no [V, V]
    tensor is materialized.
    """
    x = logprobs
    gt = (x[..., None, :] > x[..., :, None])         # [.., V(i), V(j)]
    eq = (x[..., None, :] == x[..., :, None])
    V = x.shape[-1]
    earlier = (jnp.arange(V)[None, :] < jnp.arange(V)[:, None])
    ranks = jnp.sum(gt, axis=-1) + jnp.sum(
        eq & earlier, axis=-1)
    return logprobs + math.log(gamma) * ranks.astype(logprobs.dtype)


def select_successors_dense(logprob: jnp.ndarray, logits_t: jnp.ndarray,
                            K: int, t, diverse: bool, gamma: float):
    """The rounds-1..4 successor selection: full-row log_softmax +
    rank penalty over all H*W candidates, flat top-K over K*H*W.
    Kept as the `beam_select="dense"` path, the automatic fallback
    when the two-stage dominance precondition fails, and the oracle
    the two-stage form is property-tested against."""
    N, _, HW = logits_t.shape
    cand = logprob[:, :, None] + jax.nn.log_softmax(logits_t, axis=-1)
    if diverse:
        cand = add_diversity_penalty(cand, gamma)
    # t == 0: all beams identical -> restrict to beam 0
    beam0_only = jnp.where(
        (jnp.arange(cand.shape[1]) == 0)[None, :, None], cand, NEG_INF)
    cand = jnp.where(t == 0, beam0_only, cand)
    new_logprob, flat_idx = jax.lax.top_k(cand.reshape(N, -1), K)
    ids = (flat_idx % HW).astype(jnp.int32)
    parents = (flat_idx // HW).astype(jnp.int32)
    return new_logprob, ids, parents


def select_successors_twostage(logprob: jnp.ndarray,
                               logits_t: jnp.ndarray,
                               K: int, t, diverse: bool, gamma: float):
    """Dominance-pruned successor selection — EXACTLY the dense form's
    winners, scores, and tie order, without the O((H*W)^2) rank pass or
    a full-row log_softmax.

    Dominance: within a beam, the penalized score of the rank-i
    candidate is base_i + log(gamma)*i with base_0 >= base_1 >= ...
    (stable descending order) and log(gamma) <= 0, so penalized scores
    are non-increasing in rank — if a candidate ranked r >= K reached
    the global top-K, its own beam's ranks 0..K-1 would all score >= it
    and fill the top-K first.  Hence only each beam's top-K matter.

    Exactness of ties: lax.top_k breaks ties lower-index-first, so the
    per-beam stage orders equal raw logits by cell id (== the
    comparison-count rank's stable order), and the K*K stage orders
    equal penalized scores by (parent, within-beam rank); rank order
    equals cell order for tied scores, reproducing the dense flat
    index's (parent, cell) order.  With the penalty active, equal
    penalized scores within a beam are impossible for gamma < 1 (they
    would need base_i < base_j with i < j).  Property-tested against
    select_successors_dense with injected ties.

    The raw logits stand in for their log-softmax (a per-row monotone
    shift); the logsumexp correction is applied to the K survivors
    only.
    """
    N, _, HW = logits_t.shape
    vals, cells = jax.lax.top_k(logits_t, K)            # [N, K, K]
    lse = jax.scipy.special.logsumexp(
        logits_t, axis=-1, keepdims=True)               # [N, K, 1]
    cand = logprob[:, :, None] + (vals - lse)
    if diverse:
        cand = cand + math.log(gamma) * jnp.arange(K, dtype=cand.dtype)
    beam0_only = jnp.where(
        (jnp.arange(cand.shape[1]) == 0)[None, :, None], cand, NEG_INF)
    cand = jnp.where(t == 0, beam0_only, cand)
    new_logprob, flat = jax.lax.top_k(cand.reshape(N, K * K), K)
    parents = (flat // K).astype(jnp.int32)
    ids = jnp.take_along_axis(
        cells.reshape(N, K * K), flat, axis=1).astype(jnp.int32)
    return new_logprob, ids, parents


def _fold(x: jnp.ndarray) -> jnp.ndarray:
    return x.reshape((-1,) + x.shape[2:])


def _gather_beams(x: jnp.ndarray, parents: jnp.ndarray) -> jnp.ndarray:
    """x: [N, K, ...]; parents: [N, K] -> x[n, parents[n, k]]."""
    idx = parents.reshape(parents.shape + (1,) * (x.ndim - 2))
    return jnp.take_along_axis(x, idx, axis=1)


def diverse_beam_search(
    scale_params: dict,
    cfg: MultiverseConfig,
    first_input: jnp.ndarray,       # [N, h, w, 1] last observed one-hot
    init_state: ConvLSTMState,      # [N, h, w, D] encoder last state
    T_pred: int,
    pred_length: Optional[jnp.ndarray] = None,  # [N] int32, <= T_pred
    scene_mean: Optional[jnp.ndarray] = None,   # [N, h, w, Cc]
    save_states: bool = False,
    compute_dtype=None,
) -> BeamOutputs:
    cfg.validate()
    K = cfg.beam_size
    N, h, w, _ = first_input.shape
    HW = h * w
    D = init_state.h.shape[-1]
    act = get_activation(cfg.activation)
    use_gnn = cfg.use_gnn

    emb_p = scale_params["dec_class_emb"]
    cell_p = scale_params["dec_class"]
    h2g_p = scale_params["h2g_class"]

    # The decoder input is always a one-hot cell map and the spatial
    # embedding conv is linear before its activation, so the embedding
    # of every possible cell is precomputable: one conv over the 576
    # basis maps replaces a pathological 1-channel conv (lane-padded
    # 128x on TPU) + one-hot materialization with a plain row gather
    # per step.  Exact — asserted against the conv path in tests.
    basis = one_hot_grid(jnp.arange(HW), h, w)          # [HW, h, w, 1]
    emb_table = conv2d(emb_p, basis, activation=act,
                       compute_dtype=compute_dtype)     # [HW, h, w, E]

    # tile inputs & state across beams (reference: :494-514)
    def tile(x):
        return jnp.broadcast_to(
            x[:, None], (N, K) + x.shape[1:]
        )

    # first decoder input is the last observed cell's one-hot; carry
    # its flat id instead of the map (the emb table gathers by id)
    ids0 = jnp.argmax(
        first_input.reshape(N, HW), axis=1).astype(jnp.int32)
    ids0 = jnp.broadcast_to(ids0[:, None], (N, K))
    state_dtype = compute_dtype or init_state.h.dtype
    state0 = ConvLSTMState(
        c=tile(init_state.c.astype(state_dtype)),
        h=tile(init_state.h.astype(state_dtype)))
    scene_nk = None
    if scene_mean is not None and use_gnn:
        scene_nk = _fold(tile(scene_mean))
    logprob0 = jnp.zeros((N, K), jnp.float32)
    beam_iota = jnp.broadcast_to(jnp.arange(K, dtype=jnp.int32), (N, K))

    # fully-fused decode-step kernel (GNN + cell + readout in one VMEM
    # pass, ops/pallas_decode.py) on the TPU bf16 path; the state-saving
    # single-decoder variant needs the raw cell outputs and stays on
    # the composed path.  Tests exercise this wiring on CPU by setting
    # pallas_decode.FORCE_INTERPRET_FUSED (interpret-mode kernels).
    from multiverse_tpu.ops import pallas_decode

    fused = (compute_dtype == jnp.bfloat16
             and cfg.allow_pallas
             and pallas_decode.fused_decode_available()
             and use_gnn and not save_states)
    # two-stage selection needs the dominance precondition: rank
    # penalty non-positive (gamma <= 1) and K candidates per beam
    twostage = (cfg.beam_select == "twostage" and K <= HW
                and (not cfg.diverse_beam or cfg.diverse_gamma <= 1.0))
    select_fn = (select_successors_twostage if twostage
                 else select_successors_dense)
    # opt-in int8 gate matmul (2x the bf16 MXU peak); quantized
    # operands are precomputed ONCE here, outside the scan.
    # "int8" = single fused matmul with static scales;
    # "int8_dyn" = split matmuls with per-row dynamic scales.
    quant8 = fused and cfg.decode_quant in ("int8", "int8a", "int8_dyn")
    if quant8:
        quant, q8_step = pallas_decode.select_quant(
            cfg.decode_quant, cell_p, emb_table)

    def step(carry, t):
        state, prev_ids, prev_parents, logprob = carry
        if fused:
            # the beam reorder rides the kernel's HBM reads: program i
            # reads its parent's state block and its id's embedding-
            # table row directly (scalar-prefetch index maps), so no
            # separate [N·K, h, w, D] gather pass exists at all
            flat_parents = (
                jnp.arange(N, dtype=jnp.int32)[:, None] * K
                + prev_parents).reshape(-1)
            if quant8:
                out, new_state_f, logits_t = q8_step(
                    quant, cell_p["bias"], h2g_p,
                    prev_ids.reshape(-1), flat_parents,
                    ConvLSTMState(c=_fold(state.c),
                                  h=_fold(state.h)),
                    scene_nk, h, w,
                    interpret=pallas_decode.fused_decode_interpret())
            else:
                out, new_state_f, logits_t = \
                    pallas_decode.decode_step_pallas_gathered(
                        cell_p, h2g_p, prev_ids.reshape(-1), flat_parents,
                        emb_table,
                        ConvLSTMState(c=_fold(state.c), h=_fold(state.h)),
                        scene_nk, h, w,
                        interpret=pallas_decode.fused_decode_interpret())
        else:
            emb = emb_table[prev_ids.reshape(-1)]
            # --- GNN residual on hidden, then embed + cell (folded)
            hh = _fold(state.h)
            if use_gnn:
                # pallas kernel on TPU bf16, exact jnp 9-neighbor
                # reformulation elsewhere (see ops/gnn.py)
                hh = hh + gnn_step_auto(
                    hh, scene_nk, compute_dtype=compute_dtype,
                    allow_pallas=cfg.allow_pallas)
            out, new_state_f = convlstm_step(
                cell_p, emb, ConvLSTMState(c=_fold(state.c), h=hh),
                compute_dtype=compute_dtype,
            )
            logits_t = conv2d(h2g_p, out, compute_dtype=compute_dtype)
        logits_t = logits_t.reshape(N, K, HW)

        # --- accumulate scores + top-K successor selection
        new_logprob, ids, parents = select_fn(
            logprob, logits_t, K, t, cfg.diverse_beam, cfg.diverse_gamma)
        new_logprob = jnp.where(t + 1 <= cfg.fix_num_timestep,
                                jnp.zeros_like(new_logprob), new_logprob)

        # --- freeze finished samples (variable pred_length batching)
        if pred_length is not None:
            fin = (t >= pred_length)[:, None]
            new_logprob = jnp.where(fin, logprob, new_logprob)
            parents = jnp.where(fin, beam_iota, parents)
            ids = jnp.where(fin, 0, ids)

        # --- reorder beam states by parent, build next input
        new_state = ConvLSTMState(
            c=new_state_f.c.reshape((N, K) + new_state_f.c.shape[1:]),
            h=new_state_f.h.reshape((N, K) + new_state_f.h.shape[1:]),
        )
        if fused:
            # carry the kernel output un-reordered; the NEXT step's
            # kernel reads through `parents`.  No state freeze for
            # finished samples: with identity parents their state
            # keeps evolving, but every observable output past
            # pred_length (logits, ids, states) is sliced away by the
            # consumers (inference.py reconstruction, the evaluators).
            # This exact wiring runs under CI via interpret-mode
            # kernels (test_fused_beam_wiring_matches_per_sample).
            carry_parents = parents
        else:
            new_state = ConvLSTMState(
                c=_gather_beams(new_state.c, parents),
                h=_gather_beams(new_state.h, parents),
            )
            if pred_length is not None:
                keep = fin.reshape(N, 1, 1, 1, 1)
                new_state = ConvLSTMState(
                    c=jnp.where(keep, state.c, new_state.c),
                    h=jnp.where(keep, state.h, new_state.h),
                )
            carry_parents = beam_iota
        emit = (ids, parents, logits_t)
        if save_states:
            emit = emit + (out.reshape(N, K, h, w, D),)
        return (new_state, ids, carry_parents, new_logprob), emit

    (_, _, _, final_logprobs), emits = jax.lax.scan(
        step, (state0, ids0, beam_iota, logprob0), jnp.arange(T_pred)
    )
    all_ids, all_parents, all_logits = emits[:3]  # [T, N, K(, HW)]
    all_states = emits[3] if save_states else None

    # ---- backtrace (reverse scan; reference: :689-771)
    def back(parents_carry, t_emit):
        ids_t, parents_t, logits_t = t_emit[:3]
        sel_ids = jnp.take_along_axis(ids_t, parents_carry, axis=1)
        sel_logits = _gather_beams(logits_t, parents_carry)
        outs = (sel_ids, sel_logits)
        if save_states:
            outs = outs + (_gather_beams(t_emit[3], parents_carry),)
        new_parents = jnp.take_along_axis(parents_t, parents_carry, axis=1)
        return new_parents, outs

    init_parents = beam_iota
    _, traced = jax.lax.scan(
        back, init_parents,
        emits if save_states else (all_ids, all_parents, all_logits),
        reverse=True,
    )
    final_ids = jnp.moveaxis(traced[0], 0, 2)       # [N, K, T]
    final_logits = jnp.moveaxis(traced[1], 0, 2)    # [N, K, T, HW]
    final_states = (
        jnp.moveaxis(traced[2], 0, 2) if save_states else None
    )

    best = final_logits[:, 0].reshape(N, T_pred, h, w, 1)
    return BeamOutputs(
        best_logits=best,
        logits=final_logits,
        ids=final_ids,
        logprobs=final_logprobs,
        states=final_states,
    )
