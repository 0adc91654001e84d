"""Diverse beam search tests.

The risky logic (top-k over K·HW, diversity penalty, parent gathering,
backtrace, variable-length freezing) is validated against a literal
numpy mirror of the reference algorithm
(reference: code/pred_models.py:474-806) that reuses the already-tested
jax cell/conv/gnn ops for the neural pieces.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multiverse_tpu.geometry import one_hot_grid
from multiverse_tpu.models import diverse_beam_search, init_params, model_forward
from multiverse_tpu.models.beam_search import add_diversity_penalty
from multiverse_tpu.ops import ConvLSTMState, conv2d, convlstm_step, gnn_neighbor_mask, gnn_step
from multiverse_tpu.ops.layers import get_activation
from synthetic import make_batch, tiny_config


def _encoder_state(cfg, params, batch):
    """Run the real encoder to get a realistic decoder init state."""
    out = model_forward(params, jax.tree_util.tree_map(jnp.asarray, batch), cfg)
    return out


def _numpy_beam_reference(sp, cfg, first_input, init_state, T, scene_mean):
    """Per-sample (N=1 at a time) beam search transcribing the reference
    loop semantics in plain numpy, calling jax ops eagerly per step."""
    K = cfg.beam_size
    N, h, w, _ = first_input.shape
    HW = h * w
    act = get_activation(cfg.activation)
    mask = jnp.asarray(gnn_neighbor_mask(h, w))

    all_ids = np.zeros((T, N, K), np.int32)
    all_parents = np.zeros((T, N, K), np.int32)
    all_logits = np.zeros((T, N, K, HW), np.float32)

    # tile to beams
    c = np.repeat(np.asarray(init_state.c), K, axis=0)  # [N*K, h, w, D]
    hh = np.repeat(np.asarray(init_state.h), K, axis=0)
    x = np.repeat(np.asarray(first_input), K, axis=0)
    logprob = np.zeros((N, K), np.float32)
    scene_nk = None
    if scene_mean is not None:
        scene_nk = jnp.asarray(np.repeat(np.asarray(scene_mean), K, axis=0))

    for t in range(T):
        # GNN + embed + cell, identical op calls as the jitted version
        hj = jnp.asarray(hh)
        if cfg.use_gnn:
            hj = hj + gnn_step(hj, mask, scene_nk)
        emb = conv2d(sp["dec_class_emb"], jnp.asarray(x), activation=act)
        out, st = convlstm_step(sp["dec_class"], emb,
                                ConvLSTMState(jnp.asarray(c), hj))
        logits = np.asarray(conv2d(sp["h2g_class"], out)).reshape(N, K, HW)

        logp = logits - logits.max(-1, keepdims=True)
        logp = logp - np.log(np.exp(logp).sum(-1, keepdims=True))
        cand = logprob[:, :, None] + logp
        if cfg.diverse_beam:
            cand = np.asarray(
                add_diversity_penalty(jnp.asarray(cand), cfg.diverse_gamma)
            )
        if t == 0:
            flat = cand[:, 0]  # reference: time==1 uses beam 0 only
            idx = np.argsort(-flat, axis=1, kind="stable")[:, :K]
            new_lp = np.take_along_axis(flat, idx, 1)
            ids, parents = idx, np.zeros_like(idx)
        else:
            flat = cand.reshape(N, K * HW)
            idx = np.argsort(-flat, axis=1, kind="stable")[:, :K]
            new_lp = np.take_along_axis(flat, idx, 1)
            ids, parents = idx % HW, idx // HW
        if t + 1 <= cfg.fix_num_timestep:
            new_lp = np.zeros_like(new_lp)

        all_ids[t], all_parents[t] = ids, parents
        all_logits[t] = logits
        logprob = new_lp

        # gather states by parents, next input = one-hot(ids)
        c5 = np.asarray(st.c).reshape(N, K, h, w, -1)
        h5 = np.asarray(st.h).reshape(N, K, h, w, -1)
        c = np.stack([c5[n, parents[n]] for n in range(N)]).reshape(
            N * K, h, w, -1)
        hh = np.stack([h5[n, parents[n]] for n in range(N)]).reshape(
            N * K, h, w, -1)
        x = np.asarray(
            one_hot_grid(jnp.asarray(ids.reshape(-1)), h, w)
        )

    # backtrace (reference: :722-764)
    parents = np.tile(np.arange(K), (N, 1))
    ids_out = np.zeros((T, N, K), np.int32)
    logits_out = np.zeros((T, N, K, HW), np.float32)
    for t in reversed(range(T)):
        for n in range(N):
            ids_out[t, n] = all_ids[t, n, parents[n]]
            logits_out[t, n] = all_logits[t, n, parents[n]]
            parents[n] = all_parents[t, n, parents[n]]
    return (
        np.moveaxis(ids_out, 0, 2),      # [N, K, T]
        np.moveaxis(logits_out, 0, 2),   # [N, K, T, HW]
        logprob,
    )


def _setup(rng, **cfg_kw):
    kw = dict(use_beam_search=True, beam_size=4)
    kw.update(cfg_kw)
    cfg = tiny_config(**kw)
    params = init_params(jax.random.PRNGKey(1), cfg)
    batch, _ = make_batch(rng, cfg, 2)
    jb = jax.tree_util.tree_map(jnp.asarray, batch)

    # build encoder state through the real forward pieces
    from multiverse_tpu.models.multiverse import scene_encode
    from multiverse_tpu.ops import convlstm_scan

    h, w = cfg.scene_grids[0]
    sp = params["scales"]["0"]
    obs_onehot = one_hot_grid(jb.obs_grid_class[:, 0], h, w)
    scene_convs = scene_encode(params, jb.scene_feat, jb.obs_scene, cfg)
    enc_in = scene_convs[0] * obs_onehot
    _, enc_last = convlstm_scan(sp["enc_class"], enc_in)
    scene_mean = jnp.mean(scene_convs[0], axis=1)
    return cfg, sp, obs_onehot[:, -1], enc_last, scene_mean


def test_beam_matches_numpy_reference(rng):
    cfg, sp, first, state, scene_mean = _setup(rng)
    T = 5
    out = diverse_beam_search(sp, cfg, first, state, T, scene_mean=scene_mean)
    want_ids, want_logits, want_lp = _numpy_beam_reference(
        sp, cfg, first, state, T, scene_mean
    )
    np.testing.assert_array_equal(np.asarray(out.ids), want_ids)
    np.testing.assert_allclose(np.asarray(out.logits), want_logits,
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(out.logprobs), want_lp,
                               rtol=1e-4, atol=1e-4)
    # best beam logits = beam 0
    np.testing.assert_allclose(
        np.asarray(out.best_logits).reshape(2, T, -1),
        want_logits[:, 0], rtol=1e-4, atol=1e-4,
    )


def test_beam_diverse_and_fix_timestep(rng):
    cfg, sp, first, state, scene_mean = _setup(
        rng, diverse_beam=True, diverse_gamma=0.01, fix_num_timestep=1
    )
    T = 4
    out = diverse_beam_search(sp, cfg, first, state, T, scene_mean=scene_mean)
    want_ids, want_logits, want_lp = _numpy_beam_reference(
        sp, cfg, first, state, T, scene_mean
    )
    np.testing.assert_array_equal(np.asarray(out.ids), want_ids)
    np.testing.assert_allclose(np.asarray(out.logprobs), want_lp,
                               rtol=1e-4, atol=1e-4)


def test_beam_k1_equals_greedy_argmax(rng):
    cfg, sp, first, state, scene_mean = _setup(rng, beam_size=1)
    from multiverse_tpu.models.multiverse import greedy_decode

    T = 6
    out = diverse_beam_search(sp, cfg, first, state, T, scene_mean=scene_mean)
    logits, _ = greedy_decode(
        sp, cfg, first, state, T,
        emb_name="dec_class_emb", cell_name="dec_class",
        h2g_name="h2g_class", use_gnn=cfg.use_gnn, scene_mean=scene_mean,
        feedback="onehot",
    )
    greedy_ids = np.asarray(jnp.argmax(
        logits.reshape(logits.shape[0], T, -1), -1))
    np.testing.assert_array_equal(np.asarray(out.ids[:, 0]), greedy_ids)
    np.testing.assert_allclose(
        np.asarray(out.best_logits), np.asarray(logits),
        rtol=1e-4, atol=1e-4,
    )


def test_beam_variable_length_freeze(rng):
    """Batched variable-length decode == per-sample exact-length decode."""
    cfg, sp, first, state, scene_mean = _setup(rng)
    T = 6
    lengths = jnp.array([6, 4])
    out = diverse_beam_search(
        sp, cfg, first, state, T, pred_length=lengths, scene_mean=scene_mean
    )
    # sample 1 alone with T=4
    s1 = ConvLSTMState(c=state.c[1:2], h=state.h[1:2])
    out1 = diverse_beam_search(
        sp, cfg, first[1:2], s1, 4, scene_mean=scene_mean[1:2]
    )
    np.testing.assert_array_equal(
        np.asarray(out.ids[1, :, :4]), np.asarray(out1.ids[0])
    )
    np.testing.assert_allclose(
        np.asarray(out.logprobs[1]), np.asarray(out1.logprobs[0]),
        rtol=1e-4, atol=1e-4,
    )
    np.testing.assert_allclose(
        np.asarray(out.logits[1, :, :4]), np.asarray(out1.logits[0]),
        rtol=1e-4, atol=1e-4,
    )


def test_beam_save_states(rng):
    cfg, sp, first, state, scene_mean = _setup(rng)
    out = diverse_beam_search(
        sp, cfg, first, state, 3, scene_mean=scene_mean, save_states=True
    )
    h, w = cfg.scene_grids[0]
    assert out.states.shape == (2, cfg.beam_size, 3, h, w,
                                cfg.dec_hidden_size)


def test_add_diversity_penalty_ranks():
    lp = jnp.asarray([[[0.0, -1.0, -0.5, -2.0]]])
    out = np.asarray(add_diversity_penalty(lp, 0.5))
    import math

    lg = math.log(0.5)
    # ranks: 0.0->0, -0.5->1, -1.0->2, -2.0->3
    np.testing.assert_allclose(
        out[0, 0], [0.0, -1.0 + 2 * lg, -0.5 + lg, -2.0 + 3 * lg], rtol=1e-6
    )


def test_diversity_rank_matches_stable_argsort():
    """The comparison-count ranks must equal stable double-argsort,
    including ties (the t=0 all-equal-logprob rows)."""
    import math as _math

    import jax.numpy as jnp

    from multiverse_tpu.models.beam_search import add_diversity_penalty

    rng = np.random.RandomState(0)
    gamma = 0.01
    cases = [
        rng.randn(4, 6, 17).astype(np.float32),
        np.full((2, 3, 9), -1e30, np.float32),           # all ties
        np.repeat(rng.randn(3, 1, 5).astype(np.float32), 4, axis=1),
    ]
    # mixed ties
    mixed = rng.randn(2, 2, 11).astype(np.float32)
    mixed[..., ::3] = 7.0
    cases.append(mixed)
    for x in cases:
        order = np.argsort(-x, axis=-1, kind="stable")
        ranks = np.argsort(order, axis=-1, kind="stable")
        expected = x + _math.log(gamma) * ranks.astype(np.float32)
        got = np.asarray(add_diversity_penalty(jnp.asarray(x), gamma))
        np.testing.assert_allclose(got, expected, rtol=1e-6, atol=1e-4)


def test_diversity_penalty_fusion_guard_tpu():
    """Allocation bound for add_diversity_penalty at beam shapes: on
    TPU the broadcasted [NK, V, V] compares must fuse to (near-)zero
    temp memory.  XLA-CPU does NOT fuse this (measured ~3.4 GB temp at
    the same shape), so the guard only means something on TPU — in the
    CPU CI mesh it skips; bench.py runs the same check on the real
    chip every round."""
    import jax
    import jax.numpy as jnp
    import pytest

    if jax.default_backend() != "tpu":
        pytest.skip("fusion guard is TPU-specific (CPU materializes)")

    from multiverse_tpu.models.beam_search import add_diversity_penalty

    x = jnp.zeros((1280, 576), jnp.float32)
    compiled = jax.jit(
        lambda x: add_diversity_penalty(x, 0.01)).lower(x).compile()
    ma = compiled.memory_analysis()
    assert ma.temp_size_in_bytes < 64 * 1024 * 1024


def test_fused_beam_wiring_matches_per_sample(rng, monkeypatch):
    """The fused decode path's scan wiring — flat-parent construction,
    un-reordered state carry, variable-length freeze with identity
    parents, backtrace — exercised ON CPU via interpret-mode kernels
    (pallas_decode.FORCE_INTERPRET_FUSED).  Batched fused decode must
    equal per-sample fused decode exactly: both run the same kernel
    with the same rounding, so any difference is a wiring bug."""
    from multiverse_tpu.ops import pallas_decode

    monkeypatch.setattr(pallas_decode, "FORCE_INTERPRET_FUSED", True)
    cfg, sp, first, state, scene_mean = _setup(rng)
    dt = jnp.bfloat16
    T = 6
    lengths = jnp.array([6, 4])
    out = diverse_beam_search(
        sp, cfg, first, state, T, pred_length=lengths,
        scene_mean=scene_mean, compute_dtype=dt)

    for n, t_n in ((0, 6), (1, 4)):
        s_n = ConvLSTMState(c=state.c[n:n + 1], h=state.h[n:n + 1])
        out_n = diverse_beam_search(
            sp, cfg, first[n:n + 1], s_n, t_n,
            scene_mean=scene_mean[n:n + 1], compute_dtype=dt)
        np.testing.assert_array_equal(
            np.asarray(out.ids[n, :, :t_n]), np.asarray(out_n.ids[0]))
        np.testing.assert_allclose(
            np.asarray(out.logprobs[n]), np.asarray(out_n.logprobs[0]),
            rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(
            np.asarray(out.logits[n, :, :t_n]),
            np.asarray(out_n.logits[0]), rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("quant", ["int8", "int8a"])
def test_q8_beam_wiring_interpret(rng, monkeypatch, quant):
    """The int8 fused decode paths (cfg.decode_quant="int8"/"int8a" —
    the latter also quantizes the attention matmuls) on CPU via
    interpret-mode kernels.  Two properties:

    * wiring determinism — batched q8 decode equals per-sample q8
      decode exactly (same kernel, same rounding; any difference is a
      parent/backtrace bug);
    * the quantized operands are actually int8 and the first step's
      candidate scores track the bf16 fused path (before any beam
      divergence can compound)."""
    from multiverse_tpu.ops import pallas_decode

    monkeypatch.setattr(pallas_decode, "FORCE_INTERPRET_FUSED", True)
    cfg, sp, first, state, scene_mean = _setup(rng)
    cfg8 = cfg.replace(decode_quant=quant, compute_dtype="bfloat16")
    dt = jnp.bfloat16
    T = 5
    out8 = diverse_beam_search(
        sp, cfg8, first, state, T, scene_mean=scene_mean,
        compute_dtype=dt)
    out16 = diverse_beam_search(
        sp, cfg, first, state, T, scene_mean=scene_mean,
        compute_dtype=dt)
    # step-0 candidates come from identical (beam 0) inputs in both
    # paths: quantization noise must stay small there
    np.testing.assert_allclose(
        np.asarray(out8.logits[:, :, 0]), np.asarray(out16.logits[:, :, 0]),
        atol=0.1)

    for n in range(first.shape[0]):
        s_n = ConvLSTMState(c=state.c[n:n + 1], h=state.h[n:n + 1])
        out_n = diverse_beam_search(
            sp, cfg8, first[n:n + 1], s_n, T,
            scene_mean=scene_mean[n:n + 1], compute_dtype=dt)
        np.testing.assert_array_equal(
            np.asarray(out8.ids[n]), np.asarray(out_n.ids[0]))
        np.testing.assert_allclose(
            np.asarray(out8.logprobs[n]), np.asarray(out_n.logprobs[0]),
            rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("diverse,gamma", [
    (True, 0.01), (True, 0.5), (True, 1.0), (False, 0.01)])
def test_twostage_select_equals_dense(diverse, gamma):
    """select_successors_twostage == select_successors_dense — winners,
    scores, parents, and TIE ORDER — on tie-heavy inputs (integer-grid
    logits make within-row and cross-beam ties common; distinct raw
    logits differ by >= 1 so the two paths' different log-softmax
    roundings cannot flip any comparison)."""
    from multiverse_tpu.models.beam_search import (
        select_successors_dense,
        select_successors_twostage,
    )

    N, K, HW = 3, 5, 12
    rng = np.random.RandomState(11)
    for trial in range(12):
        logits = jnp.asarray(
            rng.randint(0, 6, (N, K, HW)).astype(np.float32))
        logprob = jnp.asarray(
            rng.randint(0, 4, (N, K)).astype(np.float32) * 0.5)
        for t in (0, 2):
            lp_d, ids_d, par_d = select_successors_dense(
                logprob, logits, K, jnp.asarray(t), diverse, gamma)
            lp_t, ids_t, par_t = select_successors_twostage(
                logprob, logits, K, jnp.asarray(t), diverse, gamma)
            np.testing.assert_array_equal(
                np.asarray(ids_d), np.asarray(ids_t))
            np.testing.assert_array_equal(
                np.asarray(par_d), np.asarray(par_t))
            np.testing.assert_allclose(
                np.asarray(lp_d), np.asarray(lp_t), rtol=1e-5,
                atol=1e-5)
    # a continuous trial (ties measure-zero): float logits
    logits = jnp.asarray(rng.randn(N, K, HW).astype(np.float32) * 3)
    logprob = jnp.asarray(rng.randn(N, K).astype(np.float32))
    lp_d, ids_d, par_d = select_successors_dense(
        logprob, logits, K, jnp.asarray(1), diverse, gamma)
    lp_t, ids_t, par_t = select_successors_twostage(
        logprob, logits, K, jnp.asarray(1), diverse, gamma)
    np.testing.assert_array_equal(np.asarray(ids_d), np.asarray(ids_t))
    np.testing.assert_array_equal(np.asarray(par_d), np.asarray(par_t))
    np.testing.assert_allclose(
        np.asarray(lp_d), np.asarray(lp_t), rtol=1e-5, atol=1e-5)


def test_beam_select_dense_config_matches_twostage_end_to_end(rng):
    """The cfg.beam_select="dense" fallback and the default twostage
    path produce identical decodes through the full beam search."""
    cfg, sp, first, state, scene_mean = _setup(rng)
    T = 6
    out_t = diverse_beam_search(
        sp, cfg, first, state, T, scene_mean=scene_mean)
    out_d = diverse_beam_search(
        sp, cfg.replace(beam_select="dense").validate(), first, state,
        T, scene_mean=scene_mean)
    np.testing.assert_array_equal(np.asarray(out_t.ids),
                                  np.asarray(out_d.ids))
    np.testing.assert_allclose(np.asarray(out_t.logprobs),
                               np.asarray(out_d.logprobs),
                               rtol=1e-5, atol=1e-5)
