"""Multifuture inference: batched beam decode + reference pickle formats."""

import numpy as np
import pytest

from multiverse_tpu.config import MultiverseConfig
from multiverse_tpu.inference import (
    run_multifuture_inference,
    synthesize_multifuture_inputs,
)
from multiverse_tpu.models import init_params

import jax


def tiny_cfg(**kw):
    base = dict(
        scene_h=12, scene_w=16, video_h=540, video_w=960,
        enc_hidden_size=16, dec_hidden_size=16,
        scene_conv_dim=8, emb_size=8,
        scene_grid_strides=(2, 4), use_grids=(True, False),
        use_beam_search=True, beam_size=4,
        diverse_beam=True, diverse_gamma=0.01, fix_num_timestep=1,
    )
    base.update(kw)
    return MultiverseConfig(**base).validate()


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_cfg()
    params = init_params(jax.random.PRNGKey(1), cfg)
    inputs = synthesize_multifuture_inputs(cfg, num_traj=7, max_pred_len=15)
    return cfg, params, inputs


def test_output_formats(setup):
    cfg, params, inputs = setup
    out, prob = run_multifuture_inference(
        params, inputs, cfg, batch_size=4)
    assert set(out) == set(inputs.traj_ids)
    i = cfg.active_scales[0]
    h, w = cfg.scene_grids[i]
    for n, tid in enumerate(inputs.traj_ids):
        T = int(inputs.pred_lengths[n])
        trajs = out[tid]
        # {traj_id: [num_out][T][2]} (reference:
        # code/multifuture_inference.py:519-526)
        assert len(trajs) == cfg.beam_size
        for tr in trajs:
            assert len(tr) == T
            assert np.asarray(tr).shape == (T, 2)
            assert np.isfinite(np.asarray(tr)).all()
        logits, logprobs = prob[tid]
        assert logits.shape == (1, cfg.beam_size, T, h * w)
        assert logprobs.shape == (1, cfg.beam_size)


def test_beams_are_diverse_and_sorted(setup):
    cfg, params, inputs = setup
    out, prob = run_multifuture_inference(
        params, inputs, cfg, batch_size=4)
    tid = inputs.traj_ids[0]
    _, logprobs = prob[tid]
    lp = np.asarray(logprobs[0])
    assert (np.diff(lp) <= 1e-5).all(), "beams must be sorted by logprob"
    trajs = np.asarray([np.asarray(t) for t in out[tid]])
    # at least two distinct hypotheses
    assert np.unique(trajs.round(1), axis=0).shape[0] > 1


def test_greedy_matches_num_out(setup):
    cfg, params, inputs = setup
    out, _ = run_multifuture_inference(
        params, inputs, cfg, batch_size=4, greedy=True)
    tid = inputs.traj_ids[0]
    assert len(out[tid]) == cfg.beam_size
    a = np.asarray(out[tid][0])
    b = np.asarray(out[tid][-1])
    np.testing.assert_array_equal(a, b)  # greedy replicates one traj


def test_batching_invariance(setup):
    """Padding/batch size must not change any trajectory's output."""
    cfg, params, inputs = setup
    out1, _ = run_multifuture_inference(params, inputs, cfg, batch_size=7)
    out2, _ = run_multifuture_inference(params, inputs, cfg, batch_size=3)
    for tid in inputs.traj_ids:
        np.testing.assert_allclose(
            np.asarray(out1[tid]), np.asarray(out2[tid]),
            rtol=1e-4, atol=1e-4)


def test_decode_horizon_invariance(setup):
    """Freezing finished samples makes results independent of the
    static decode horizon T_max (the pad-and-mask replacement for the
    reference's per-sample dynamic pred_length)."""
    cfg, params, inputs = setup
    T = int(inputs.pred_lengths.max())
    out1, prob1 = run_multifuture_inference(
        params, inputs, cfg, batch_size=7, T_max=T)
    out2, prob2 = run_multifuture_inference(
        params, inputs, cfg, batch_size=7, T_max=T + 4)
    for tid in inputs.traj_ids:
        np.testing.assert_allclose(
            np.asarray(out1[tid]), np.asarray(out2[tid]),
            rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(
            prob1[tid][1], prob2[tid][1], rtol=1e-4, atol=1e-4)


def test_save_outputs_roundtrip(tmp_path, setup):
    import pickle

    from multiverse_tpu.inference import save_outputs

    cfg, params, inputs = setup
    out, prob = run_multifuture_inference(params, inputs, cfg, batch_size=4)
    f1 = str(tmp_path / "out.traj.p")
    f2 = str(tmp_path / "out.prob.p")
    save_outputs(out, prob, f1, f2)
    with open(f1, "rb") as f:
        loaded = pickle.load(f)
    assert set(loaded) == set(inputs.traj_ids)
    with open(f2, "rb") as f:
        loaded_p = pickle.load(f)
    assert set(loaded_p) == set(inputs.traj_ids)


def test_need_prob_false_and_input_validation(tmp_path, setup):
    """need_prob=False never computes the logit tensor and returns an
    empty beam_prob; unknown prob_fetch_dtype is a loud ValueError; and
    save_outputs refuses a .prob.p request with an empty beam_prob
    (silent empty pickles only fail hours later in the evaluator) but
    creates missing parent dirs for BOTH outputs otherwise."""
    from multiverse_tpu.inference import save_outputs

    cfg, params, inputs = setup
    out, prob = run_multifuture_inference(
        params, inputs, cfg, batch_size=4, need_prob=False)
    assert prob == {} and set(out) == set(inputs.traj_ids)

    with pytest.raises(ValueError, match="prob_fetch_dtype"):
        run_multifuture_inference(
            params, inputs, cfg, batch_size=4, prob_fetch_dtype="fp16")

    with pytest.raises(ValueError, match="beam_prob is empty"):
        save_outputs(out, {}, str(tmp_path / "x.traj.p"),
                     str(tmp_path / "x.prob.p"))

    out2, prob2 = run_multifuture_inference(
        params, inputs, cfg, batch_size=4)
    save_outputs(out2, prob2, str(tmp_path / "a" / "o.traj.p"),
                 str(tmp_path / "b" / "o.prob.p"))
    assert (tmp_path / "b" / "o.prob.p").exists()


def test_prob_fetch_dtype_f16(setup):
    """prob_fetch_dtype="float16" halves the device->host logit
    transfer but must keep the pickle contract: stored arrays stay
    f32, trajectories are bit-identical (the cast rides only the
    .prob.p fetch), and the f16 round-trip perturbs logits by no more
    than f16 resolution at the logits' magnitude."""
    cfg, params, inputs = setup
    out32, prob32 = run_multifuture_inference(
        params, inputs, cfg, batch_size=4)
    out16, prob16 = run_multifuture_inference(
        params, inputs, cfg, batch_size=4, prob_fetch_dtype="float16")
    for tid in inputs.traj_ids:
        np.testing.assert_array_equal(
            np.asarray(out32[tid]), np.asarray(out16[tid]))
        l32, p32 = prob32[tid]
        l16, p16 = prob16[tid]
        assert l16.dtype == np.float32 and p16.dtype == np.float32
        np.testing.assert_array_equal(p32, p16)
        scale = max(1.0, float(np.abs(l32).max()))
        assert np.abs(l32 - l16).max() <= 1e-3 * scale


def test_step_cache_reused_across_calls(setup):
    """Repeated driver calls at one config must reuse ONE jitted step
    (a fresh jax.jit closure per call re-traces the decode graph every
    run — ~10 s of per-call overhead on a tunneled backend even with
    the compile itself cached), while a different config must get its
    own entry; results are unchanged either way."""
    from multiverse_tpu import inference as inf

    cfg, params, inputs = setup
    inf._STEP_CACHE.clear()
    out1, _ = run_multifuture_inference(params, inputs, cfg, batch_size=4)
    assert len(inf._STEP_CACHE) == 1
    (key1, fn1), = inf._STEP_CACHE.items()
    out2, _ = run_multifuture_inference(params, inputs, cfg, batch_size=4)
    assert len(inf._STEP_CACHE) == 1
    assert inf._STEP_CACHE[key1] is fn1          # reused, not rebuilt
    for tid in inputs.traj_ids:
        np.testing.assert_array_equal(
            np.asarray(out1[tid]), np.asarray(out2[tid]))

    # output gating is part of the key: need_prob=False is a DIFFERENT
    # graph (the logit accumulation is dropped), not a cache hit
    run_multifuture_inference(
        params, inputs, cfg, batch_size=4, need_prob=False)
    assert len(inf._STEP_CACHE) == 2

    # a different config (greedy) adds a third; the FIFO bound holds
    run_multifuture_inference(
        params, inputs, cfg, batch_size=4, greedy=True, need_prob=False)
    assert len(inf._STEP_CACHE) == 3
    assert len(inf._STEP_CACHE) <= inf._STEP_CACHE_MAX
