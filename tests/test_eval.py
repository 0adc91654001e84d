"""Evaluator tests: metric math vs independent loop implementations."""

import os
import pickle

import numpy as np
import pytest

from multiverse_tpu.eval.multifuture import (
    evaluate_multifuture_nll,
    evaluate_multifuture_trajs,
)
from multiverse_tpu.eval.sdd import evaluate_sdd, load_resize_records


def _write_gt(tmp_path, traj_id, futures):
    gt = {
        "f%d" % i: {
            "x_agent_traj": [(t, 0, float(x), float(y))
                             for t, (x, y) in enumerate(fut)]
        }
        for i, fut in enumerate(futures)
    }
    with open(os.path.join(tmp_path, "%s.p" % traj_id), "wb") as f:
        pickle.dump(gt, f)
    return gt


def test_minade_perfect_prediction_is_zero(tmp_path, rng):
    futures = [rng.rand(6, 2) * 100 for _ in range(3)]
    _write_gt(tmp_path, "s_0_0_cam1", futures)
    # predictions contain every GT future (padded to max len)
    preds = []
    for fut in futures:
        p = np.concatenate([fut, np.tile(fut[-1:], (6 - len(fut), 1))])
        preds.append(p)
    out = evaluate_multifuture_trajs(
        {"s_0_0_cam1": preds}, str(tmp_path))
    assert out["minade_45-degree"] == pytest.approx(0.0)
    assert out["minfde_45-degree"] == pytest.approx(0.0)
    assert np.isnan(out["minade_top-down"])


def test_minade_loop_reference(tmp_path, rng):
    """Compare against a direct per-element loop implementation."""
    futures = [rng.rand(5, 2) * 50 for _ in range(2)]
    _write_gt(tmp_path, "s_0_0_cam4", futures)
    preds = [rng.rand(5, 2) * 50 for _ in range(4)]
    out = evaluate_multifuture_trajs({"s_0_0_cam4": preds}, str(tmp_path))

    ade_all, fde_all = [], []
    for fut in futures:
        errs = []
        for p in preds:
            d = np.sqrt(((np.asarray(p)[:len(fut)] - fut) ** 2).sum(1))
            errs.append(d)
        sums = [e.sum() for e in errs]
        best = int(np.argmin(sums))
        ade_all.extend(errs[best].tolist())
        lasts = [e[-1] for e in errs]
        fde_all.append(min(lasts))
    assert out["minade_top-down"] == pytest.approx(np.mean(ade_all))
    assert out["minfde_top-down"] == pytest.approx(np.mean(fde_all))
    assert out["minade_all"] == pytest.approx(np.mean(ade_all))


def test_nll_loop_reference(tmp_path, rng):
    h, w = 6, 8
    video_h, video_w = 540, 960
    K, T = 3, 6
    futures = [rng.rand(6, 2) * [video_w - 2, video_h - 2] + 1
               for _ in range(2)]
    _write_gt(tmp_path, "s_0_0_cam1", futures)
    logits = rng.randn(1, K, T, h * w).astype(np.float32)
    logprobs = rng.randn(1, K).astype(np.float32)
    out = evaluate_multifuture_nll(
        {"s_0_0_cam1": (logits, logprobs)}, str(tmp_path),
        scene_h=h, scene_w=w, video_h=video_h, video_w=video_w,
        time_list=(0, 1, 2))

    # independent loop implementation (mirrors the reference evaluator)
    def softmax(x, axis=None):
        x = x - x.max(axis=axis, keepdims=True)
        e = np.exp(x)
        return e / e.sum(axis=axis, keepdims=True)

    probs = softmax(np.squeeze(logprobs))
    beams = softmax(np.squeeze(logits), axis=-1)
    w_gap, h_gap = video_w / w, video_h / h
    for t in (0, 1, 2):
        grid = np.zeros(h * w)
        for b in range(K):
            grid += beams[b, t] * probs[b]
        nll_vals = []
        gt_cells = []
        for fut in futures:
            x, y = fut[t]
            xi = max(int(np.ceil(x / w_gap)), 1) - 1
            yi = max(int(np.ceil(y / h_gap)), 1) - 1
            gt_cells.append(yi * w + xi)
        nll = np.mean([-np.log(grid[c] + np.finfo(float).eps)
                       for c in gt_cells])
        nll_vals.append(nll)
        assert out["nll_T=%d" % (t + 1)] == pytest.approx(
            np.mean(nll_vals), rel=1e-6)
        assert out["count_T=%d" % (t + 1)] == 1


def test_sdd_eval(tmp_path, rng):
    changelst = tmp_path / "change.lst"
    changelst.write_text(
        "videoA_0,1000x2000,True\nvideoB_1,1920x1080,False\n")
    scales = load_resize_records(str(changelst))
    assert scales["videoA_0"] == pytest.approx(
        (2000 / 1920 + 1000 / 1080) / 2)
    assert scales["videoB_1"] == pytest.approx(1.0)

    gt = rng.rand(3, 4, 2) * 100
    pred = gt + 2.0  # constant offset -> per-step error = 2*sqrt(2)
    data = {
        "pred_gt_list": list(gt),
        "grid0_pred_traj": list(pred),
        "seq_ids": ["videoA_0_10_1", "videoB_1_20_2", "videoB_1_30_3"],
    }
    outp = tmp_path / "out.p"
    with open(outp, "wb") as f:
        pickle.dump(data, f)
    res = evaluate_sdd(str(outp), str(changelst))
    base = 2.0 * np.sqrt(2.0)
    expect = base * np.mean([scales["videoA_0"], 1.0, 1.0])
    assert res["ade"] == pytest.approx(expect)
    assert res["fde"] == pytest.approx(expect)
