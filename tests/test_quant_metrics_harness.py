"""The decode-quant end-metrics harness (bench_quant_metrics.py) is
the experiment that sets the serving default tier; pin its pure-Python
stages so it cannot rot between decision reruns."""

import os
import sys

import numpy as np

# repo root (bench_quant_metrics.py lives there, not in tests/)
sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench_quant_metrics import synth_gt_futures
from multiverse_tpu.eval.multifuture import (
    evaluate_multifuture_nll,
    evaluate_multifuture_trajs,
)
from multiverse_tpu.inference import synthesize_multifuture_inputs

from synthetic import tiny_config


def _inputs(n=6):
    cfg = tiny_config(use_beam_search=True, beam_size=3)
    inputs = synthesize_multifuture_inputs(
        cfg, num_traj=n, seed=7000, max_pred_len=8)
    inputs = inputs._replace(traj_ids=[
        tid if i % 2 else tid.replace("_cam1", "_cam4")
        for i, tid in enumerate(inputs.traj_ids)])
    return cfg, inputs


def test_synth_gt_contract():
    """GT matches the reference pickle contract the evaluators read
    (reference: code/multifuture_eval_trajs.py:27-38): per traj_id a
    dict of futures, each an x_agent_traj of (frame, pid, x, y) rows
    of the trajectory's pred length, starting near the last obs."""
    _, inputs = _inputs()
    gt = synth_gt_futures(inputs, np.random.RandomState(0), n_futures=3)
    assert set(gt) == set(inputs.traj_ids)
    for n, tid in enumerate(inputs.traj_ids):
        assert len(gt[tid]) == 3
        for fut in gt[tid].values():
            rows = fut["x_agent_traj"]
            assert len(rows) == int(inputs.pred_lengths[n])
            assert all(len(r) == 4 for r in rows)
            # first step is one random-walk step from the last obs
            d0 = np.hypot(rows[0][2] - inputs.obs_traj[n, -1, 0],
                          rows[0][3] - inputs.obs_traj[n, -1, 1])
            assert d0 < 250.0


def test_gt_drives_both_evaluators_and_camera_groups():
    """The synthesized GT + renamed ids must produce real numbers in
    BOTH camera groups of BOTH evaluators (the harness averages
    nll_T=1..3, which are the evaluator's 1-based keys)."""
    cfg, inputs = _inputs()
    gt = synth_gt_futures(inputs, np.random.RandomState(1))
    rnd = np.random.RandomState(2)
    K, T = 4, 8
    h, w = cfg.scene_grids[cfg.active_scales[0]]
    preds = {tid: [rnd.rand(T, 2) * 300 for _ in range(K)]
             for tid in inputs.traj_ids}
    prob = {tid: (rnd.randn(1, K, T, h * w).astype(np.float32),
                  rnd.randn(1, K).astype(np.float32))
            for tid in inputs.traj_ids}

    trajs = evaluate_multifuture_trajs(preds, gt_path="", gt_trajs=gt)
    for key in ("minade_45-degree", "minade_top-down", "minade_all",
                "minfde_45-degree", "minfde_top-down", "minfde_all"):
        assert np.isfinite(trajs[key]), key

    nll = evaluate_multifuture_nll(
        prob, gt_path="", gt_trajs=gt, scene_h=h, scene_w=w,
        time_list=(0, 1, 2))
    for t in (1, 2, 3):  # keys are 1-based
        assert np.isfinite(nll[f"nll_T={t}"])
        assert nll[f"count_T={t}"] > 0
