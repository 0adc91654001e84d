"""Visualization primitives (no video IO)."""

import numpy as np

from multiverse_tpu.vis import (
    heatmap_overlay,
    plot_traj,
    rasterize_polylines,
    render_multifuture_frame,
    render_output_frame,
)


def test_rasterize_polylines():
    layer = rasterize_polylines(
        [[(10, 10), (50, 10)]], imgh=64, imgw=64)
    assert layer.shape == (64, 64)
    # the segment row is lit between the endpoints (round-1 indexing)
    assert layer[9, 9:49].sum() > 30
    assert layer.sum() < 64  # only one row touched
    # out-of-frame points clamp instead of erroring
    layer = rasterize_polylines(
        [[(-5, -5), (500, 500)]], imgh=64, imgw=64)
    assert layer[0, 0] == 1.0 and layer[63, 63] == 1.0


def test_heatmap_and_overlays():
    frame = np.zeros((64, 64, 3), np.uint8)
    out = heatmap_overlay(frame, [[(10, 10), (50, 50)]])
    assert out.shape == frame.shape
    assert out.sum() > 0  # heat painted

    frame = np.zeros((64, 64, 3), np.uint8)
    out = plot_traj(frame, [(5, 5), (60, 5)], (0, 255, 0))
    assert (out[:, :, 1] > 0).any() and not (out[:, :, 2] > 0).any()


def test_render_multifuture_frame():
    frame = np.zeros((64, 64, 3), np.uint8)
    gt = {
        "f0": {
            "x_agent_traj": [(0, 0, 10.0, 10.0), (1, 0, 20.0, 20.0)],
            "obs_traj": [(0, 0, 5.0, 5.0), (1, 0, 10.0, 10.0)],
        }
    }
    preds = [[(12.0, 12.0), (25.0, 18.0)], [(12.0, 12.0), (8.0, 30.0)]]
    out = render_multifuture_frame(
        frame.copy(), gt, preds, show_obs=True)
    assert (out[:, :, 1] > 0).any()   # green GT
    assert (out[:, :, 2] > 0).any()   # red preds
    out_h = render_multifuture_frame(
        frame.copy(), gt, preds, use_heatmap=True)
    assert out_h.sum() > 0


def test_render_output_frame():
    frame = np.zeros((64, 64, 3), np.uint8)
    obs = np.array([(5.0, 5.0), (15.0, 15.0)])
    gtp = np.array([(15.0, 15.0), (30.0, 30.0)])
    pred = np.array([(15.0, 15.0), (28.0, 35.0)])
    out = render_output_frame(
        frame, obs, gtp, [(pred, (255, 0, 0))])
    assert out.sum() > 0


def test_grid_prob_heatmap_and_grid():
    from multiverse_tpu.geometry import grid_centers
    from multiverse_tpu.vis import draw_grid, grid_prob_heatmap

    frame = np.zeros((72, 128, 3), np.uint8)
    centers = grid_centers(72, 128, 6, 8).reshape(-1, 2)
    probs = np.zeros(48)
    probs[10] = 1.0
    out = grid_prob_heatmap(frame.copy(), probs, centers)
    assert out.shape == frame.shape and out.sum() > 0
    # hottest (reddest in BGR JET) pixel near the hot cell center
    red = out[:, :, 2].astype(np.int32) - out[:, :, 0].astype(np.int32)
    cy, cx = np.unravel_index(red.argmax(), red.shape)
    ex, ey = centers[10]
    assert abs(cx - ex) < 15 and abs(cy - ey) < 15

    gridded = draw_grid(frame.copy(), (6, 8))
    assert (gridded[:, :, 0] > 0).any()


def _write_vis_grid_inputs(tmp_path, use_beam=False):
    """Synthetic eval-output pickle + fake frames for mvt-vis-grid."""
    import os
    import pickle

    import cv2

    from multiverse_tpu.geometry import grid_centers

    rng = np.random.RandomState(3)
    vh, vw, gh, gw = 72, 128, 6, 8
    obs_len, frame_gap, T = 4, 2, 5
    videos = ["VIRAT_S_000001_00_000000_000100",
              "VIRAT_S_040000_00_000000_000100"]  # 0400: excluded scene
    centers = grid_centers(vh, vw, gh, gw).reshape(-1, 2)
    data = {
        "seq_ids": [], "obs_list": [], "pred_gt_list": [],
        "grid0_pred_traj": [], "grid0_class": [], "grid0_gt_class": [],
        "grid_center_0": centers,
    }
    if use_beam:
        data["beam_grid_ids"] = []
        data["beam_logprobs"] = []
    frame_dir = tmp_path / "frames"
    for vid in videos:
        os.makedirs(frame_dir / vid, exist_ok=True)
        for frame_id in (0, 6):
            for pid in (1, 2):
                data["seq_ids"].append(
                    "%s_%d_%d" % (vid, frame_id, pid))
                data["obs_list"].append(
                    rng.uniform(5, 60, (obs_len, 2)))
                data["pred_gt_list"].append(rng.uniform(5, 60, (T, 2)))
                data["grid0_pred_traj"].append(
                    rng.uniform(5, 60, (T, 2)))
                data["grid0_class"].append(
                    rng.randn(T, gh * gw).astype(np.float32))
                data["grid0_gt_class"].append(
                    rng.randint(0, gh * gw, T))
                if use_beam:
                    data["beam_grid_ids"].append(
                        rng.randint(0, gh * gw, (3, T)))
                    data["beam_logprobs"].append(rng.randn(3))
            last_obs = frame_id + (obs_len - 1) * frame_gap
            cv2.imwrite(
                str(frame_dir / vid / ("%s_F_%08d.jpg" % (vid, last_obs))),
                np.zeros((vh, vw, 3), np.uint8))
    outp = tmp_path / "out.p"
    with open(outp, "wb") as f:
        pickle.dump(data, f)
    return str(outp), str(frame_dir), videos


def test_vis_grid_cli(tmp_path, capsys):
    """mvt-vis-grid renders one composite per (video, frame), skips the
    reference's excluded scenes, and honors the filter flags
    (reference: SimAug/code/visualize.py)."""
    import os

    from multiverse_tpu.cli import visualize_grid

    outp, frames, videos = _write_vis_grid_inputs(tmp_path)
    common = [outp, str(tmp_path / "vis"), frames,
              "--obs_len", "4", "--frame_gap", "2",
              "--video_h", "72", "--video_w", "128",
              "--scene_h", "12", "--scene_w", "16"]
    visualize_grid.main(common)
    out0 = tmp_path / "vis" / videos[0]
    # scene 0400 excluded entirely, both frames of scene 0000 rendered
    assert not (tmp_path / "vis" / videos[1]).exists()
    assert sorted(os.listdir(out0)) == [
        "%s_F_%08d.jpg" % (videos[0], fid) for fid in (0, 6)]

    visualize_grid.main(common + ["--only_after_frameid", "3"])
    capsys.readouterr()
    # frame 0 filtered, frame 6 kept (overwritten in place)


def test_vis_grid_cli_beam(tmp_path, capsys):
    """--use_beam_search renders the labelled 3-beam path overlay from
    the beam ids the mvt-test pickle stores."""
    import os

    from multiverse_tpu.cli import visualize_grid

    outp, frames, videos = _write_vis_grid_inputs(tmp_path,
                                                  use_beam=True)
    visualize_grid.main(
        [outp, str(tmp_path / "vis"), frames,
         "--use_beam_search", "--beam_size", "3",
         "--obs_len", "4", "--frame_gap", "2",
         "--video_h", "72", "--video_w", "128",
         "--scene_h", "12", "--scene_w", "16",
         "--only_trackid", "2"])
    capsys.readouterr()
    out0 = tmp_path / "vis" / videos[0]
    assert len(os.listdir(out0)) == 2
