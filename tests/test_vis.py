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
