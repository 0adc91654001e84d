"""Per-timestep grid-classification heatmaps over video frames.

reference: SimAug/code/visualize.py — for each sequence in an eval
output pickle, render the class head's per-cell probabilities at each
prediction timestep as a heatmap (optionally the grid lines and the
obs/GT/pred trajectories), one jpg per (sequence, t).
"""

from __future__ import annotations

import argparse
import os
import pickle


def main(argv=None) -> None:
    import cv2
    import numpy as np

    from multiverse_tpu.geometry import grid_centers
    from multiverse_tpu.vis.trajs import (
        GT_COLOR,
        OBS_COLOR,
        draw_grid,
        grid_prob_heatmap,
        plot_traj,
    )

    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("outp", help="eval output pickle (mvt-test "
                                     "--save_output)")
    parser.add_argument("vis_path")
    parser.add_argument("video_frame_path",
                        help="videoname/videoname_F_%%08d.jpg frames")
    parser.add_argument("--vis_start", type=int, default=0)
    parser.add_argument("--vis_end", type=int, default=-1)
    parser.add_argument("--show_scene_scale", type=int, default=0)
    parser.add_argument("--show_grid_lines", action="store_true")
    parser.add_argument("--no_pred_traj", action="store_true")
    parser.add_argument("--no_gt_pred", action="store_true")
    parser.add_argument("--only_video", default=None)
    parser.add_argument("--video_h", type=int, default=1080)
    parser.add_argument("--video_w", type=int, default=1920)
    args = parser.parse_args(argv)

    with open(args.outp, "rb") as f:
        data = pickle.load(f)
    os.makedirs(args.vis_path, exist_ok=True)

    scale = args.show_scene_scale
    logits_key = "grid%d_class" % scale
    sample = np.asarray(data[logits_key][0])
    hw = sample.shape[-1]
    # infer the grid shape from the stored centers
    centers = np.asarray(data["grid_center_%d" % scale]).reshape(-1, 2)
    assert len(centers) == hw
    grid_h = int(round((hw * args.video_h / args.video_w) ** 0.5))
    grid_w = hw // grid_h

    end = len(data["seq_ids"]) if args.vis_end < 0 else args.vis_end
    written = 0
    for j in range(args.vis_start, end):
        seq_id = str(data["seq_ids"][j])
        videoname, frame_idx, _ = seq_id.rsplit("_", 2)
        if args.only_video and args.only_video not in videoname:
            continue
        frame_file = os.path.join(
            args.video_frame_path, videoname,
            "%s_F_%08d.jpg" % (videoname, int(frame_idx)))
        if not os.path.exists(frame_file):
            continue
        base = cv2.imread(frame_file)
        logits = np.asarray(data[logits_key][j])      # [T, H*W]
        for t in range(logits.shape[0]):
            probs = np.exp(logits[t] - logits[t].max())
            probs = probs / probs.sum()
            frame = grid_prob_heatmap(base.copy(), probs, centers)
            if args.show_grid_lines:
                frame = draw_grid(frame, (grid_h, grid_w))
            frame = plot_traj(
                frame, np.asarray(data["obs_list"][j]), OBS_COLOR, 3)
            if not args.no_gt_pred:
                frame = plot_traj(
                    frame, np.asarray(data["pred_gt_list"][j]),
                    GT_COLOR, 3)
            if not args.no_pred_traj:
                frame = plot_traj(
                    frame,
                    np.asarray(data["grid%d_pred_traj" % scale][j]),
                    (0, 0, 255), 3)
            cv2.imwrite(os.path.join(
                args.vis_path, "%s_t%02d.jpg" % (seq_id, t)), frame)
            written += 1
    print("wrote %d heatmap frames" % written)


if __name__ == "__main__":
    main()
