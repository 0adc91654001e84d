"""Offline featurization driver.

reference: code/preprocess.py:22-78 CLI — turns per-video trajectory
TSVs into data_{train,val,test}.npz with grid labels, dense regression
targets, and scene-semantic features.
"""

from __future__ import annotations

import argparse

from multiverse_tpu.data.preprocess import PreprocessOptions, preprocess_split


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("traj_path")
    parser.add_argument("out_path")
    parser.add_argument("--obs_len", type=int, default=8)
    parser.add_argument("--pred_len", type=int, default=12)
    parser.add_argument("--min_ped", type=int, default=0)
    parser.add_argument("--add_grid", action="store_true")
    parser.add_argument("--add_all_reg", action="store_true")
    parser.add_argument("--add_scene", action="store_true")
    parser.add_argument("--add_kp", action="store_true")
    parser.add_argument("--add_person_box", action="store_true")
    parser.add_argument("--add_other_box", action="store_true")
    parser.add_argument("--add_activity", action="store_true")
    parser.add_argument("--scene_feat_path", default=None)
    parser.add_argument("--scene_map_path", default=None)
    parser.add_argument("--scene_id2name", default=None)
    parser.add_argument("--direct_scene_feat", action="store_true")
    parser.add_argument("--kp_path", default=None)
    parser.add_argument("--person_box_path", default=None)
    parser.add_argument("--person_boxkey2id_p", default=None)
    parser.add_argument("--other_box_path", default=None)
    parser.add_argument("--activity_path", default=None)
    parser.add_argument("--scene_h", type=int, default=36)
    parser.add_argument("--scene_w", type=int, default=64)
    parser.add_argument("--video_h", type=int, default=1080)
    parser.add_argument("--video_w", type=int, default=1920)
    parser.add_argument("--grid_strides", default="2,4")
    parser.add_argument("--feature_no_split", action="store_true")
    parser.add_argument("--reverse_xy", action="store_true")
    parser.add_argument("--traj_pixel_lst", default=None)
    return parser


def main(argv=None) -> None:
    args = build_parser().parse_args(argv)
    opts = PreprocessOptions(
        obs_len=args.obs_len, pred_len=args.pred_len,
        min_ped=args.min_ped,
        add_grid=args.add_grid, add_all_reg=args.add_all_reg,
        add_scene=args.add_scene, add_kp=args.add_kp,
        add_person_box=args.add_person_box,
        add_other_box=args.add_other_box,
        add_activity=args.add_activity,
        scene_feat_path=args.scene_feat_path,
        scene_map_path=args.scene_map_path,
        scene_id2name=args.scene_id2name,
        direct_scene_feat=args.direct_scene_feat,
        kp_path=args.kp_path,
        person_box_path=args.person_box_path,
        person_boxkey2id_p=args.person_boxkey2id_p,
        other_box_path=args.other_box_path,
        activity_path=args.activity_path,
        scene_h=args.scene_h, scene_w=args.scene_w,
        video_h=args.video_h, video_w=args.video_w,
        grid_strides=args.grid_strides,
        feature_no_split=args.feature_no_split,
        reverse_xy=args.reverse_xy,
        traj_pixel_lst=args.traj_pixel_lst,
    )
    import os

    for split in ("train", "val", "test"):
        preprocess_split(
            args.traj_path, split,
            os.path.join(args.out_path, "data_%s.npz" % split), opts)


if __name__ == "__main__":
    main()
