"""Ground-truth dataset visualizers.

    mvt-vis-dataset        render the multi-future GT (all futures of
                           each obs) over the benchmark videos
                           (reference: forking_paths_dataset/code/
                           visualize_multifuture_dataset.py)
    mvt-record-moments     render final moments in CARLA (reference:
                           record_annotation.py; needs carla + server)
"""

from __future__ import annotations

import argparse
import json
import os
import pickle
from glob import glob


def vis_dataset_main(argv=None) -> None:
    import cv2
    import numpy as np

    from multiverse_tpu.vis.trajs import GT_COLOR, OBS_COLOR, plot_traj

    parser = argparse.ArgumentParser()
    parser.add_argument("video_path")
    parser.add_argument("gt_path", help="multifuture GT pickles")
    parser.add_argument("out_video_path")
    parser.add_argument("--drop_frame", type=int, default=1)
    args = parser.parse_args(argv)
    os.makedirs(args.out_video_path, exist_ok=True)

    gt_files = sorted(glob(os.path.join(args.gt_path, "*.p")))
    for gt_file in gt_files:
        obs_key = os.path.splitext(os.path.basename(gt_file))[0]
        with open(gt_file, "rb") as f:
            gt = pickle.load(f)
        video_file = os.path.join(
            args.video_path, "%s.mp4" % obs_key)
        if not os.path.exists(video_file):
            continue
        vcap = cv2.VideoCapture(video_file)
        target = os.path.join(args.out_video_path, obs_key)
        os.makedirs(target, exist_ok=True)
        printed = cur = 0
        while True:
            ok, frame = vcap.read()
            if not ok:
                break
            if cur % args.drop_frame == 0:
                for future_id in gt:
                    pts = [p[2:] for p in gt[future_id]["x_agent_traj"]]
                    frame = plot_traj(frame, pts, GT_COLOR)
                    if "obs_traj" in gt[future_id]:
                        frame = plot_traj(
                            frame,
                            [p[2:] for p in gt[future_id]["obs_traj"]],
                            OBS_COLOR)
                cv2.imwrite(os.path.join(
                    target, "%08d.jpg" % printed), frame)
                printed += 1
            cur += 1
        vcap.release()
    print("visualized %d obs groups" % len(gt_files))


def record_moments_main(argv=None) -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("moment_json", help="final moments from "
                                            "mvt-gen-moments")
    parser.add_argument("out_path")
    parser.add_argument("--scene_registry", default=None,
                        help="scene/camera JSON (default: the packaged "
                             "published Forking Paths calibration)")
    parser.add_argument("--host", default="127.0.0.1")
    parser.add_argument("--port", default=2000, type=int)
    parser.add_argument("--camera_group", default="recording")
    args = parser.parse_args(argv)

    import carla  # requires a CARLA 0.9.6 server

    from multiverse_tpu.forking_paths.recorder import record_moment
    from multiverse_tpu.forking_paths.scenes import (
        default_registry_path,
        load_scene_registry,
    )

    registry = load_scene_registry(
        args.scene_registry or default_registry_path())
    with open(args.moment_json) as f:
        moments = json.load(f)

    client = carla.Client(args.host, args.port)
    client.set_timeout(10.0)
    for moment in moments:
        scene = registry.scenes[moment["scenename"]]
        client.load_world(scene.map)
        rigs = registry.cameras[args.camera_group][moment["scenename"]]
        total = max(int(float(k)) for k in moment["ped_controls"]) + 1
        # the recorded moment is one (pid, destination, annotator)
        # instance: its x-agent pid is encoded in the moment_id
        # ("scene_momentidx_pid_destidx_annotator", reference:
        # record_annotation.py:241-242), NOT the x_agents dict, which
        # lists every annotated pid of the source moment
        moment_id = moment["moment_id"]
        parts = moment_id.split("_")
        if len(parts) >= 5:
            x_agent_pid = float(parts[2])
        else:
            x_agents = list(moment.get("x_agents", {}))
            x_agent_pid = float(x_agents[0]) if x_agents else None
        outputs = record_moment(
            client, scene, rigs,
            moment["ped_controls"], moment["vehicle_controls"],
            total, args.out_path, moment_id,
            x_agent_pid=x_agent_pid)
        print("recorded %s -> %s" % (moment["moment_id"],
                                     sorted(outputs)))


if __name__ == "__main__":
    vis_dataset_main()
