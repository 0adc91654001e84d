"""Round-5 SimAug convergence campaign: demonstrate that the SimAug
flagship objective — multi-view mixup training, `--multiview_exp 3`
(one-step FGSM toward each agent's other camera views, Beta-mixup of
the hardest view's adversarial features with a selected view's clean
features, mixed one-hot labels; reference: SimAug/code/train.py +
pred_models.py multiview tower) — trains to convergence end-to-end,
the same way campaign.py demonstrated it for the base Multiverse
trainer (TRAIN_CURVE_r05.json).

The missing ingredient vs campaign.py is MULTI-VIEW data: SimAug
groups examples by agent across the 4 simulation cameras
(data/multiview.py get_agent_id strips the seq_key's camera token).
This tool generates a genuine 4-camera dataset through the repo's own
chain — one fake-CARLA recording per moment rendered from FOUR rigs
(forking_paths/recorder.py records every rig in the registry list, so
each view's bbox JSON is a real pinhole projection of the same world
trajectories from a different pose), then frames/seg extraction,
anchor TSV prep, and preprocessing, exactly the reference dataset
contracts — and runs the published SimAug recipe on it on chip
(TRAINING.md §2; reference: SimAug/TRAINING.md) with a val eval every
epoch.

Stages (workdir --work, default /root/repo/_campaign_simaug):

    python campaign_simaug.py data      # CPU: 4-camera dataset
    python campaign_simaug.py train     # chip: the published recipe
    python campaign_simaug.py artifact  # collect SIMAUG_CURVE_r05.json
    python campaign_simaug.py all

Dataset dims are campaign.py's (camera 192x108, model scene 36x64,
obs 8 / pred 12 — the published SimAug sim data uses obs 12 / pred 16;
the schedule here is what differs, not the algorithm).
"""

from __future__ import annotations

import argparse
import json
import math
import os
import re
import subprocess
import sys
import time

import numpy as np

from campaign import (
    CAM_H,
    CAM_W,
    DROP,
    OBS_LEN,
    PRED_LEN,
    _run,
    rows_from_xy,
    walk_init,
    walk_steps,
)

REPO = os.path.dirname(os.path.abspath(__file__))

# four rigs over the same ±7 m walking area: one straight-down anchor
# view plus three oblique views at 40° pitch from different sides —
# every rig sees every walker (verified by the data-stage assertions),
# but each projects a genuinely different pixel trajectory
CAMERA_RIGS = [
    {"fov": 90.0, "location_xyz": [0.0, 0.0, 18.0],
     "rotation_pyr": [-90.0, 0.0, 0.0], "width": CAM_W, "height": CAM_H},
    {"fov": 90.0, "location_xyz": [-13.0, 0.0, 11.0],
     "rotation_pyr": [-40.0, 0.0, 0.0], "width": CAM_W, "height": CAM_H},
    {"fov": 90.0, "location_xyz": [13.0, 0.0, 11.0],
     "rotation_pyr": [-40.0, 180.0, 0.0], "width": CAM_W, "height": CAM_H},
    {"fov": 90.0, "location_xyz": [0.0, -13.0, 11.0],
     "rotation_pyr": [-40.0, 90.0, 0.0], "width": CAM_W, "height": CAM_H},
]

# the published SimAug recipe (TRAINING.md §2; reference:
# SimAug/TRAINING.md "experiment 3") at campaign.py's model dims
SIMAUG_MODEL = [
    "--obs_len", str(OBS_LEN), "--pred_len", str(PRED_LEN),
    "--emb_size", "32",
    "--enc_hidden_size", "256", "--dec_hidden_size", "256",
    "--activation_func", "tanh", "--scene_h", "36", "--scene_w", "64",
    "--scene_conv_kernel", "3", "--scene_conv_dim", "64",
    "--scene_grid_strides", "2,4", "--use_grids", "1,0",
    "--video_h", str(CAM_H), "--video_w", str(CAM_W),
    "--use_gnn", "--use_scene_enc", "--train_w_onehot",
    "--scene_class", "11",
]
SIMAUG_TRAIN = [
    "--batch_size", "12", "--init_lr", "0.3",
    "--wd", "0.001", "--learning_rate_decay", "0.95",
    "--num_epoch_per_decay", "2.0", "--grid_loss_weight", "1.0",
    "--grid_reg_loss_weight", "0.2", "--val_grid_num", "0",
    "--multiview_train", "--multiview_exp", "3", "--adv_use_fgsm",
    "--use_mixup", "--mixup_alpha", "1.0", "--adv_epsilon", "0.1",
    "--double_weighting", "--fl_gamma", "1.0",
]


# ----------------------------------------------------------- data stage


def stage_data(work, args):
    sys.path.insert(0, REPO)
    from tests import fake_carla
    fake_carla.install()

    from multiverse_tpu.cli import preprocess as preprocess_cli
    from multiverse_tpu.cli.vis_dataset import record_moments_main
    from multiverse_tpu.forking_paths.controls import traj_to_controls
    from multiverse_tpu.forking_paths.prepared_data import (
        extract_frames_and_seg,
        load_frame_data,
        prepare_anchor_split,
    )

    rnd = np.random.RandomState(args.data_seed)
    registry = {
        "scenes": {"zara01": {"map": "Town03_ethucy", "fps": 25.0,
                              "static_cars": [], "weather": {}}},
        "cameras": {"recording": {"zara01": CAMERA_RIGS}},
    }
    reg_path = os.path.join(work, "registry.json")
    os.makedirs(work, exist_ok=True)
    with open(reg_path, "w") as f:
        json.dump(registry, f)

    def moment(mid, rows_all):
        controls, _ = traj_to_controls(
            np.asarray(rows_all, np.float64), -1, -1, 25.0)
        return {"scenename": "zara01", "moment_id": mid,
                "ped_controls": controls, "vehicle_controls": {},
                "x_agents": {"1": []}}

    n_cams = len(CAMERA_RIGS)
    moments, split_names = [], {"train": [], "val": []}
    n_moments = {"train": args.train_moments, "val": args.val_moments}
    midx = 500
    for split in ("train", "val"):
        for _ in range(n_moments[split]):
            rows = []
            for pid in range(1, args.peds + 1):
                st = walk_init(rnd)
                rows += rows_from_xy(
                    walk_steps(rnd, st, args.samples), pid)
            mid = "zara01_%d_1_0_a" % midx
            midx += 1
            moments.append(moment(mid, rows))
            split_names[split] += [
                "%s_cam%d" % (mid, c + 1) for c in range(n_cams)]

    moment_json = os.path.join(work, "moments.json")
    with open(moment_json, "w") as f:
        json.dump(moments, f, default=float)
    ds = os.path.join(work, "dataset")
    t0 = time.time()
    record_moments_main([moment_json, ds, "--scene_registry", reg_path])
    print("recorded %d moments x %d cams in %.0fs" % (
        len(moments), n_cams, time.time() - t0))

    # sanity: every rig sees the walkers, and the views genuinely
    # differ (per-frame box centers of cam1 vs each oblique rig)
    mid0 = split_names["train"][0][:-5]
    centers = {}
    for c in range(n_cams):
        v = "%s_cam%d" % (mid0, c + 1)
        fd = load_frame_data(os.path.join(ds, "bbox", "%s.json" % v))
        assert len(fd) > args.samples * DROP - 2 * DROP, (v, len(fd))
        per_frame = {fid: {b["track_id"]: np.asarray(b["bbox"][:2])
                           for b in boxes} for fid, boxes in fd.items()}
        n_boxes = sum(len(b) for b in per_frame.values())
        assert n_boxes >= 0.9 * len(per_frame) * args.peds, (
            "rig %d loses walkers: %d boxes over %d frames x %d peds"
            % (c + 1, n_boxes, len(per_frame), args.peds))
        centers[c] = per_frame
    fid0 = sorted(centers[0])[len(centers[0]) // 2]
    for c in range(1, n_cams):
        shared = set(centers[0][fid0]) & set(centers[c][fid0])
        assert shared, "no shared walkers between rig 1 and %d" % (c + 1)
        d = np.mean([np.abs(centers[0][fid0][t]
                            - centers[c][fid0][t]).max()
                     for t in shared])
        assert d > 5.0, ("rig %d projects like rig 1 (mean |d|=%.1f px) "
                         "— camera pose ignored?" % (c + 1, d))

    # frames + scene seg per view video
    scene_dir = os.path.join(work, "anchor_scene_seg")
    frames_dir = os.path.join(work, "frames")
    for v in sum(split_names.values(), []):
        fd = load_frame_data(os.path.join(ds, "bbox", "%s.json" % v))
        ids = sorted(fd)[::DROP]
        ok = extract_frames_and_seg(
            os.path.join(ds, "videos", "%s.mp4" % v),
            os.path.join(ds, "videos_seg", "%s.mp4" % v),
            ids, frames_dir, os.path.join(scene_dir, v), v,
            start=0, scene_h=36, scene_w=64)
        assert ok, v

    id2name = os.path.join(work, "scene_id2name.json")
    oldid2new = {"13": 1}
    for i, filler in enumerate((1, 2, 3, 4, 5, 6, 7, 8, 9)):
        oldid2new[str(filler)] = i + 2
    with open(id2name, "w") as f:
        json.dump({"oldid2new": oldid2new,
                   "id2name": {str(v): "class%s" % k
                               for k, v in oldid2new.items()}}, f)

    anchor_out = os.path.join(work, "anchor")
    for split in ("train", "val"):
        counts = prepare_anchor_split(
            ds, split_names[split], anchor_out, split,
            drop_frame=DROP, min_frames=OBS_LEN + PRED_LEN)
        assert len(counts) == len(split_names[split]), (split, counts)

    prepro = os.path.join(work, "prepro")
    preprocess_cli.main([
        os.path.join(anchor_out, "traj_2.5fps"), prepro,
        "--obs_len", str(OBS_LEN), "--pred_len", str(PRED_LEN),
        "--add_grid", "--add_all_reg", "--add_scene",
        "--scene_feat_path", scene_dir,
        "--scene_id2name", id2name, "--direct_scene_feat",
        "--scene_h", "36", "--scene_w", "64",
        "--video_h", str(CAM_H), "--video_w", str(CAM_W),
        "--grid_strides", "2,4",
    ])

    # the multiview grouping must see real cross-camera views: assert
    # a 4-view agent group exists in the training npz
    from multiverse_tpu.data.multiview import get_agent_id
    with np.load(os.path.join(prepro, "data_train.npz"),
                 allow_pickle=True) as z:
        keys = [str(k) for k in z["traj_key"]]
        n_train = len(keys)
    with np.load(os.path.join(prepro, "data_val.npz"),
                 allow_pickle=True) as z:
        n_val = len(z["traj_key"])
    group_sizes = {}
    for k in keys:
        aid = get_agent_id(k)
        group_sizes[aid] = group_sizes.get(aid, 0) + 1
    sizes = np.asarray(sorted(group_sizes.values()))
    frac4 = float((sizes == n_cams).mean())
    assert frac4 > 0.5, (
        "only %.0f%% of agent groups have all %d views" % (
            100 * frac4, n_cams))
    meta = {
        "prepro": prepro, "id2name": id2name,
        "n_train": n_train, "n_val": n_val, "n_cams": n_cams,
        "agent_groups": len(group_sizes), "frac_full_groups": frac4,
        "data_seed": args.data_seed,
        "steps_per_epoch": int(math.ceil(n_train / 12)),
    }
    with open(os.path.join(work, "meta.json"), "w") as f:
        json.dump(meta, f, indent=1)
    print("data stage done:", json.dumps(meta, indent=1))


# ---------------------------------------------------------- train stage


def _meta(work):
    with open(os.path.join(work, "meta.json")) as f:
        return json.load(f)


def stage_train(work, args):
    meta = _meta(work)
    model_flags = list(SIMAUG_MODEL)
    if args.smoke:
        # plumbing-validation dims (CPU smoke): same graph structure,
        # small enough to compile/run off-chip in seconds
        small = {"--enc_hidden_size": "32", "--dec_hidden_size": "32",
                 "--scene_conv_dim": "16", "--emb_size": "8"}
        for i, tok in enumerate(model_flags):
            if tok in small:
                model_flags[i + 1] = small[tok]
    cmd = [
        sys.executable, "-m", "multiverse_tpu.cli.train_simaug",
        meta["prepro"], os.path.join(work, "runs"), "simaugA",
        "--runId", "0", "--seed", str(args.seed),
        "--num_epochs", str(args.epochs),
        "--save_period", str(meta["steps_per_epoch"]),
        "--compute_dtype", args.dtype,
        *model_flags, *SIMAUG_TRAIN,
    ]
    log = os.path.join(work, "train.log")
    t0 = time.time()
    r = _run(cmd, log)
    assert r.returncode == 0, "simaug train failed, see %s" % log
    print("simaug train done in %.0fs" % (time.time() - t0))


# -------------------------------------------------------- artifact stage

_LINE = re.compile(
    r"^step (\d+): loss\(ma\)=([\d.eE+-]+) ([\d.eE+-]+) steps/s \| "
    r"val (\S+)=([\d.eE+-]+)")


def _parse_curve(log_path):
    curve, best = [], float("inf")
    metric = None
    with open(log_path) as f:
        for line in f:
            m = _LINE.match(line.strip())
            if not m:
                continue
            step, loss_ma, sps, metric, val = m.groups()
            val = float(val)
            is_best = val < best
            best = min(best, val)
            curve.append({"step": int(step), "loss_ma": float(loss_ma),
                          "steps_per_sec": float(sps), metric: val,
                          "is_best": is_best})
    return metric, curve


def stage_artifact(work, args):
    meta = _meta(work)
    metric, curve = _parse_curve(os.path.join(work, "train.log"))
    assert curve, "no eval lines parsed from train.log"
    run_dir = os.path.join(work, "runs", "simaugA", "00")
    with open(os.path.join(run_dir, "val_perf.json")) as f:
        best = json.load(f)["best"]
    first, last = curve[0], curve[-1]
    artifact = {
        "experiment": "round-5 SimAug convergence campaign: the "
                      "published multiview-mixup recipe "
                      "(--multiview_exp 3 --adv_use_fgsm --use_mixup "
                      "--double_weighting) on a generated 4-camera "
                      "fake-CARLA dataset, bf16 on one v5e chip",
        "dataset": {k: meta[k] for k in
                    ("n_train", "n_val", "n_cams", "agent_groups",
                     "frac_full_groups", "steps_per_epoch")},
        "epochs": args.epochs,
        "command_flags": SIMAUG_MODEL + SIMAUG_TRAIN,
        "curve": curve,
        "best": best,
        "convergence": {
            "metric": metric,
            "first_eval": first[metric], "final_eval": last[metric],
            "improvement_x": first[metric] / max(last[metric], 1e-9),
            "loss_first": first["loss_ma"], "loss_final": last["loss_ma"],
            "best_flips": sum(1 for c in curve if c["is_best"]),
            "steps_per_sec_median": float(np.median(
                [c["steps_per_sec"] for c in curve])),
        },
    }
    out = os.path.join(REPO, "SIMAUG_CURVE_r05.json")
    with open(out, "w") as f:
        json.dump(artifact, f, indent=1)
    print(json.dumps({"out": out,
                      "convergence": artifact["convergence"]}, indent=1))


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("stage", choices=["data", "train", "artifact", "all"])
    ap.add_argument("--work",
                    default=os.path.join(REPO, "_campaign_simaug"))
    ap.add_argument("--data_seed", type=int, default=23)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--epochs", type=int, default=10)
    ap.add_argument("--dtype", default="bfloat16",
                    help="compute dtype; CPU smoke runs need float32")
    ap.add_argument("--train_moments", type=int, default=6)
    ap.add_argument("--val_moments", type=int, default=1)
    ap.add_argument("--peds", type=int, default=10)
    ap.add_argument("--samples", type=int, default=40,
                    help="2.5 fps world samples per walker")
    ap.add_argument("--smoke", action="store_true",
                    help="shrink the model dims for a CPU plumbing "
                         "check (the artifact run uses the flagship "
                         "dims)")
    args = ap.parse_args()
    stages = (["data", "train", "artifact"]
              if args.stage == "all" else [args.stage])
    for stage in stages:
        globals()["stage_" + stage](args.work, args)


if __name__ == "__main__":
    main()
