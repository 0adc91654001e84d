"""Round-5 convergence campaign (VERDICT r4 #1): demonstrate that
training WORKS end-to-end — not just that it runs.

Every prior artifact rested on 400-step synthetic-data checkpoints.
This tool drives the repo's own L0→L6 chain at a scale where learning
is visible: a structured multi-video dataset is generated through the
fake-CARLA backend (walkers with real kinematics — straight walks,
gentle curves, diverging futures), recorded/extracted/prepared/
preprocessed through the exact dataset contracts the reference
publishes, then `mvt-train` runs the published flagship command
(reference: TRAINING.md Step 2 — batch 20, adadelta lr 0.3, wd 0.001,
grids 2,4 both active) for a real multi-epoch schedule with val evals
every epoch; a second run is SIGKILLed mid-flight and resumed with
`--load`; the best checkpoint drives `mvt-multifuture-inference` and
both our evaluators and the reference's verbatim scripts.

Stages (each writes under --work, default /root/repo/_campaign):

    python campaign.py data      # CPU: generate + prepare the dataset
    python campaign.py train     # chip: run A (uninterrupted)
    python campaign.py resume    # chip: run B, SIGKILL at half, resume
    python campaign.py infer     # chip: best ckpt -> inference -> evals
    python campaign.py artifact  # collect TRAIN_CURVE_r05.json
    python campaign.py all

The dataset/video dims are the recorded camera's (192x108); the model
dims are the published flagship ones (scene 36x64, grids 18x32 + 9x16,
D=256, obs 8 / pred 12).
"""

from __future__ import annotations

import argparse
import json
import math
import os
import pickle
import signal
import subprocess
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.abspath(__file__))
LIM = 7.0          # world-coordinate reflection bound (camera sees ~10m)
CAM_W, CAM_H = 192, 108
DROP = 10          # ethucy drop_frame
MF_START = 32      # ethucy start index (prepared_data.FRAME_RANGE)
OBS_LEN, PRED_LEN = 8, 12

# the published flagship training command, TRAINING.md Step 2
# (scene_class from the generated id2name; video dims are the camera's)
FLAGSHIP_MODEL = [
    "--obs_len", "8", "--pred_len", "12", "--emb_size", "32",
    "--enc_hidden_size", "256", "--dec_hidden_size", "256",
    "--activation_func", "tanh", "--scene_h", "36", "--scene_w", "64",
    "--scene_conv_kernel", "3", "--scene_conv_dim", "64",
    "--scene_grid_strides", "2,4", "--use_grids", "1,1",
    "--video_h", str(CAM_H), "--video_w", str(CAM_W),
    "--use_gnn", "--use_scene_enc", "--train_w_onehot",
    "--scene_class", "11",
]
FLAGSHIP_TRAIN = [
    "--wd", "0.001", "--keep_prob", "1.0", "--batch_size", "20",
    "--init_lr", "0.3", "--learning_rate_decay", "0.95",
    "--num_epoch_per_decay", "2.0", "--grid_loss_weight", "1.0",
    "--grid_reg_loss_weight", "0.2", "--val_grid_num", "0",
]


# --------------------------------------------------------------- walks


def _reflect(state):
    x, y, th = state["x"], state["y"], state["th"]
    if abs(x) > LIM:
        th = math.pi - th
        x = max(-LIM, min(LIM, x))
    if abs(y) > LIM:
        th = -th
        y = max(-LIM, min(LIM, y))
    state.update(x=x, y=y, th=th)


def walk_init(rnd, center_r=None):
    if center_r is None:
        x, y = rnd.uniform(-LIM + 1, LIM - 1, 2)
    else:
        r, a = rnd.uniform(0, center_r), rnd.uniform(0, 2 * math.pi)
        x, y = r * math.cos(a), r * math.sin(a)
    return {
        "x": float(x), "y": float(y),
        "th": float(rnd.uniform(0, 2 * math.pi)),
        # meters per 0.4s sample
        "v": float(rnd.uniform(0.35, 0.7)),
        # 30% of walkers curve gently (deg/sample)
        "om": (math.radians(rnd.uniform(2.0, 6.0)) * rnd.choice([-1, 1])
               if rnd.random() < 0.3 else 0.0),
    }


def walk_steps(rnd, state, n):
    """Advance `state` n samples; returns [n, 2] xy."""
    out = np.zeros((n, 2))
    for i in range(n):
        state["th"] += state["om"] + rnd.normal(0.0, math.radians(3.0))
        state["x"] += state["v"] * math.cos(state["th"]) \
            + rnd.normal(0.0, 0.03)
        state["y"] += state["v"] * math.sin(state["th"]) \
            + rnd.normal(0.0, 0.03)
        _reflect(state)
        out[i] = (state["x"], state["y"])
    return out


def rows_from_xy(xy, pid, frame0=0):
    return [(frame0 + i * DROP, pid, float(p[0]), float(p[1]), 0.5)
            for i, p in enumerate(xy)]


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
        prepare_multifuture_split,
    )

    rnd = np.random.RandomState(args.data_seed)
    registry = {
        "scenes": {"zara01": {"map": "Town03_ethucy", "fps": 25.0,
                              "static_cars": [], "weather": {}}},
        "cameras": {"recording": {"zara01": [
            {"fov": 90.0, "location_xyz": [0.0, 0.0, 18.0],
             "rotation_pyr": [-90.0, 0.0, 0.0],
             "width": CAM_W, "height": CAM_H}]}},
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

    moments, split_names = [], {"train": [], "val": [], "test": []}
    n_anchor = {"train": args.train_moments, "val": args.val_moments,
                "test": args.test_moments}
    midx = 100
    for split in ("train", "val", "test"):
        for _ in range(n_anchor[split]):
            rows = []
            for pid in range(1, args.peds + 1):
                st = walk_init(rnd)
                rows += rows_from_xy(
                    walk_steps(rnd, st, args.anchor_samples), pid)
            mid = "zara01_%d_1_0_a" % midx
            midx += 1
            moments.append(moment(mid, rows))
            split_names[split].append(mid + "_cam1")

    # multi-future groups: shared obs (x-agent pid 1 + context peds),
    # three futures diverging in heading AFTER the observation window
    mf_names, diverge_idx = [], (MF_START + (OBS_LEN + 1) * DROP) // DROP
    for g in range(args.mf_groups):
        ctx_rows = []
        for pid in range(2, 2 + args.mf_other_peds):
            st = walk_init(rnd)
            ctx_rows += rows_from_xy(
                walk_steps(rnd, st, args.mf_samples), pid)
        st0 = walk_init(rnd, center_r=3.0)
        st0["v"] = float(rnd.uniform(0.3, 0.5))
        prefix = walk_steps(rnd, st0, diverge_idx + 1)
        for d, (annot, dth) in enumerate(
                (("a", -40.0), ("b", 0.0), ("c", 40.0))):
            st = dict(st0)
            st["th"] += math.radians(dth)
            branch_rnd = np.random.RandomState(
                args.data_seed + 7919 * g + d)
            tail = walk_steps(branch_rnd, st,
                              args.mf_samples - diverge_idx - 1)
            xy = np.concatenate([prefix, tail], axis=0)
            mid = "zara01_%d_1_%d_%s" % (g, d, annot)
            moments.append(moment(mid, rows_from_xy(xy, 1) + ctx_rows))
            mf_names.append(mid + "_cam1")

    moment_json = os.path.join(work, "moments.json")
    with open(moment_json, "w") as f:
        json.dump(moments, f, default=float)
    ds = os.path.join(work, "dataset")
    t0 = time.time()
    record_moments_main([moment_json, ds, "--scene_registry", reg_path])
    print("recorded %d moments in %.0fs" % (len(moments), time.time() - t0))

    # sanity: boxes move and stay in-frame
    fd = load_frame_data(os.path.join(
        ds, "bbox", "%s.json" % split_names["train"][0]))
    pts = np.asarray([b["bbox"][:2] for fr in fd.values() for b in fr])
    assert len(fd) > args.anchor_samples * DROP - 2 * DROP, len(fd)
    assert pts.std(0).min() > 2.0, "walkers did not move: %s" % pts.std(0)

    # ---- frames + scene seg
    anchor_scene = os.path.join(work, "anchor_scene_seg")
    frames_dir = os.path.join(work, "frames")
    for v in sum(split_names.values(), []):
        fd = load_frame_data(os.path.join(ds, "bbox", "%s.json" % v))
        ids = sorted(fd)[::DROP]
        ok = extract_frames_and_seg(
            os.path.join(ds, "videos", "%s.mp4" % v),
            os.path.join(ds, "videos_seg", "%s.mp4" % v),
            ids, frames_dir, os.path.join(anchor_scene, v), v,
            start=0, scene_h=36, scene_w=64)
        assert ok, v
    mf_scene = os.path.join(work, "mf_scene_seg")
    obs_keys = sorted({"_".join(n.split("_")[:3]) + "_cam1"
                       for n in mf_names})
    for obs_key in obs_keys:
        scene, g, pid, cam = obs_key.split("_")
        src = "%s_%s_%s_0_a_%s" % (scene, g, pid, cam)
        fd = load_frame_data(os.path.join(ds, "bbox", "%s.json" % src))
        ids = sorted(fd)[MF_START::DROP][:OBS_LEN]
        ok = extract_frames_and_seg(
            os.path.join(ds, "videos", "%s.mp4" % src),
            os.path.join(ds, "videos_seg", "%s.mp4" % src),
            ids, frames_dir, os.path.join(mf_scene, obs_key), obs_key,
            start=MF_START, scene_h=36, scene_w=64)
        assert ok, obs_key

    # scene_class table padded to the flagship 11 (unused ids inert)
    id2name = os.path.join(work, "scene_id2name.json")
    oldid2new = {"13": 1}
    for i, filler in enumerate((1, 2, 3, 4, 5, 6, 7, 8, 9)):
        oldid2new[str(filler)] = i + 2
    with open(id2name, "w") as f:
        json.dump({"oldid2new": oldid2new,
                   "id2name": {str(v): "class%s" % k
                               for k, v in oldid2new.items()}}, f)

    # ---- anchor prep (train/val/test TSVs) + multifuture prep (test)
    anchor_out = os.path.join(work, "anchor")
    for split in ("train", "val", "test"):
        counts = prepare_anchor_split(
            ds, split_names[split], anchor_out, split,
            drop_frame=DROP, min_frames=OBS_LEN + PRED_LEN)
        assert len(counts) == len(split_names[split]), (split, counts)
    obs_out = os.path.join(work, "prepared_obs")
    mf_out = os.path.join(work, "multifuture")
    stats = prepare_multifuture_split(
        ds, mf_names, obs_out, mf_out, "test", obs_length=OBS_LEN)
    assert stats["skipped"] == 0, stats
    assert stats["future_len_min"] >= PRED_LEN, stats
    print("multifuture prep:", stats)

    # ---- preprocess at the flagship dims
    prepro = os.path.join(work, "prepro")
    preprocess_cli.main([
        os.path.join(anchor_out, "traj_2.5fps"), prepro,
        "--obs_len", str(OBS_LEN), "--pred_len", str(PRED_LEN),
        "--add_grid", "--add_all_reg", "--add_scene",
        "--scene_feat_path", anchor_scene,
        "--scene_id2name", id2name, "--direct_scene_feat",
        "--scene_h", "36", "--scene_w", "64",
        "--video_h", str(CAM_H), "--video_w", str(CAM_W),
        "--grid_strides", "2,4",
    ])
    with np.load(os.path.join(prepro, "data_train.npz"),
                 allow_pickle=True) as z:
        n_train = len(z["obs_traj"])
    with np.load(os.path.join(prepro, "data_val.npz"),
                 allow_pickle=True) as z:
        n_val = len(z["obs_traj"])
    meta = {
        "prepro": prepro, "anchor_scene": anchor_scene,
        "mf_scene": mf_scene, "obs_out": obs_out, "mf_out": mf_out,
        "id2name": id2name, "n_train": n_train, "n_val": n_val,
        "n_mf_obs": len(obs_keys), "data_seed": args.data_seed,
        "steps_per_epoch": int(math.ceil(n_train / 20)),
    }
    with open(os.path.join(work, "meta.json"), "w") as f:
        json.dump(meta, f, indent=1)
    print("data stage done:", json.dumps(meta, indent=1))


# ---------------------------------------------------------- train stage


def _meta(work):
    with open(os.path.join(work, "meta.json")) as f:
        return json.load(f)


def _train_cmd(work, meta, name, epochs, seed, dtype, extra=()):
    return [
        sys.executable, "-m", "multiverse_tpu.cli.train",
        meta["prepro"], os.path.join(work, "runs"), name,
        "--runId", "0", "--seed", str(seed),
        "--num_epochs", str(epochs),
        "--save_period", str(meta["steps_per_epoch"]),
        "--compute_dtype", dtype,
        *FLAGSHIP_MODEL, *FLAGSHIP_TRAIN, *extra,
    ]


def _run(cmd, log_path, **kw):
    print("+ %s" % " ".join(cmd), flush=True)
    with open(log_path, "a") as log:
        log.write("+ %s\n" % " ".join(cmd))
        log.flush()
        return subprocess.run(cmd, stdout=log, stderr=subprocess.STDOUT,
                              cwd=REPO, **kw)


def stage_train(work, args):
    meta = _meta(work)
    log = os.path.join(work, "train_A.log")
    t0 = time.time()
    r = _run(_train_cmd(work, meta, "campA", args.epochs, args.seed,
                    args.dtype), log)
    assert r.returncode == 0, "train A failed, see %s" % log
    print("run A done in %.0fs" % (time.time() - t0))


def stage_resume(work, args):
    """Run B: same config/seed, SIGKILLed after ~half the epochs'
    checkpoints exist, then resumed with --load for the remaining
    epochs (reference capability: TRAINING.md notes training is
    resumable from `save`)."""
    meta = _meta(work)
    spe = meta["steps_per_epoch"]
    half_epochs = args.epochs // 2
    kill_after_step = half_epochs * spe
    run_dir = os.path.join(work, "runs", "campB", "00")
    log = os.path.join(work, "train_B.log")

    cmd = _train_cmd(work, meta, "campB", args.epochs, args.seed,
                 args.dtype)
    print("+ %s" % " ".join(cmd), flush=True)
    logf = open(log, "a")
    proc = subprocess.Popen(cmd, stdout=logf, stderr=subprocess.STDOUT,
                            cwd=REPO)
    killed_at = None
    try:
        while proc.poll() is None:
            time.sleep(2.0)
            save = os.path.join(run_dir, "save")
            steps = [int(d) for d in os.listdir(save) if d.isdigit()] \
                if os.path.isdir(save) else []
            if steps and max(steps) >= kill_after_step:
                killed_at = max(steps)
                proc.send_signal(signal.SIGKILL)
                proc.wait()
                break
    finally:
        logf.close()
    assert killed_at is not None, \
        "run B finished before the kill point — raise --epochs"
    print("run B SIGKILLed with latest checkpoint at step %d" % killed_at)

    remaining = args.epochs - killed_at // spe
    r = _run(_train_cmd(work, meta, "campB", remaining, args.seed,
                        args.dtype, extra=("--load",)), log)
    assert r.returncode == 0, "run B resume failed, see %s" % log
    with open(os.path.join(work, "resume.json"), "w") as f:
        json.dump({"killed_at_step": killed_at,
                   "resumed_epochs": remaining}, f)


# ---------------------------------------------------------- infer stage


def stage_infer(work, args):
    meta = _meta(work)
    best = os.path.join(work, "runs", "campA", "00", "best")
    results = {}
    tiers = [("f32", ["--compute_dtype", "float32"])]
    if args.dtype == "bfloat16":
        tiers.append(("serving", ["--compute_dtype", "bfloat16",
                                  "--decode_quant", "int8a"]))
    for tier, tier_flags in tiers:
        out_file = os.path.join(work, "camp_%s.traj.p" % tier)
        prob_file = os.path.join(work, "camp_%s.prob.p" % tier)
        cmd = [
            sys.executable, "-m",
            "multiverse_tpu.cli.multifuture_inference",
            best, os.path.join(meta["obs_out"], "traj_2.5fps", "test"),
            os.path.join(meta["mf_out"], "test"), out_file,
            "--save_prob_file", prob_file,
            "--obs_length", str(OBS_LEN), "--num_out", "20",
            "--diverse_beam", "--diverse_gamma", "0.01",
            "--fix_num_timestep", "1",
            # the reference's published flow: trained with both grid
            # scales, decoded with scale 0 active (TESTING.md)
            "--grid_strides", "2,4", "--use_grids", "1,0",
            "--use_gnn", "--use_scene_enc",
            "--scene_feat_path", meta["mf_scene"],
            "--scene_id2name", meta["id2name"],
            "--scene_h", "36", "--scene_w", "64", "--scene_class", "11",
            "--video_h", str(CAM_H), "--video_w", str(CAM_W),
            "--emb_size", "32", "--enc_hidden_size", "256",
            "--dec_hidden_size", "256",
            "--batch_size", "16", *tier_flags,
        ]
        log = os.path.join(work, "infer_%s.log" % tier)
        r = _run(cmd, log)
        assert r.returncode == 0, "inference failed, see %s" % log

        # our evaluator
        ours = subprocess.run(
            [sys.executable, "-m",
             "multiverse_tpu.cli.multifuture_eval_trajs",
             os.path.join(meta["mf_out"], "test"), out_file],
            capture_output=True, text=True, cwd=REPO)
        assert ours.returncode == 0, ours.stderr
        our_vals = [float(x)
                    for x in ours.stdout.strip().splitlines()[-1].split()]
        # the reference evaluator, verbatim
        ref_eval = "/root/reference/code/multifuture_eval_trajs.py"
        ref_vals = None
        if os.path.exists(ref_eval):
            ref = subprocess.run(
                [sys.executable, ref_eval,
                 os.path.join(meta["mf_out"], "test"), out_file],
                capture_output=True, text=True)
            assert ref.returncode == 0, ref.stderr
            ref_vals = [float(x) for x in
                        ref.stdout.strip().splitlines()[-1].split()]
            np.testing.assert_allclose(our_vals, ref_vals, rtol=1e-6,
                                       equal_nan=True)
        nll = subprocess.run(
            [sys.executable, "-m",
             "multiverse_tpu.cli.multifuture_eval_trajs_prob",
             os.path.join(meta["mf_out"], "test"), prob_file,
             "--scene_h", "18", "--scene_w", "32",
             "--video_h", str(CAM_H), "--video_w", str(CAM_W)],
            capture_output=True, text=True, cwd=REPO)
        assert nll.returncode == 0, nll.stderr
        nll_vals = [float(x)
                    for x in nll.stdout.strip().splitlines()[-1].split()]
        results[tier] = {
            "cols": ["ade_45", "ade_td", "ade_all",
                     "fde_45", "fde_td", "fde_all"],
            "ours": our_vals, "reference_evaluator": ref_vals,
            "nll": nll_vals,
        }
        print(tier, json.dumps(results[tier]))
    with open(os.path.join(work, "infer.json"), "w") as f:
        json.dump(results, f, indent=1)


# -------------------------------------------------------- artifact stage


def _curve(run_dir):
    with open(os.path.join(run_dir, "val_perf.json")) as f:
        perf = json.load(f)
    curve = [{"step": e[2], "loss_ma": e[0], "is_best": e[3],
              **{k: v for k, v in e[1].items() if "@T" not in k}}
             for e in perf["val_perf"]]
    return perf["best"], curve


def stage_artifact(work, args):
    meta = _meta(work)
    best_a, curve_a = _curve(os.path.join(work, "runs", "campA", "00"))
    best_b, curve_b = _curve(os.path.join(work, "runs", "campB", "00"))
    with open(os.path.join(work, "resume.json")) as f:
        resume = json.load(f)
    with open(os.path.join(work, "infer.json")) as f:
        infer = json.load(f)

    metric = "grid0_traj_ade"
    first = next(c for c in curve_a if c["loss_ma"] is not None)
    last = curve_a[-1]
    flips = sum(1 for c in curve_a if c["is_best"])
    # "within noise": compare A's final val metric with B's, against
    # the spread of A's own last few evals (converged-plateau noise)
    tail = [c[metric] for c in curve_a[-4:]]
    spread = float(np.std(tail))
    delta = abs(curve_b[-1][metric] - last[metric])
    artifact = {
        "experiment": "round-5 convergence campaign "
                      "(fake-CARLA structured dataset, published "
                      "flagship training command, bf16 on one v5e chip)",
        "dataset": {k: meta[k] for k in
                    ("n_train", "n_val", "n_mf_obs", "steps_per_epoch")},
        "epochs": args.epochs,
        "run_A": {"best": best_a, "curve": curve_a},
        "run_B_resume": {"best": best_b, "curve": curve_b, **resume},
        "convergence": {
            "metric": metric,
            "first_eval": first[metric], "final_eval": last[metric],
            "improvement_x": first[metric] / max(last[metric], 1e-9),
            "loss_first": first["loss_ma"], "loss_final": last["loss_ma"],
            "best_flips": flips,
        },
        "resume_check": {
            "final_A": last[metric], "final_B": curve_b[-1][metric],
            "abs_delta": delta, "plateau_std_A_last4": spread,
            "within_noise": bool(delta <= max(3 * spread,
                                              0.05 * last[metric])),
        },
        "final_inference": infer,
    }
    out = os.path.join(REPO, "TRAIN_CURVE_r05.json")
    with open(out, "w") as f:
        json.dump(artifact, f, indent=1)
    print(json.dumps({
        "out": out,
        "convergence": artifact["convergence"],
        "resume_check": artifact["resume_check"],
    }, indent=1))


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("stage", choices=["data", "train", "resume",
                                      "infer", "artifact", "all"])
    ap.add_argument("--work", default=os.path.join(REPO, "_campaign"))
    ap.add_argument("--data_seed", type=int, default=17)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--epochs", type=int, default=16)
    ap.add_argument("--dtype", default="bfloat16",
                    help="train/serve compute dtype; CPU smoke runs need float32")
    ap.add_argument("--train_moments", type=int, default=16)
    ap.add_argument("--val_moments", type=int, default=3)
    ap.add_argument("--test_moments", type=int, default=2)
    ap.add_argument("--mf_groups", type=int, default=48)
    ap.add_argument("--peds", type=int, default=12)
    ap.add_argument("--mf_other_peds", type=int, default=5)
    ap.add_argument("--anchor_samples", type=int, default=40)
    ap.add_argument("--mf_samples", type=int, default=25)
    args = ap.parse_args()
    stages = (["data", "train", "resume", "infer", "artifact"]
              if args.stage == "all" else [args.stage])
    for stage in stages:
        globals()["stage_" + stage](args.work, args)


if __name__ == "__main__":
    main()
