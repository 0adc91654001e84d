"""One test that drives the ENTIRE reference workflow L0→L6 at toy
scale, every stage feeding the next through its real on-disk contract:

fake-CARLA record (palette seg MP4s + bbox JSONs)
  → frames/scene-seg extraction (palette decode → ADE20k ids)
  → multifuture prep (obs TSVs + GT pickles) and anchor prep (train TSVs)
  → mvt-preprocess (npz)
  → mvt-train (2 epochs)
  → mvt-multifuture-inference (traj + prob pickles)
  → evaluators (ours + the reference's verbatim, numbers compared).

Stage contracts are also tested pairwise elsewhere; this test exists so
a seam regression BETWEEN stages (e.g. round 2's recorder writing raw
seg frames that decoded to all-background) trips CI end-to-end.
Reference workflow: forking_paths_dataset/README + TESTING.md.
"""

import json
import os
import pickle
import subprocess
import sys

import numpy as np
import pytest

from tests import fake_carla

REFERENCE = "/root/reference"


@pytest.fixture
def carla_env():
    mod = fake_carla.install()
    yield mod
    sys.modules.pop("carla", None)


def _walk_rows(diverge_dy):
    """Shared obs through frame 70, then a future that diverges with
    slope `diverge_dy`; plus a second pedestrian (pid 2) for
    other-box content.  Positions in meters near the camera axis."""
    rows = []
    for f in range(0, 141, 10):
        x = -4.0 + 0.05 * f
        y = 0.0 if f <= 70 else diverge_dy * (f - 70) / 70.0
        rows.append((f, 1, x, y, 0.5))
        rows.append((f, 2, x - 1.0, y + 1.5, 0.5))
    return rows


def test_full_chain_l0_to_l6(carla_env, tmp_path, capsys):
    from multiverse_tpu.cli import (
        multifuture_eval_trajs,
        multifuture_eval_trajs_prob,
        multifuture_inference,
        preprocess,
        train,
    )
    from multiverse_tpu.cli.vis_dataset import record_moments_main
    from multiverse_tpu.forking_paths.controls import traj_to_controls
    from multiverse_tpu.forking_paths.prepared_data import (
        extract_frames_and_seg,
        load_frame_data,
        prepare_anchor_split,
        prepare_multifuture_split,
    )

    # ---------------------------------------------- L0: record moments
    # custom rig: straight-down camera over the walkers so the fake
    # backend's real 3D→2D projection keeps every box in view
    registry = {
        "scenes": {"zara01": {"map": "Town03_ethucy", "fps": 25.0,
                              "static_cars": [], "weather": {}}},
        "cameras": {"recording": {"zara01": [
            {"fov": 90.0, "location_xyz": [0.0, 0.0, 18.0],
             "rotation_pyr": [-90.0, 0.0, 0.0],
             "width": 192, "height": 108}]}},
    }
    reg_path = tmp_path / "registry.json"
    reg_path.write_text(json.dumps(registry))

    moments = []
    for dest, annot, dy in ((0, "a", 2.0), (1, "b", -2.0)):
        controls, _ = traj_to_controls(
            np.asarray(_walk_rows(dy), np.float64), -1, -1, 25.0)
        moments.append({
            "scenename": "zara01",
            "moment_id": "zara01_0_1_%d_%s" % (dest, annot),
            "ped_controls": controls,
            "vehicle_controls": {},
            "x_agents": {"1": []},
        })
    moment_json = tmp_path / "moments.json"
    moment_json.write_text(json.dumps(moments, default=float))
    ds = tmp_path / "dataset"
    record_moments_main([str(moment_json), str(ds),
                         "--scene_registry", str(reg_path)])
    videonames = ["zara01_0_1_0_a_cam1", "zara01_0_1_1_b_cam1"]
    for v in videonames:
        assert (ds / "videos" / ("%s.mp4" % v)).exists()
        assert (ds / "videos_seg" / ("%s.mp4" % v)).exists()
        assert (ds / "bbox" / ("%s.json" % v)).exists()

    # ethucy timing (prepared_data.scene_timing): start 32, drop 10
    frame_data = load_frame_data(str(ds / "bbox" / "zara01_0_1_0_a_cam1.json"))
    needed = sorted(frame_data)[32::10]
    assert len(needed) == 11          # 4 obs + 7 future steps
    OBS = 4
    obs_ids, train_ids = needed[:OBS], sorted(frame_data)[::10]

    # ------------------------- L1a: frames + scene-seg (palette decode)
    mf_scene = tmp_path / "mf_scene_seg"
    train_scene = tmp_path / "train_scene_seg"
    ok = extract_frames_and_seg(
        str(ds / "videos" / "zara01_0_1_0_a_cam1.mp4"),
        str(ds / "videos_seg" / "zara01_0_1_0_a_cam1.mp4"),
        obs_ids, str(tmp_path / "frames"),
        str(mf_scene / "zara01_0_1_cam1"), "zara01_0_1_cam1",
        start=32, scene_h=12, scene_w=16)
    assert ok
    for v in videonames:
        ok = extract_frames_and_seg(
            str(ds / "videos" / ("%s.mp4" % v)),
            str(ds / "videos_seg" / ("%s.mp4" % v)),
            train_ids, str(tmp_path / "frames"),
            str(train_scene / v), v, start=0, scene_h=12, scene_w=16)
        assert ok
    seg = np.load(mf_scene / "zara01_0_1_cam1" /
                  "zara01_0_1_cam1_F_00000000.npy")
    # the palette seg MP4 must decode back to real class ids — the
    # round-2 regression (raw seg frames in the video) decoded to
    # all-background and would fail here
    assert seg.shape == (12, 16)
    assert (seg == 13).all()          # CARLA ped 4 → ADE20k person 13

    classes = sorted(int(c) for c in np.unique(seg))
    oldid2new = {str(c): i + 1 for i, c in enumerate(classes)}
    n_classes = len(oldid2new) + 1
    id2name = tmp_path / "scene_id2name.json"
    id2name.write_text(json.dumps({
        "oldid2new": oldid2new,
        "id2name": {str(v): "class%s" % k
                    for k, v in oldid2new.items()}}))

    # ------------------------------- L1b: multifuture prep, anchor prep
    obs_out, mf_out = tmp_path / "prepared_obs", tmp_path / "multifuture"
    stats = prepare_multifuture_split(
        str(ds), videonames, str(obs_out), str(mf_out), "test",
        obs_length=OBS)
    assert stats["skipped"] == 0 and stats["num_obs"] == 1
    assert (obs_out / "traj_2.5fps" / "test" / "zara01_0_1_cam1.txt"
            ).exists()
    with open(mf_out / "test" / "zara01_0_1_cam1.p", "rb") as f:
        gt = pickle.load(f)
    assert set(gt) == set(videonames)
    assert all(len(g["x_agent_traj"]) == 7 for g in gt.values())

    anchor_out = tmp_path / "anchor"
    for split in ("train", "val", "test"):
        counts = prepare_anchor_split(
            str(ds), videonames, str(anchor_out), split,
            drop_frame=10, min_frames=5)
        assert counts == [len(train_ids)] * 2
        assert len(train_ids) >= 10   # >= obs+pred windows for training

    # -------------------------------------------- L2: mvt-preprocess
    prepro = tmp_path / "prepro"
    preprocess.main([
        str(anchor_out / "traj_2.5fps"), str(prepro),
        "--obs_len", "4", "--pred_len", "5",
        "--add_grid", "--add_all_reg", "--add_scene",
        "--scene_feat_path", str(train_scene),
        "--scene_id2name", str(id2name), "--direct_scene_feat",
        "--scene_h", "12", "--scene_w", "16",
        "--video_h", "108", "--video_w", "192",
        "--grid_strides", "2,4",
    ])
    assert (prepro / "data_train.npz").exists()

    # ------------------------------------------ L4/L5: mvt-train (2 ep)
    flags = [
        "--obs_len", "4", "--pred_len", "5",
        "--scene_h", "12", "--scene_w", "16",
        "--scene_class", str(n_classes),
        "--video_h", "108", "--video_w", "192",
        "--emb_size", "8", "--enc_hidden_size", "16",
        "--dec_hidden_size", "16", "--scene_conv_dim", "8",
        "--scene_grid_strides", "2,4", "--use_grids", "1,0",
        "--use_gnn", "--use_scene_enc",
    ]
    models = tmp_path / "models"
    train.main([
        str(prepro), str(models), "chain", "--runId", "1",
        "--batch_size", "4", "--num_epochs", "2",
        "--save_period", "5", "--init_lr", "0.3", *flags,
    ])
    model_path = models / "chain" / "01" / "best"
    assert model_path.is_dir()

    # ------------------------- L5: multifuture inference on the dataset
    out_file = tmp_path / "chain.traj.p"
    prob_file = tmp_path / "chain.prob.p"
    multifuture_inference.main([
        str(model_path), str(obs_out / "traj_2.5fps" / "test"),
        str(mf_out / "test"), str(out_file),
        "--save_prob_file", str(prob_file),
        "--obs_length", "4", "--num_out", "3",
        "--diverse_beam", "--diverse_gamma", "0.01",
        "--fix_num_timestep", "1",
        "--grid_strides", "2,4", "--use_grids", "1,0",
        "--emb_size", "8", "--enc_hidden_size", "16",
        "--dec_hidden_size", "16", "--scene_conv_dim", "8",
        "--use_gnn", "--use_scene_enc",
        "--scene_feat_path", str(mf_scene),
        "--scene_id2name", str(id2name),
        "--scene_h", "12", "--scene_w", "16",
        "--scene_class", str(n_classes),
        "--video_h", "108", "--video_w", "192",
        "--batch_size", "1", "--compute_dtype", "float32",
    ])
    with open(out_file, "rb") as f:
        preds = pickle.load(f)
    assert set(preds) == {"zara01_0_1_cam1"}
    assert len(preds["zara01_0_1_cam1"]) == 3          # K futures
    assert len(preds["zara01_0_1_cam1"][0]) == 7       # GT max length

    # --------------------------------------------- L6: our evaluators
    multifuture_eval_trajs.main([str(mf_out / "test"), str(out_file)])
    lines = capsys.readouterr().out.strip().splitlines()
    ours = [float(x) for x in lines[-1].split()]
    # (ade_45, ade_td, ade_all, fde_45, fde_td, fde_all); the dataset
    # has no top-down (cam4) trajectories, so those columns are NaN
    assert len(ours) == 6
    assert all(np.isfinite(ours[i]) for i in (0, 2, 3, 5))
    # sanity: errors are in-image scale (predictions and GT share the
    # recorded camera's pixel space), not a resolution mismatch
    assert ours[2] < 192

    multifuture_eval_trajs_prob.main([
        str(mf_out / "test"), str(prob_file),
        "--scene_h", "6", "--scene_w", "8",
        "--video_h", "108", "--video_w", "192"])
    lines = capsys.readouterr().out.strip().splitlines()
    nll = [float(x) for x in lines[-1].split()]
    assert len(nll) == 5 and all(np.isfinite(nll))
    assert all(v > 0 for v in nll)

    # ------------------- L6: the reference evaluator, verbatim, agrees
    ref_eval = os.path.join(REFERENCE, "code", "multifuture_eval_trajs.py")
    if os.path.exists(ref_eval):
        r = subprocess.run(
            [sys.executable, ref_eval, str(mf_out / "test"),
             str(out_file)],
            capture_output=True, text=True, timeout=300)
        assert r.returncode == 0, r.stderr
        ref_vals = [float(x)
                    for x in r.stdout.strip().splitlines()[-1].split()]
        np.testing.assert_allclose(ours, ref_vals, rtol=1e-6,
                                   equal_nan=True)
