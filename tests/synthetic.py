"""Synthetic data helpers shared by tests and the verify drive."""

import json
import os

import numpy as np

from multiverse_tpu.config import MultiverseConfig
from multiverse_tpu import geometry
from multiverse_tpu.models import Batch


def tiny_config(**kw) -> MultiverseConfig:
    base = dict(
        obs_len=4,
        pred_len=5,
        scene_h=12,
        scene_w=16,
        scene_class=5,
        emb_size=8,
        enc_hidden_size=16,
        dec_hidden_size=16,
        scene_conv_dim=8,
        scene_grid_strides=(2, 4),
        use_grids=(True, False),
        batch_size=4,
    )
    base.update(kw)
    return MultiverseConfig(**base).validate()


def random_walk(rng, T, video_h, video_w):
    xy = np.zeros((T, 2), np.float32)
    xy[0] = rng.uniform([video_w * 0.3, video_h * 0.3],
                        [video_w * 0.7, video_h * 0.7])
    steps = rng.randn(T - 1, 2) * np.array([video_w, video_h]) * 0.02
    xy[1:] = xy[0] + np.cumsum(steps, axis=0)
    xy[:, 0] = np.clip(xy[:, 0], 1.0, video_w - 1.0)
    xy[:, 1] = np.clip(xy[:, 1], 1.0, video_h - 1.0)
    return xy.astype(np.float32)


def make_batch(rng, cfg: MultiverseConfig, n: int, num_scene_feat: int = 3):
    """Build a random but self-consistent Batch (+ the raw trajectories)."""
    S = cfg.num_scales
    T = cfg.seq_len
    obs_cls = np.zeros((n, S, cfg.obs_len), np.int32)
    pred_cls = np.zeros((n, S, cfg.pred_len), np.int32)
    obs_tgt = [
        np.zeros((n, cfg.obs_len, h, w, 2), np.float32)
        for (h, w) in [cfg.scene_grids[i] for i in cfg.active_scales]
    ]
    pred_tgt = [
        np.zeros((n, cfg.pred_len, h, w, 2), np.float32)
        for (h, w) in [cfg.scene_grids[i] for i in cfg.active_scales]
    ]
    trajs = np.zeros((n, T, 2), np.float32)
    for i in range(n):
        xy = random_walk(rng, T, cfg.video_h, cfg.video_w)
        trajs[i] = xy
        cls, tgts = geometry.rasterize_traj_np(
            xy, cfg.video_h, cfg.video_w, cfg.scene_grids
        )
        obs_cls[i] = cls[:, : cfg.obs_len]
        pred_cls[i] = cls[:, cfg.obs_len:]
        for idx, si in enumerate(cfg.active_scales):
            obs_tgt[idx][i] = tgts[si][: cfg.obs_len]
            pred_tgt[idx][i] = tgts[si][cfg.obs_len:]

    scene_feat = np.zeros(
        (num_scene_feat, cfg.scene_h, cfg.scene_w, cfg.scene_class),
        np.float32,
    )
    cls_map = rng.randint(0, cfg.scene_class,
                          (num_scene_feat, cfg.scene_h, cfg.scene_w))
    for f in range(num_scene_feat):
        for c in range(cfg.scene_class):
            scene_feat[f, :, :, c] = cls_map[f] == c
    obs_scene = rng.randint(0, num_scene_feat,
                            (n, cfg.obs_len)).astype(np.int32)

    batch = Batch(
        obs_grid_class=obs_cls,
        obs_grid_target_all=tuple(obs_tgt),
        obs_scene=obs_scene,
        scene_feat=scene_feat,
        pred_grid_class=pred_cls,
        pred_grid_target_all=tuple(pred_tgt),
    )
    return batch, trajs


def write_reference_format_dataset(
    root: str,
    cfg: MultiverseConfig,
    rng,
    num_videos: int = 2,
    frames_per_video: int = 40,
    persons_per_video: int = 3,
):
    """Write a tiny dataset in the reference's on-disk input format:
    per-video trajectory TSVs + per-frame scene-seg .npy files +
    the scene id2name json. Returns (traj_path, scene_feat_path,
    id2name_path)."""
    traj_path = os.path.join(root, "traj_2.5fps")
    scene_path = os.path.join(root, "scene_seg")
    for split in ("train", "val", "test"):
        os.makedirs(os.path.join(traj_path, split), exist_ok=True)

    for split in ("train", "val", "test"):
        for v in range(num_videos):
            videoname = "VIRAT_S_%04d%02d_00" % (v, hash(split) % 90)
            lines = []
            trajs = {
                p: random_walk(rng, frames_per_video,
                               cfg.video_h, cfg.video_w)
                for p in range(persons_per_video)
            }
            os.makedirs(os.path.join(scene_path, videoname), exist_ok=True)
            for f in range(frames_per_video):
                frame_idx = f * 12  # 2.5 fps of a 30fps video
                for p, xy in trajs.items():
                    lines.append("%d\t%d\t%.3f\t%.3f" % (
                        frame_idx, p, xy[f, 0], xy[f, 1]))
                np.save(
                    os.path.join(
                        scene_path, videoname,
                        "%s_F_%08d.npy" % (videoname, frame_idx)),
                    rng.randint(0, cfg.scene_class,
                                (cfg.scene_h, cfg.scene_w)).astype(np.uint8),
                )
            with open(os.path.join(traj_path, split,
                                   "%s.txt" % videoname), "w") as fh:
                fh.write("\n".join(lines) + "\n")

    id2name_path = os.path.join(root, "scene_id2name.json")
    with open(id2name_path, "w") as fh:
        json.dump({
            "oldid2new": {str(i): i for i in range(1, cfg.scene_class)},
            "id2name": {str(i): "class%d" % i
                        for i in range(1, cfg.scene_class)},
        }, fh)
    return traj_path, scene_path, id2name_path


def write_multifuture_dataset(
    root: str,
    cfg: MultiverseConfig,
    rng,
    num_traj: int = 4,
    num_futures: int = 3,
    max_pred_len: int = 8,
):
    """Write a tiny Forking-Paths-style inference dataset: obs TSVs,
    per-frame scene seg npys, GT future pickles, scene id json
    (formats per reference: code/multifuture_inference.py:78-272 and
    forking_paths_dataset/code/get_prepared_data_multifuture.py:244-251).
    Returns (traj_path, multifuture_path, scene_feat_path, id2name_path).
    """
    import pickle

    traj_path = os.path.join(root, "obs_traj")
    mf_path = os.path.join(root, "multifuture")
    scene_path = os.path.join(root, "obs_scene_seg")
    os.makedirs(traj_path, exist_ok=True)
    os.makedirs(mf_path, exist_ok=True)

    cameras = ["cam1", "cam4"]
    for n in range(num_traj):
        camera = cameras[n % len(cameras)]
        traj_id = "zara01_%d_%d_%s" % (n, n % 3, camera)
        pid = n % 3
        xy = random_walk(rng, cfg.obs_len, cfg.video_h, cfg.video_w)
        lines = []
        os.makedirs(os.path.join(scene_path, traj_id), exist_ok=True)
        for t in range(cfg.obs_len):
            frame_idx = t * 12
            lines.append("%d\t%d\t%.3f\t%.3f" % (
                frame_idx, pid, xy[t, 0], xy[t, 1]))
            # an extra distractor pedestrian in some frames
            if t % 2 == 0:
                lines.append("%d\t%d\t%.1f\t%.1f" % (
                    frame_idx, pid + 7, 10.0 + t, 12.0 + t))
            np.save(
                os.path.join(scene_path, traj_id,
                             "%s_F_%08d.npy" % (traj_id, frame_idx)),
                rng.randint(0, cfg.scene_class,
                            (cfg.scene_h, cfg.scene_w)).astype(np.uint8))
        with open(os.path.join(traj_path, "%s.txt" % traj_id), "w") as fh:
            fh.write("\n".join(lines) + "\n")

        gt = {}
        for k in range(num_futures):
            T = int(rng.randint(cfg.pred_len, max_pred_len + 1))
            fut = random_walk(rng, T, cfg.video_h, cfg.video_w)
            gt["annotator%d" % k] = {
                "x_agent_traj": [
                    (cfg.obs_len * 12 + 12 * t, pid,
                     float(fut[t, 0]), float(fut[t, 1]))
                    for t in range(T)
                ]
            }
        with open(os.path.join(mf_path, "%s.p" % traj_id), "wb") as fh:
            pickle.dump(gt, fh)

    id2name_path = os.path.join(root, "mf_scene_id2name.json")
    with open(id2name_path, "w") as fh:
        json.dump({
            "oldid2new": {str(i): i for i in range(1, cfg.scene_class)},
            "id2name": {str(i): "class%d" % i
                        for i in range(1, cfg.scene_class)},
        }, fh)
    return traj_path, mf_path, scene_path, id2name_path
