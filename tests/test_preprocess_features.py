"""Preprocess optional features: keypoints, person/other boxes,
activities (reference: code/preprocess.py:481-587)."""

import os
import pickle

import numpy as np
import pytest

from multiverse_tpu.data.preprocess import (
    PreprocessOptions,
    _filter_future_act,
    preprocess_split,
)
from tests.synthetic import tiny_config, write_reference_format_dataset


@pytest.fixture(scope="module")
def featured(tmp_path_factory):
    root = tmp_path_factory.mktemp("feat")
    rng = np.random.RandomState(3)
    cfg = tiny_config()
    traj_path, scene_path, id2name = write_reference_format_dataset(
        str(root), cfg, rng, num_videos=1, frames_per_video=12)

    # build per-video feature pickles in the reference formats
    kp_path = os.path.join(root, "kp")
    pb_path = os.path.join(root, "person_box")
    ob_path = os.path.join(root, "other_box")
    act_path = os.path.join(root, "activity")
    for split in ("train", "val", "test"):
        for sub in (kp_path, pb_path, ob_path, act_path):
            os.makedirs(os.path.join(sub, split), exist_ok=True)
        for fn in os.listdir(os.path.join(traj_path, split)):
            videoname = os.path.splitext(fn)[0]
            rows = np.loadtxt(
                os.path.join(traj_path, split, fn), delimiter="\t")
            kp, pb, ob, act = {}, {}, {}, {}
            for fid, pid, x, y in rows:
                key = "%d_%d" % (fid, pid)
                kp[key] = rng.randn(17, 3).astype(np.float32)
                pb[key] = np.array(
                    [x - 5, y - 20, x + 5, y], np.float32)
                ob[key] = ([[0.0, 0.0, 9.0, 9.0]], [1])
                # (cur ids, dist to finish, future ids, dist to start)
                act[key] = ([1, 0], [500, 0], [21], [10])
            for sub, d in ((kp_path, kp), (pb_path, pb),
                           (ob_path, ob), (act_path, act)):
                with open(os.path.join(
                        sub, split, "%s.p" % videoname), "wb") as f:
                    pickle.dump(d, f)

    opts = PreprocessOptions(
        obs_len=4, pred_len=5,
        add_grid=True, add_all_reg=True, add_scene=True,
        add_kp=True, add_person_box=True, add_other_box=True,
        add_activity=True,
        kp_path=kp_path, person_box_path=pb_path,
        other_box_path=ob_path, activity_path=act_path,
        scene_feat_path=scene_path, scene_id2name=id2name,
        direct_scene_feat=True,
        scene_h=12, scene_w=16, grid_strides="2,4",
    )
    out = os.path.join(root, "prepro", "data_train.npz")
    preprocess_split(traj_path, "train", out, opts)
    return dict(np.load(out, allow_pickle=True))


def test_kp_features(featured):
    d = featured
    n = len(d["obs_traj"])
    assert d["obs_kp"].shape == (n, 4, 17, 2)
    assert d["pred_kp"].shape == (n, 5, 17, 2)
    # rel kp: first step zero
    assert (d["obs_kp_rel"][:, 0] == 0).all()


def test_person_boxes_and_ids(featured):
    d = featured
    n = len(d["obs_traj"])
    assert d["obs_box"].shape == (n, 4, 4)
    boxid2key = d["person_boxid2key"].item()
    boxkey2id = d["person_boxkey2id"].item()
    assert len(boxid2key) == len(boxkey2id)
    # ids round-trip and index real boxes
    bid = int(d["obs_boxid"][0][0])
    assert boxkey2id[boxid2key[bid]] == bid
    # box matches the trajectory point (feet at bottom-center)
    x, y = d["obs_traj"][0][0]
    x1, y1, x2, y2 = d["obs_box"][0][0]
    assert abs((x1 + x2) / 2 - x) < 1e-3 and abs(y2 - y) < 1e-3


def test_other_boxes_and_activities(featured):
    d = featured
    n = len(d["obs_traj"])
    assert len(d["obs_other_box"]) == n
    assert len(d["obs_other_box_class"]) == n
    np.testing.assert_allclose(
        np.asarray(d["obs_other_box"][0][0], np.float64),
        [[0.0, 0.0, 9.0, 9.0]])
    assert len(d["cur_activity"]) == n
    # activities are stored at the last obs frame per example
    assert list(d["cur_activity"][0]) == [0, 1]
    # future act: id 1 still active (500 >= 60 frames ahead) and 21
    # starts within 60 frames
    assert sorted(d["future_activity"][0]) == [1, 21]


def test_filter_future_act():
    # active activity finishing too soon is dropped
    assert _filter_future_act(([1], [10], [0], [0]), 60) == [0]
    assert _filter_future_act(([1], [100], [0], [0]), 60) == [1]
    assert _filter_future_act(([0], [0], [7], [30]), 60) == [7]
    assert _filter_future_act(([0], [0], [7], [90]), 60) == [0]


def test_reverse_xy_and_traj_pixel(tmp_path):
    """ETH/UCY path: world-coordinate TSVs in (frame, pid, y, x) order
    with grid rasterization from a separate pixel lookup
    (reference: code/preprocess.py:76-78, 108-125)."""
    import numpy as np

    from multiverse_tpu.data.preprocess import (
        PreprocessOptions,
        preprocess_split,
    )
    from multiverse_tpu.geometry import xy_to_cell_np

    traj_dir = tmp_path / "traj" / "train"
    os.makedirs(traj_dir)
    rng = np.random.RandomState(0)
    T = 9
    world = rng.randn(T, 2) * 3          # meters (x, y)
    pixels = rng.uniform([10, 10], [950, 530], (T, 2))
    # the TSV stores world coords REVERSED (y then x)
    with open(traj_dir / "seq01.txt", "w") as f:
        for t in range(T):
            f.write("%d\t1\t%.4f\t%.4f\n" % (
                t * 10, world[t, 1], world[t, 0]))
    pixel_dir = tmp_path / "pixels"
    os.makedirs(pixel_dir)
    pixel_file = pixel_dir / "seq01.txt"
    with open(pixel_file, "w") as f:
        for t in range(T):
            f.write("%d\t1\t%.3f\t%.3f\n" % (
                t * 10, pixels[t, 0], pixels[t, 1]))
    lst = tmp_path / "pixel.lst"
    lst.write_text(str(pixel_file) + "\n")

    opts = PreprocessOptions(
        obs_len=4, pred_len=5, add_grid=True, add_all_reg=True,
        reverse_xy=True, traj_pixel_lst=str(lst),
        scene_h=12, scene_w=16, video_h=540, video_w=960,
        grid_strides="2,4",
    )
    out = str(tmp_path / "data_train.npz")
    preprocess_split(str(tmp_path / "traj"), "train", out, opts)
    d = dict(np.load(out, allow_pickle=True))

    # trajectories come back un-reversed (x, y) in world units
    np.testing.assert_allclose(
        d["obs_traj"][0], world[:4], atol=1e-3)
    # grid cells follow the PIXEL lookup, not the world coords
    h, w = 6, 8
    expect = xy_to_cell_np(pixels[:4], 540, 960, h, w)
    np.testing.assert_array_equal(d["obs_grid_class"][0][0], expect)
