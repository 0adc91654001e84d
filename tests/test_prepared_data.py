"""Dataset preparation: bbox JSONs → TSVs/pickles, seg palette match."""

import json
import os
import pickle

import numpy as np
import pytest

from multiverse_tpu.forking_paths.prepared_data import (
    CARLA_PALETTE,
    carla_ids_to_ade20k,
    get_feet,
    group_by_obs,
    prepare_multifuture_split,
    resize_nearest,
    seg_rgb_to_carla_ids,
    write_split_lists,
)


def _write_bbox_json(path, n_frames, tracks, x_agent=0):
    """tracks: {track_id: (x0, y0, vx, vy)} linear motion."""
    boxes = []
    for f in range(n_frames):
        for tid, (x0, y0, vx, vy) in tracks.items():
            boxes.append({
                "frame_id": f,
                "track_id": tid,
                "class_name": "Person" if tid < 10 else "Vehicle",
                "is_x_agent": 1 if tid == x_agent else 0,
                "bbox": [x0 + vx * f, y0 + vy * f, 20.0, 40.0],
            })
    with open(path, "w") as fh:
        json.dump(boxes, fh)


@pytest.fixture
def dataset(tmp_path):
    bbox_dir = tmp_path / "ds" / "bbox"
    os.makedirs(bbox_dir)
    names = []
    # one obs group (zara = ethucy timing) with 2 futures + second agent
    for dest, annot in [(0, "a"), (1, "b")]:
        name = "zara01_5_0_%d_%s_cam1" % (dest, annot)
        names.append(name)
        _write_bbox_json(
            bbox_dir / ("%s.json" % name), n_frames=150,
            tracks={0: (100.0, 100.0, 2.0 + dest, 1.0),
                    1: (300.0, 200.0, -1.0, 0.5),
                    12: (500.0, 300.0, 0.0, 0.0)})
    return str(tmp_path / "ds"), names, tmp_path


def test_prepare_multifuture_split(dataset):
    ds_path, names, tmp = dataset
    stats = prepare_multifuture_split(
        ds_path, names, str(tmp / "obs"), str(tmp / "mf"), "test")
    assert stats["skipped"] == 0 and stats["num_obs"] == 1

    tsv = tmp / "obs" / "traj_2.5fps" / "test" / "zara01_5_0_cam1.txt"
    rows = np.loadtxt(tsv, delimiter="\t")
    # 8 obs frames × 2 persons (vehicle excluded from traj)
    assert rows.shape == (16, 4)
    # frame ids rebased to the ethucy start (32) and 10-frame strided
    assert rows[0, 0] == 0.0 and sorted(set(rows[:, 0]))[1] == 10.0
    # feet point = bottom-center of the 20×40 box
    f0 = rows[(rows[:, 0] == 0) & (rows[:, 1] == 0.0)][0]
    assert f0[2] == pytest.approx(100.0 + 2.0 * 32 + 10.0)
    assert f0[3] == pytest.approx(100.0 + 1.0 * 32 + 40.0)

    with open(tmp / "mf" / "test" / "zara01_5_0_cam1.p", "rb") as f:
        mf = pickle.load(f)
    assert set(mf) == set(names)
    for name in names:
        fut = mf[name]["x_agent_traj"]
        assert len(fut) > 0
        assert len(mf[name]["obs_traj"]) == 8
        # vehicle appears in all_boxes but not in x_agent_traj
        classes = {b[1] for b in mf[name]["all_boxes"]}
        assert "Vehicle" in classes

    with open(tmp / "obs" / "anno_person_box" / "test" /
              "zara01_5_0_cam1.p", "rb") as f:
        pboxes = pickle.load(f)
    assert "0_0" in pboxes and len(pboxes["0_0"]) == 4


def test_seg_palette_match():
    rng = np.random.RandomState(0)
    ids = rng.randint(0, len(CARLA_PALETTE), (20, 30))
    rgb = CARLA_PALETTE[ids].astype(np.int16)
    # mp4-like compression noise within the ±4 tolerance
    noisy = np.clip(rgb + rng.randint(-4, 5, rgb.shape), 0, 255)
    decoded = seg_rgb_to_carla_ids(noisy.astype(np.uint8))
    np.testing.assert_array_equal(decoded, ids)
    # far-off colors fall back to class 0
    weird = np.full((4, 4, 3), 37, np.uint8)
    assert (seg_rgb_to_carla_ids(weird) == 0).all()


def test_ade20k_remap_and_resize():
    ids = np.full((72, 128), 4, np.uint8)  # person
    ade = carla_ids_to_ade20k(ids)
    assert (ade == 13).all()
    small = resize_nearest(ade, 36, 64)
    assert small.shape == (36, 64) and (small == 13).all()


def test_write_split_lists(tmp_path):
    names = []
    for obs in range(10):
        for dest in range(3):
            names.append("0000_%d_1_%d_a_cam2" % (obs, dest))
    splits = write_split_lists(names, str(tmp_path), val_frac=0.2,
                               test_frac=0.2)
    total = sum(len(v) for v in splits.values())
    assert total == 30
    # obs groups stay intact within one split
    for split, members in splits.items():
        for name in members:
            group = group_by_obs([name])
            key = list(group)[0]
            siblings = [n for n in names
                        if list(group_by_obs([n]))[0] == key]
            for s in siblings:
                assert s in members
    # deterministic
    splits2 = write_split_lists(names, str(tmp_path), val_frac=0.2,
                                test_frac=0.2)
    assert splits == splits2


def test_get_feet():
    assert get_feet([10.0, 20.0, 30.0, 60.0]) == (20.0, 60.0)
