"""Layer-library extras: softsel, focal attention, group norm; anchor
prep + SDD folds."""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from multiverse_tpu.ops.layers import focal_attention, group_norm, softsel


def test_softsel_softmax():
    target = jnp.asarray(np.arange(12, dtype=np.float32).reshape(1, 3, 4))
    logits = jnp.asarray([[0.0, 0.0, 100.0]])
    out = np.asarray(softsel(target, logits))
    np.testing.assert_allclose(out[0], target[0, 2], atol=1e-4)


def test_focal_attention_picks_matching_channel():
    rng = np.random.RandomState(0)
    d = 8
    query = rng.randn(2, d).astype(np.float32)
    context = rng.randn(2, 3, 5, d).astype(np.float32)
    # plant the query itself in channel 1, timestep 2
    context[:, 1, 2, :] = query * 10.0
    out = np.asarray(focal_attention(
        jnp.asarray(query), jnp.asarray(context)))
    assert out.shape == (2, d)
    # attended output correlates most with the planted vector
    cos = (out * query).sum(-1) / (
        np.linalg.norm(out, axis=-1) * np.linalg.norm(query, axis=-1))
    assert (cos > 0.5).all()


def test_group_norm_moments():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 4, 4, 16).astype(np.float32) * 3 + 5)
    out = np.asarray(group_norm(
        x, scale=jnp.ones(16), bias=jnp.zeros(16), num_groups=4))
    # per-group normalized: overall mean ~0, var ~1
    assert abs(out.mean()) < 0.1
    assert abs(out.var() - 1.0) < 0.1


def test_prepare_anchor_split(tmp_path):
    import json

    from multiverse_tpu.forking_paths.prepared_data import (
        prepare_anchor_split,
    )

    bbox_dir = tmp_path / "ds" / "bbox"
    os.makedirs(bbox_dir)
    boxes = []
    for f in range(26 * 12):
        boxes.append({"frame_id": f, "track_id": 0,
                      "class_name": "Person", "is_x_agent": 1,
                      "bbox": [100.0 + f, 100.0, 20.0, 40.0]})
    with open(bbox_dir / "0000_3_1_0_a_cam1.json", "w") as fh:
        json.dump(boxes, fh)
    counts = prepare_anchor_split(
        str(tmp_path / "ds"), ["0000_3_1_0_a_cam1"],
        str(tmp_path / "out"), "train")
    assert counts == [26]
    rows = np.loadtxt(tmp_path / "out" / "traj_2.5fps" / "train" /
                      "0000_3_1_0_a_cam1.txt", delimiter="\t")
    # frame ids NOT rebased for anchor data
    assert rows[0, 0] == 0.0 and rows[1, 0] == 12.0
    assert rows.shape[0] == 26


def test_prepare_anchor_cli(tmp_path):
    """mvt-prepare-anchor drives prepare_anchor_split per split list
    (reference CLI surface:
    forking_paths_dataset/code/get_prepared_data.py:12-15)."""
    import json
    import pickle

    from multiverse_tpu.cli.prepare_data import prepare_anchor_main

    bbox_dir = tmp_path / "ds" / "bbox"
    os.makedirs(bbox_dir)
    boxes = []
    for f in range(26 * 12):
        boxes.append({"frame_id": f, "track_id": 0,
                      "class_name": "Person", "is_x_agent": 1,
                      "bbox": [100.0 + f, 100.0, 20.0, 40.0]})
    with open(bbox_dir / "0000_3_1_0_a_cam1.json", "w") as fh:
        json.dump(boxes, fh)
    split_dir = tmp_path / "splits"
    os.makedirs(split_dir)
    (split_dir / "train.lst").write_text("0000_3_1_0_a_cam1\n")

    prepare_anchor_main([str(tmp_path / "ds"), str(split_dir),
                         str(tmp_path / "out")])
    rows = np.loadtxt(tmp_path / "out" / "traj_2.5fps" / "train" /
                      "0000_3_1_0_a_cam1.txt", delimiter="\t")
    assert rows.shape[0] == 26
    assert rows[0, 0] == 0.0 and rows[1, 0] == 12.0  # no rebasing
    with open(tmp_path / "out" / "anno_person_box" / "train" /
              "0000_3_1_0_a_cam1.p", "rb") as fh:
        person_boxes = pickle.load(fh)
    assert "0_0" in person_boxes


def test_sdd_fold_splits(tmp_path):
    from multiverse_tpu.data.sdd import write_sdd_fold_splits

    videos = ["v%02d" % i for i in range(10)]
    write_sdd_fold_splits(videos, str(tmp_path), n_fold=5)
    all_test = []
    for i in range(1, 6):
        fold = tmp_path / ("fold_%d" % i)
        test = fold.joinpath("test.lst").read_text().split()
        val = fold.joinpath("val.lst").read_text().split()
        train = fold.joinpath("train.lst").read_text().split()
        assert len(test) == 2
        assert len(test) + len(val) + len(train) == 10
        assert not (set(test) & set(val)) and not (set(test) & set(train))
        all_test += test
    assert sorted(all_test) == sorted(videos)  # folds partition the set
