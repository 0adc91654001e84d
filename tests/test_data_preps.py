"""SDD / scene-seg-extraction / Argoverse preparation modules."""

import json
import os

import numpy as np
import pytest

from multiverse_tpu.data.argoverse import (
    ArgoverseCamera,
    crop_box_to_1080,
    cuboid_corners,
    cuboid_to_2d_box,
    quat_wxyz_to_rotmat,
    se3,
)
from multiverse_tpu.data.scene_extract import resize_seg_map, segment_images
from multiverse_tpu.data.sdd import (
    bbox_center,
    convert_sdd_bbox,
    parse_changelst,
    prepare_sdd_split,
)


# ------------------------------------------------------------------ SDD


def test_parse_changelst(tmp_path):
    p = tmp_path / "c.lst"
    p.write_text("scene_video0,1000x2000,True\nscene_video1,1920x1080,False\n")
    ch = parse_changelst(str(p))
    assert ch["scene_video0"] == (2000, 1000, True)   # swapped
    assert ch["scene_video1"] == (1920, 1080, False)


def test_convert_sdd_bbox_landscape():
    change = {"v": (960, 540, False)}
    out = convert_sdd_bbox([96, 54, 192, 108], change["v"])
    np.testing.assert_allclose(out, [192.0, 108.0, 384.0, 216.0])


def test_convert_sdd_bbox_rotated():
    # original portrait 540x960, recorded as (w=960, h=540, rotated)
    change = (960, 540, True)
    x1, y1, x2, y2 = convert_sdd_bbox([100, 200, 150, 260], change)
    # rotation: (x', y') = (w - y, x); then scale 2x both axes
    assert x1 == pytest.approx((960 - 200) * 2)
    assert y1 == pytest.approx(100 * 2)
    assert x2 == pytest.approx((960 - 260) * 2)
    assert y2 == pytest.approx(150 * 2)


def test_prepare_sdd_split(tmp_path):
    anno_dir = tmp_path / "annos" / "deathCircle" / "video0"
    os.makedirs(anno_dir)
    lines = []
    for f in range(0, 30 * 12, 1):
        lines.append('7 %d %d %d %d %d 0 0 0 "Pedestrian"' % (
            10 + f // 10, 20, 40 + f // 10, 60, f))
        lines.append('9 %d %d %d %d %d 0 0 0 "Biker"' % (
            200, 100, 240, 160, f))
    (anno_dir / "annotations.txt").write_text("\n".join(lines))
    changelst = {"deathCircle_video0": (1920, 1080, False)}
    counts = prepare_sdd_split(
        str(tmp_path / "annos"), ["deathCircle_video0"], changelst,
        str(tmp_path / "out"), "train", )
    assert counts == [30]
    rows = np.loadtxt(
        tmp_path / "out" / "traj_2.5fps" / "train" /
        "deathCircle_video0.txt", delimiter="\t")
    assert rows.shape[0] == 30           # pedestrian only
    assert (rows[:, 1] == 7.0).all()
    assert rows[0, 2] == pytest.approx(bbox_center([10, 20, 40, 60])[0])


# ---------------------------------------------------------- scene seg


def test_resize_seg_map():
    seg = np.arange(64 * 64).reshape(64, 64) % 7
    small = resize_seg_map(seg, down_rate=2.0)
    assert small.shape == (32, 32)
    full = resize_seg_map(seg, 8.0, keep_full=True)
    assert full.shape == (288, 512)


def test_segment_images_with_fake_backend(tmp_path):
    import cv2

    img_files = []
    for i in range(4):
        p = str(tmp_path / ("video1_F_%08d.jpg" % i))
        cv2.imwrite(p, np.zeros((36, 64, 3), np.uint8))
        img_files.append(p)

    def fake_segmenter(img):
        return np.full(img.shape[:2], 5, np.uint8)

    written = segment_images(
        img_files, fake_segmenter, str(tmp_path / "seg"),
        down_rate=2.0, save_two_level=True)
    assert len(written) == 4
    arr = np.load(written[0])
    assert arr.shape == (18, 32) and (arr == 5).all()
    assert "video1" in os.path.dirname(written[0])
    # job sharding covers disjoint subsets
    w1 = segment_images(img_files, fake_segmenter,
                        str(tmp_path / "seg2"), job=2, cur_job=1)
    w2 = segment_images(img_files, fake_segmenter,
                        str(tmp_path / "seg2"), job=2, cur_job=2)
    assert len(w1) + len(w2) == 4


# ----------------------------------------------------------- argoverse


def test_quat_identity():
    np.testing.assert_allclose(
        quat_wxyz_to_rotmat([1.0, 0.0, 0.0, 0.0]), np.eye(3), atol=1e-12)


def test_cuboid_corners_axis_aligned():
    label = {
        "center": {"x": 10.0, "y": 0.0, "z": 1.0},
        "rotation": {"w": 1.0, "x": 0.0, "y": 0.0, "z": 0.0},
        "length": 2.0, "width": 1.0, "height": 2.0,
    }
    corners = cuboid_corners(label)
    assert corners.shape == (8, 3)
    np.testing.assert_allclose(corners[:, 0].max(), 11.0)
    np.testing.assert_allclose(corners[:, 2].min(), 0.0)


def _front_camera():
    # ego->camera rotation: cam x = -ego y, cam y = -ego z, cam z = ego x
    rot_ego_to_cam = np.array([
        [0.0, -1.0, 0.0],
        [0.0, 0.0, -1.0],
        [1.0, 0.0, 0.0],
    ])
    extrinsic = se3(rot_ego_to_cam, np.zeros(3))
    k = np.zeros((3, 4))
    k[0, 0] = k[1, 1] = 1000.0
    k[0, 2], k[1, 2] = 960.0, 600.0
    k[2, 2] = 1.0
    return ArgoverseCamera(extrinsic=extrinsic, intrinsic=k)


def test_cuboid_to_2d_box_front():
    cam = _front_camera()
    label = {
        "center": {"x": 20.0, "y": 0.0, "z": 0.0},
        "rotation": {"w": 1.0, "x": 0.0, "y": 0.0, "z": 0.0},
        "length": 1.0, "width": 1.0, "height": 1.8,
    }
    box = cuboid_to_2d_box(label, cam)
    assert box is not None
    x1, y1, x2, y2 = box
    assert 800 < x1 < 960 < x2 < 1100
    assert y1 < 600 < y2
    # behind the camera
    label["center"]["x"] = -20.0
    assert cuboid_to_2d_box(label, cam) is None


def test_crop_box_to_1080():
    # reference clip_box: shift up by the cropped TOP 120 rows, clamp
    # negatives to 0, never reject (get_prepared_data_argoverse.py:233)
    assert crop_box_to_1080([0.0, 200.0, 100.0, 1200.0]) == \
        [0.0, 80.0, 100.0, 1080.0]
    assert crop_box_to_1080([0.0, 0.0, 100.0, 50.0]) == \
        [0.0, 0.0, 100.0, 0.0]


def test_prepare_argoverse_log(tmp_path):
    """End-to-end: labels+calibration -> TSV + box pickles, matching
    the reference's first-seen ids, center points, and key format."""
    import pickle

    from multiverse_tpu.data.argoverse import prepare_argoverse_log

    cal = {
        "camera_data_": [{
            "key": "image_raw_ring_front_center",
            "value": {
                "vehicle_SE3_camera_": {
                    "translation": [0.0, 0.0, 0.0],
                    # camera looking along ego +x:
                    # cam = R^T (p - t) with R = cam->ego
                    "rotation": {"coefficients": [0.5, -0.5, 0.5, -0.5]},
                },
                "focal_length_x_px_": 1000.0, "skew_": 0.0,
                "focal_center_x_px_": 960.0,
                "focal_length_y_px_": 1000.0,
                "focal_center_y_px_": 600.0,
            },
        }],
    }
    cal_file = tmp_path / "cal.json"
    cal_file.write_text(json.dumps(cal))

    def ped(uuid, x, y, occ=0):
        return {
            "label_class": "PEDESTRIAN", "track_label_uuid": uuid,
            "occlusion": occ,
            "center": {"x": x, "y": y, "z": 0.0},
            "rotation": {"w": 1.0, "x": 0.0, "y": 0.0, "z": 0.0},
            "length": 0.5, "width": 0.5, "height": 1.8,
        }

    label_dir = tmp_path / "labels"
    label_dir.mkdir()
    files = []
    n_frames = 12 * 21  # 21 pedestrian frames after ::12
    for f in range(n_frames):
        labels = [ped("uuid-b", 20.0, 1.0),
                  ped("uuid-a", 20.0, -1.0),
                  ped("uuid-occluded", 20.0, 0.0, occ=100)]
        p = label_dir / ("label_%05d.json" % f)
        p.write_text(json.dumps(labels))
        files.append(str(p))

    n = prepare_argoverse_log(files, str(cal_file), "log1",
                              str(tmp_path / "out"), split="test")
    assert n == 21 * 2  # 2 visible pedestrians per kept frame

    rows = [l.split("\t") for l in
            (tmp_path / "out/traj_2.5fps/test/log1.txt")
            .read_text().splitlines()]
    # first-seen order: uuid-b (listed first in frame 0) gets id 0
    pids = sorted({float(r[1]) for r in rows})
    assert pids == [0.0, 1.0]
    # frames are the ::12 subsample of pedestrian frames
    assert sorted({int(r[0]) for r in rows})[:3] == [0, 12, 24]
    with open(tmp_path / "out/anno_person_box/test/log1.p", "rb") as f:
        boxes = pickle.load(f)
    assert "log1_0_0" in boxes
    with open(tmp_path / "out/anno_other_box/test/log1.p", "rb") as f:
        others = pickle.load(f)
    # the other visible pedestrian appears as the one other box
    obs, cids = others["log1_0_0"]
    assert len(obs) == 1 and cids == [0]
    # trajectory point = center of the top-cropped box
    x, y = float(rows[0][2]), float(rows[0][3])
    assert 0 <= x <= 1920 and 0 <= y <= 1080
    # a log with too few pedestrian frames is skipped entirely
    n2 = prepare_argoverse_log(files[:12 * 5], str(cal_file), "log2",
                               str(tmp_path / "out"), split="test")
    assert n2 == 0


def test_sdd_frames_cli(tmp_path):
    """mvt-sdd-frames: traj-referenced frame extraction with the
    reference's resize rule, 2-level layout, name_level prefixing, and
    stats pickles (reference: SimAug/code/get_frames_sdd.py)."""
    import pickle

    import cv2

    from multiverse_tpu.cli.prepare_data import sdd_frames_main
    from multiverse_tpu.data.sdd import get_new_hw

    # min side 20 -> size 10; max side 40*0.5=20 > maxsize 15 -> cap
    assert get_new_hw(20, 40, 10, 15) == (15, 8)  # (w, h)

    vid_dir = tmp_path / "videos" / "bookstore"
    os.makedirs(vid_dir)
    vw = cv2.VideoWriter(str(vid_dir / "video0.mp4"),
                         cv2.VideoWriter_fourcc(*"mp4v"), 10, (64, 48))
    for i in range(8):
        vw.write(np.full((48, 64, 3), i * 30, np.uint8))
    vw.release()

    traj_dir = tmp_path / "trajs" / "train"
    os.makedirs(traj_dir)
    (traj_dir / "bookstore__video0.txt").write_text(
        "2\t1\t5.0\t5.0\n5\t1\t6.0\t6.0\n")
    (tmp_path / "videos.lst").write_text(
        str(vid_dir / "video0.mp4") + "\n")

    sdd_frames_main([
        str(tmp_path / "videos.lst"), str(tmp_path / "trajs"),
        str(tmp_path / "frames"),
        "--use_2level", "--name_level", "1",
        "--resize", "--size", "24", "--maxsize", "1333",
        "--statspath", str(tmp_path / "stats")])

    # 2level dir uses the raw video name; jpgs the name_level prefix
    out = tmp_path / "frames" / "video0"
    assert sorted(os.listdir(out)) == [
        "bookstore__video0_F_%08d.jpg" % i for i in (2, 5)]
    frame = cv2.imread(str(out / "bookstore__video0_F_00000002.jpg"))
    # reference passes (shape[0], shape[1]) = (h, w) into get_new_hw's
    # (h, w) params; min(48,64)=48 -> scale 0.5 -> 24x32, returned as
    # (neww, newh) = (32, 24)... reproduced verbatim, so assert via it
    neww, newh = get_new_hw(48, 64, 24, 1333)
    assert frame.shape[:2] == (newh, neww)
    with open(tmp_path / "stats" / "bookstore__video0.p", "rb") as f:
        stats = pickle.load(f)
    assert stats["actual_frame_count"] == 2
    assert stats["frame_count"] == 8.0


def test_extract_needed_frames_continues_past_bad_frame(
        tmp_path, monkeypatch, capsys):
    """One corrupt frame must not drop every later needed frame — the
    loop warns and continues, bounded by the metadata frame count
    (reference: get_frames_sdd.py:131-140)."""
    import cv2

    from multiverse_tpu.data import sdd

    class FakeCap:
        def __init__(self, path):
            self.idx = 0

        def get(self, prop):
            return {cv2.CAP_PROP_FRAME_HEIGHT: 48.0,
                    cv2.CAP_PROP_FRAME_WIDTH: 64.0,
                    cv2.CAP_PROP_FPS: 10.0,
                    cv2.CAP_PROP_FRAME_COUNT: 6.0}[prop]

        def read(self):
            i, self.idx = self.idx, self.idx + 1
            if i == 2:          # the corrupt frame
                return False, None
            if i >= 6:
                return False, None
            return True, np.full((48, 64, 3), i, np.uint8)

        def release(self):
            pass

    monkeypatch.setattr(cv2, "VideoCapture", FakeCap)
    saved, stats = sdd.extract_needed_frames(
        "fake.mp4", [2, 4], str(tmp_path / "out"), "vid")
    # frame 2 failed (warned), frame 4 is still written
    assert saved == 1
    assert stats["actual_frame_count"] == 1
    assert sorted(os.listdir(tmp_path / "out")) == ["vid_F_00000004.jpg"]
    assert "warning, 2 frame of vid failed" in capsys.readouterr().out


def test_resize_rotate_sdd_cli(tmp_path):
    """mvt-resize-rotate-sdd: portrait videos rotate 90° clockwise to
    1920x1080, change list records id/resolution/rotation (reference:
    SimAug/code/resize_rotate_sdd.py)."""
    import cv2

    from multiverse_tpu.cli.prepare_data import resize_rotate_sdd_main

    raw = tmp_path / "raw" / "bookstore" / "video0"
    os.makedirs(raw)
    vw = cv2.VideoWriter(str(raw / "video.mov"),
                         cv2.VideoWriter_fourcc(*"mp4v"), 10, (48, 64))
    for i in range(3):
        vw.write(np.full((64, 48, 3), i * 40, np.uint8))  # portrait
    vw.release()
    (tmp_path / "videos.lst").write_text(str(raw / "video.mov") + "\n")

    resize_rotate_sdd_main([
        str(tmp_path / "videos.lst"), str(tmp_path / "out"),
        str(tmp_path / "changes.lst")])

    line = (tmp_path / "changes.lst").read_text().strip()
    assert line == "bookstore_video0,48x64,True"
    vcap = cv2.VideoCapture(str(tmp_path / "out" /
                                "bookstore_video0.mp4"))
    assert (int(vcap.get(cv2.CAP_PROP_FRAME_WIDTH)),
            int(vcap.get(cv2.CAP_PROP_FRAME_HEIGHT))) == (1920, 1080)
    vcap.release()


def test_sdd_splits_cli(tmp_path):
    """mvt-sdd-splits: per fold, test/val/train lists are disjoint and
    complete (reference: SimAug/code/get_sdd_splits.py)."""
    from multiverse_tpu.cli.prepare_data import sdd_splits_main

    videos = ["v%d.mp4" % i for i in range(10)]
    (tmp_path / "videos.lst").write_text(
        "\n".join("/x/%s" % v for v in videos) + "\n")
    sdd_splits_main([str(tmp_path / "videos.lst"),
                     str(tmp_path / "splits"), "--n_fold", "5"])
    for i in range(1, 6):
        fold = tmp_path / "splits" / ("fold_%d" % i)
        parts = {s: set((fold / ("%s.lst" % s)).read_text().split())
                 for s in ("test", "val", "train")}
        assert parts["test"] | parts["val"] | parts["train"] == \
            set(videos)
        assert not (parts["test"] & parts["val"])
        assert not (parts["test"] & parts["train"])
        assert not (parts["val"] & parts["train"])


# ------------------------- mvt-get-vehicle-traj / mvt-split-path CLIs


def test_get_vehicle_traj_cli(tmp_path):
    """reference: forking_paths_dataset/code/get_vehicle_traj.py —
    YAML vehicle boxes at pedestrian frames → pixel + world TSVs."""
    from multiverse_tpu.cli.prepare_data import get_vehicle_traj_main

    videoname = "VIRAT_S_040000_00_000000_000100"
    traj_dir = tmp_path / "traj"
    traj_dir.mkdir()
    (traj_dir / ("%s.txt" % videoname)).write_text(
        "0\t1\t5.0\t5.0\n12\t1\t6.0\t5.0\n")

    anno = tmp_path / "anno"
    anno.mkdir()
    (anno / ("%s.types.yml" % videoname)).write_text(
        "- {meta: x}\n"
        "- {types: {id1: 3, cset3: {Vehicle: 1.0}}}\n"
        "- {types: {id1: 1, cset3: {Person: 1.0}}}\n")
    (anno / ("%s.geom.yml" % videoname)).write_text(
        "- {meta: x}\n"
        "- {geom: {id1: 3, ts0: 0, g0: 100 100 200 180, src: truth}}\n"
        "- {geom: {id1: 3, ts0: 12, g0: 110 100 210 180, src: truth}}\n"
        # not a pedestrian frame -> dropped
        "- {geom: {id1: 3, ts0: 5, g0: 100 100 200 180, src: truth}}\n"
        # a Person track -> dropped
        "- {geom: {id1: 1, ts0: 0, g0: 0 0 10 10, src: truth}}\n"
        # swapped corners -> repaired like the reference
        "- {geom: {id1: 3, ts0: 12, g0: 400 300 300 200, src: truth}}\n")

    h_dir = tmp_path / "h"
    h_dir.mkdir()
    (h_dir / "0400.txt").write_text("1,0,0\n0,1,0\n0,0,1\n")

    out = tmp_path / "out"
    get_vehicle_traj_main([str(traj_dir), str(anno), str(h_dir),
                           str(out)])

    pixel = np.loadtxt(out / "pixel" / ("%s.txt" % videoname))
    world = np.loadtxt(out / "world" / ("%s.txt" % videoname))
    # box CENTERS at ped frames only, x mirrored in world
    np.testing.assert_allclose(
        pixel, [[0, 3, 150.0, 140.0], [12, 3, 160.0, 140.0],
                [12, 3, 350.0, 250.0]])
    np.testing.assert_allclose(
        world, [[0, 3, -150.0, 140.0], [12, 3, -160.0, 140.0],
                [12, 3, -350.0, 250.0]])


def test_split_path_cli_multifuture_all_test(tmp_path):
    """non-anchor mode: the multi-future set is a TEST-only benchmark
    (reference: get_split_path.py:33-34)."""
    from multiverse_tpu.cli.prepare_data import split_path_main

    videos = tmp_path / "videos"
    videos.mkdir()
    for name in ("0400_0_1_0_a_cam1", "0401_2_3_1_b_cam2"):
        (videos / ("%s.mp4" % name)).write_bytes(b"")
    split = tmp_path / "split"
    split_path_main([str(videos), str(split)])

    test_lst = (split / "test.lst").read_text().split()
    assert sorted(test_lst) == ["0400_0_1_0_a_cam1",
                                "0401_2_3_1_b_cam2"]
    assert (split / "train.lst").read_text() == ""
    assert (split / "val.lst").read_text() == ""


def test_split_path_cli_anchor_follows_virat(tmp_path, capsys):
    """anchor mode: each video follows its VIRAT source's original
    split; unmatched sources are dropped with a warning
    (reference: get_split_path.py:36-57)."""
    from multiverse_tpu.cli.prepare_data import split_path_main

    ori = tmp_path / "ori"
    ori.mkdir()
    (ori / "train.lst").write_text("path/VIRAT_S_040000_00.mp4\n")
    (ori / "val.lst").write_text("VIRAT_S_040100_01\n")
    (ori / "test.lst").write_text("VIRAT_S_000000_02\n")

    videos = tmp_path / "videos"
    videos.mkdir()
    names = ["VIRAT_S_040000_00_F_0_1", "VIRAT_S_040100_01_F_2_0",
             "VIRAT_S_000000_02_F_1_1", "VIRAT_S_999999_99_F_0_0"]
    for name in names:
        (videos / ("%s.mp4" % name)).write_bytes(b"")

    split = tmp_path / "split"
    split_path_main([str(videos), str(split),
                     "--is_anchor", "--ori_split_path", str(ori)])

    assert (split / "train.lst").read_text().split() == [
        "VIRAT_S_040000_00_F_0_1"]
    assert (split / "val.lst").read_text().split() == [
        "VIRAT_S_040100_01_F_2_0"]
    assert (split / "test.lst").read_text().split() == [
        "VIRAT_S_000000_02_F_1_1"]
    assert "VIRAT_S_999999_99_F_0_0 not in all lst" in \
        capsys.readouterr().out
