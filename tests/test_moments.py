"""Moment building: homography transforms, annotation merging, YAML."""

import numpy as np
import pytest

from multiverse_tpu.forking_paths.controls import traj_to_controls
from multiverse_tpu.forking_paths.moments import (
    build_final_moments,
    get_scene,
    make_moment_id,
    merge_annotation_into_moment,
    pixel_to_world_ground,
    vehicle_trajectories,
)


def test_get_scene_and_moment_id():
    assert get_scene("VIRAT_S_000201_00_000018_000380") == "0002"
    assert make_moment_id("0400", 3, 7, 1, "a9") == "0400_3_7_1_a9"


def test_pixel_to_world_identity_homography():
    h = np.eye(3)
    out = pixel_to_world_ground(
        np.array([[10.0, 20.0]]), h, scene="0000")
    # x is mirrored for ActEV (reference: combine_traj.py:110-112)
    np.testing.assert_allclose(out, [[-10.0, 20.0]])


def test_pixel_to_world_0002_rescale():
    h = np.eye(3)
    out = pixel_to_world_ground(
        np.array([[1920.0, 1080.0]]), h, scene="0002")
    np.testing.assert_allclose(out, [[-1280.0, 720.0]])


def test_pixel_to_world_projective():
    # a real projective transform: scale 2 + perspective divide
    h = np.array([[2.0, 0.0, 0.0], [0.0, 2.0, 0.0], [0.0, 0.0, 2.0]])
    out = pixel_to_world_ground(
        np.array([[5.0, 7.0]]), h, scene="0000", mirror_x=False)
    np.testing.assert_allclose(out, [[5.0, 7.0]])


def _moment():
    rows = np.asarray([
        [0.0, 1.0, 0.0, 0.0, 0.5],   # x-agent
        [10.0, 1.0, 1.0, 0.0, 0.5],
        [20.0, 1.0, 2.0, 0.0, 0.5],
        [0.0, 2.0, 5.0, 5.0, 0.5],   # bystander
        [10.0, 2.0, 5.5, 5.0, 0.5],
        [20.0, 2.0, 6.0, 5.0, 0.5],
    ])
    ped, _ = traj_to_controls(rows, -1, -1, fps=30.0)
    veh_rows = np.asarray([
        [0.0, 9.0, 20.0, 0.0, 0.0],
        [10.0, 9.0, 25.0, 0.0, 0.0],
    ])
    veh, _ = traj_to_controls(veh_rows, -1, -1, fps=30.0, z_to=0.0)
    return {
        "scenename": "0400",
        "ped_controls": ped,
        "vehicle_controls": veh,
        "x_agents": [1],
    }


def test_merge_annotation_replaces_x_agent():
    moment = _moment()
    annotation = [
        [10, [0.0, 1.0, 0.0], 2.0, [1.0, 0.0, 0.5]],
        [15, [0.0, 1.0, 0.0], 2.0, [1.0, 0.4, 0.5]],
    ]
    merged = merge_annotation_into_moment(
        moment, annotation, x_agent_pid=1, video_fps=30.0)
    # frame 0 (before annotation) keeps the original records
    f0 = merged["ped_controls"]["0"]
    assert any(r[0] == 1.0 for r in f0) and any(r[0] == 2.0 for r in f0)
    # frame 10 has the annotated x-agent record, not the original
    f10 = merged["ped_controls"]["10"]
    x_rec = [r for r in f10 if r[0] == 1][0]
    assert x_rec[4] == 2.0 and x_rec[3] == [0.0, 1.0, 0.0]
    # nothing beyond the annotation horizon
    assert all(int(k) <= 15 for k in merged["ped_controls"])
    assert all(int(k) <= 15 for k in merged["vehicle_controls"])
    # vehicle controls were interpolated to dense frames
    assert "3" in merged["vehicle_controls"]
    # input not mutated
    assert "10" in moment["ped_controls"]


def test_build_final_moments():
    moment = _moment()
    annotations = {
        ("0400_0_1_0", "annoA"): [
            [10, [0.0, 1.0, 0.0], 2.0, [1.0, 0.0, 0.5]],
            [15, [0.0, 1.0, 0.0], 2.0, [1.0, 0.4, 0.5]],
        ],
    }
    out = build_final_moments([moment], annotations, video_fps=30.0)
    assert len(out) == 1
    assert out[0]["moment_id"] == "0400_0_1_0_annoA"


def test_vehicle_trajectories():
    rows = [
        (3, 12, [110.0, 100.0, 210.0, 180.0]),
        (3, 0, [100.0, 100.0, 200.0, 180.0]),
        (5, 0, [0.0, 0.0, 10.0, 10.0]),      # not a vehicle
    ]
    # box CENTER through the homography, x mirrored, sorted by frame
    # (reference: get_vehicle_traj.py:195-222)
    pixel, world = vehicle_trajectories(
        rows, vehicle_ids=[3], homography=np.eye(3), scene="0000")
    np.testing.assert_allclose(pixel, [[0, 3, 150.0, 140.0],
                                       [12, 3, 160.0, 140.0]])
    np.testing.assert_allclose(world, [[0, 3, -150.0, 140.0],
                                       [12, 3, -160.0, 140.0]])


def test_vehicle_trajectories_0002_pixel_upscale():
    # world keeps the native 1280x720 homography space; pixel rows are
    # upscaled x1.5 to the released 1920x1080 videos
    rows = [(7, 4, [100.0, 100.0, 300.0, 200.0])]  # center (200, 150)
    pixel, world = vehicle_trajectories(
        rows, vehicle_ids=[7], homography=np.eye(3), scene="0002")
    np.testing.assert_allclose(pixel, [[4, 7, 300.0, 225.0]])
    np.testing.assert_allclose(world, [[4, 7, -200.0, 150.0]])


def test_vehicle_trajectories_frame_filter():
    rows = [(3, 0, [0.0, 0.0, 2.0, 2.0]), (3, 5, [0.0, 0.0, 2.0, 2.0])]
    pixel, world = vehicle_trajectories(
        rows, vehicle_ids=[3], homography=np.eye(3), scene="0000",
        frame_ids=[0])
    assert [r[0] for r in pixel] == [0]
    assert [r[0] for r in world] == [0]


def test_world_to_carla_transform():
    from multiverse_tpu.forking_paths.moments import (
        ACTEV_WORLD_NORM,
        rotate_xy,
        world_to_carla,
    )

    rows = np.asarray([[0.0, 1.0, -7.51, -7.984, 0.0]])  # 0000 min corner
    out = world_to_carla(rows, "0000", origin_xyz=(100.0, 50.0, 1.0),
                         carla_rotation_deg=90.0, scale=2.0)
    # min corner maps exactly to the map anchor
    np.testing.assert_allclose(out[0, 2:5], [100.0, 50.0, 1.0], atol=1e-9)

    rows2 = np.asarray([[0.0, 1.0, -7.51 + 3.0, -7.984, 0.0]])
    out2 = world_to_carla(rows2, "0000", origin_xyz=(100.0, 50.0, 1.0),
                          carla_rotation_deg=90.0, scale=2.0)
    # +3m in x, scaled 2x, rotated 90° -> +6 in carla y
    np.testing.assert_allclose(out2[0, 2:4], [100.0, 56.0], atol=1e-9)

    r = rotate_xy(np.asarray([[0.0, 0.0, 1.0, 0.0]]), (0, 0), np.pi / 2)
    np.testing.assert_allclose(r[0, 2:4], [0.0, 1.0], atol=1e-12)


def test_batch_plot_traj_carla_cli(tmp_path):
    """mvt-batch-plot-traj-carla: ActEV mode (per-scene calibration,
    vehicle conversion, 0002 skip) + ETH/UCY mode + --job sharding
    (reference: batch_plot_traj_carla.py:1-132)."""
    import numpy as np

    from multiverse_tpu.cli.vis_annotation import (
        batch_plot_traj_carla_main,
    )

    ped_dir = tmp_path / "ped"
    veh_dir = tmp_path / "veh"
    ped_dir.mkdir()
    veh_dir.mkdir()

    def write(path, rows):
        with open(path, "w") as f:
            for r in rows:
                f.write("\t".join("%s" % v for v in r) + "\n")

    names = ["VIRAT_S_040000_01", "VIRAT_S_000201_02",
             "VIRAT_S_000001_00"]
    for name in names:
        write(ped_dir / ("%s.txt" % name),
              [[0, 1, -10.0, 5.0, 0.0], [1, 1, -9.0, 6.0, 0.0]])
        write(veh_dir / ("%s.txt" % name),
              [[0, 9, -5.0, 2.0, 0.0]])

    out_ped = tmp_path / "out_ped"
    out_veh = tmp_path / "out_veh"
    batch_plot_traj_carla_main([
        str(ped_dir), str(out_ped),
        "--traj_vehicle_world_path", str(veh_dir),
        "--save_carla_vehicle_path", str(out_veh)])

    # 0002 skipped; 0400 and 0000 converted (ped + vehicle)
    assert sorted(p.name for p in out_ped.iterdir()) == [
        "VIRAT_S_000001_00.txt", "VIRAT_S_040000_01.txt"]
    assert sorted(p.name for p in out_veh.iterdir()) == [
        "VIRAT_S_000001_00.txt", "VIRAT_S_040000_01.txt"]
    rows = np.loadtxt(out_ped / "VIRAT_S_040000_01.txt")
    assert rows.shape == (2, 5)
    assert np.all(rows[:, 4] == 0.5)  # 0400 calibrated origin z

    # ETH/UCY mode (no vehicles): flat calibration for every file
    out_eth = tmp_path / "out_eth"
    batch_plot_traj_carla_main([str(ped_dir), str(out_eth)])
    assert len(list(out_eth.iterdir())) == 3

    # --job sharding partitions the file list
    shard1 = tmp_path / "s1"
    shard2 = tmp_path / "s2"
    batch_plot_traj_carla_main(
        [str(ped_dir), str(shard1), "--job", "2", "--curJob", "1"])
    batch_plot_traj_carla_main(
        [str(ped_dir), str(shard2), "--job", "2", "--curJob", "2"])
    got = sorted(p.name for p in shard1.iterdir()) + \
        sorted(p.name for p in shard2.iterdir())
    assert sorted(got) == sorted("%s.txt" % n for n in names)
    assert len(list(shard1.iterdir())) == 2
    assert len(list(shard2.iterdir())) == 1
