"""Forking Paths toolkit: camera geometry + control conversion."""

import numpy as np
import pytest

from multiverse_tpu.forking_paths import (
    CameraRig,
    SPEED_CALIBRATION,
    Transform,
    compute_intrinsic,
    controls_to_traj,
    direction_and_speed,
    interpolate_controls,
    interpolate_segment,
    parse_carla_depth,
    pixel_to_world,
    project_3d_box,
    project_points,
    to_2d_bbox,
    traj_to_controls,
)


def test_intrinsic():
    k = compute_intrinsic(1920, 1080, 90.0)
    assert k[0, 2] == 960.0 and k[1, 2] == 540.0
    assert k[0, 0] == pytest.approx(960.0)  # 90° fov: f = w/2


def test_depth_decode():
    img = np.zeros((2, 2, 3), np.uint8)
    img[0, 0] = (255, 255, 255)  # max value -> 1000m
    d = parse_carla_depth(img)
    assert d[0, 0] == pytest.approx(1000.0)
    assert d[1, 1] == pytest.approx(0.0)


def test_project_roundtrip():
    rig = CameraRig(
        Transform(x=10.0, y=-5.0, z=20.0, pitch=-45.0, yaw=30.0),
        width=1920, height=1080, fov=90.0)
    world = np.array([[25.0, 3.0, 1.0]])
    uvd = project_points(world, rig)
    assert uvd[0, 2] > 0  # in front of the camera
    back = pixel_to_world(uvd[0, 0], uvd[0, 1], uvd[0, 2], rig)
    np.testing.assert_allclose(back, world[0], atol=1e-6)


def test_camera_center_projects_to_principal_point():
    rig = CameraRig(Transform(z=10.0, pitch=-90.0),
                    width=800, height=600, fov=90.0)
    # straight down: a point directly under the camera hits the center
    uvd = project_points(np.array([[0.0, 0.0, 0.0]]), rig)
    assert uvd[0, 0] == pytest.approx(400.0, abs=1e-6)
    assert uvd[0, 1] == pytest.approx(300.0, abs=1e-6)
    assert uvd[0, 2] == pytest.approx(10.0, abs=1e-6)


def test_3d_box_projection_and_clip():
    rig = CameraRig(Transform(x=-10.0, z=2.0),
                    width=800, height=600, fov=90.0)
    box = project_3d_box((1.0, 0.5, 1.0), Transform(z=1.0), rig)
    assert box.shape == (8, 3)
    bb = to_2d_bbox(box, 800, 600)
    assert bb is not None
    x, y, w, h = bb
    assert 0 <= x <= 800 and w > 0 and h > 0
    # behind the camera -> None
    rig2 = CameraRig(Transform(x=10.0, yaw=0.0, z=2.0),
                     width=800, height=600, fov=90.0)
    box2 = project_3d_box((1.0, 0.5, 1.0), Transform(z=1.0), rig2)
    assert to_2d_bbox(box2, 800, 600) is None


def test_direction_and_speed():
    src = np.array([0.0, 1.0, 0.0, 0.0, 0.0])
    dst = np.array([25.0, 1.0, 3.0, 4.0, 0.0])  # 5m over 1s @ 25fps
    direction, speed, dt = direction_and_speed(dst, src, 25.0)
    np.testing.assert_allclose(direction, [0.6, 0.8, 0.0], atol=1e-9)
    assert dt == pytest.approx(1.0)
    assert speed == pytest.approx(5.0 * SPEED_CALIBRATION)


def test_interpolate_segment():
    p1 = np.array([0.0, 7.0, 0.0, 0.0, 0.0])
    p2 = np.array([4.0, 7.0, 4.0, 8.0, 0.0])
    mid = interpolate_segment(p1, p2)
    assert len(mid) == 3
    np.testing.assert_allclose(mid[0], [1.0, 7.0, 1.0, 2.0, 0.0])
    np.testing.assert_allclose(mid[2], [3.0, 7.0, 3.0, 6.0, 0.0])


def _walking_rows(pid=1.0, n=12, fps=25.0, step=0.2):
    rows = []
    for i in range(n):
        rows.append([float(i), pid, step * i, 0.0, 0.5])
    return np.asarray(rows)


def test_traj_to_controls_moving():
    data = _walking_rows()
    controls, total = traj_to_controls(data, -1, -1, fps=25.0)
    assert total == 11
    assert "0" in controls
    rec = controls["0"][0]
    assert rec[0] == 1.0
    np.testing.assert_allclose(rec[3], [1.0, 0.0, 0.0], atol=1e-9)
    # 0.2m per frame at 25fps = 5 m/s * calibration
    assert rec[4] == pytest.approx(0.2 * 25 * SPEED_CALIBRATION)
    assert rec[6] is False
    # final record signals stop
    last = controls[str(11)][-1]
    assert last[3] is None


def test_traj_to_controls_stationary():
    rows = _walking_rows(step=0.0005, n=80)  # ~0.0125 m over 2s window
    controls, _ = traj_to_controls(rows, -1, -1, fps=25.0)
    assert controls["0"][0][6] is True


def test_controls_roundtrip():
    data = _walking_rows(n=6)
    controls, _ = traj_to_controls(data, -1, -1, fps=25.0)
    traj, frames = controls_to_traj(controls)
    assert 1.0 in traj
    assert frames == list(range(6))
    xs = [r["xyz"][0] for r in traj[1.0]]
    np.testing.assert_allclose(xs, data[:, 2], atol=1e-9)


def test_interpolate_controls_densifies():
    # 5 fps annotation on a 25 fps sim: frames 0, 5, 10
    rows = np.asarray([
        [0.0, 1.0, 0.0, 0.0, 0.0],
        [5.0, 1.0, 1.0, 0.0, 0.0],
        [10.0, 1.0, 2.0, 0.0, 0.0],
    ])
    controls, _ = traj_to_controls(rows, -1, -1, fps=25.0)
    dense = interpolate_controls(controls, fps=25.0)
    assert set(map(int, dense.keys())) == set(range(11))
    # interpolated frame 2 sits at x=0.4
    rec = dense["2"][0]
    assert rec[2][0] == pytest.approx(0.4)
