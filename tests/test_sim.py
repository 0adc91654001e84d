"""Simulation command planner + scene registry (no CARLA needed)."""

import json

import numpy as np
import pytest

from multiverse_tpu.forking_paths.controls import traj_to_controls
from multiverse_tpu.forking_paths.scenes import (
    load_scene_registry,
    scene_registry_schema,
)
from multiverse_tpu.forking_paths.sim import (
    SimState,
    plan_frame,
    smoothed_yaw,
)


def _controls():
    rows = np.asarray([
        [0.0, 1.0, 0.0, 0.0, 0.5],
        [1.0, 1.0, 1.0, 0.0, 0.5],
        [2.0, 1.0, 2.0, 0.0, 0.5],
    ])
    controls, _ = traj_to_controls(rows, -1, -1, fps=25.0)
    return controls


def test_plan_spawn_control_destroy():
    controls = _controls()
    state = SimState()
    cmds0 = plan_frame(0, controls, {}, state)
    kinds = [c.kind for c in cmds0]
    assert kinds == ["spawn_walker", "walker_control"]
    assert cmds0[1].speed > 0
    assert 1.0 in state.peds

    cmds1 = plan_frame(1, controls, {}, state)
    assert [c.kind for c in cmds1] == ["walker_control"]

    cmds2 = plan_frame(2, controls, {}, state)
    assert [c.kind for c in cmds2] == ["destroy_walker"]
    assert 1.0 not in state.peds


def test_stationary_walker_gets_zero_control():
    rows = np.asarray([
        [0.0, 1.0, 0.0, 0.0, 0.5],
        [1.0, 1.0, 0.001, 0.0, 0.5],
        [60.0, 1.0, 0.002, 0.0, 0.5],
    ])
    controls, _ = traj_to_controls(rows, -1, -1, fps=25.0)
    state = SimState()
    cmds = plan_frame(0, controls, {}, state)
    ctrl = [c for c in cmds if c.kind == "walker_control"][0]
    assert ctrl.speed == 0.0 and ctrl.direction == (0.0, 0.0, 0.0)


def test_excepts_skips_actor():
    controls = _controls()
    state = SimState()
    cmds = plan_frame(0, controls, {}, state, excepts=(1.0,))
    assert cmds == []


def test_vehicle_yaw_smoothing():
    state = SimState()
    state.note_vehicle(7.0, (1.0, 0.0))
    # first yaw establishes the baseline
    y0 = smoothed_yaw(state, 7.0, (1.0, 0.0, 0.0), max_yaw_change=60)
    assert y0 == pytest.approx(0.0)
    # 30° change allowed
    y1 = smoothed_yaw(
        state, 7.0, (np.cos(np.radians(30)), np.sin(np.radians(30)), 0.0),
        max_yaw_change=60)
    assert y1 == pytest.approx(30.0)
    # 170° jump clamped to previous
    y2 = smoothed_yaw(state, 7.0, (-1.0, 0.02, 0.0), max_yaw_change=60)
    assert y2 == pytest.approx(y1)


def test_vehicle_plan_teleports():
    rows = np.asarray([
        [0.0, 9.0, 0.0, 0.0, 0.0],
        [1.0, 9.0, 1.0, 1.0, 0.0],
        [2.0, 9.0, 2.0, 2.0, 0.0],
    ])
    controls, _ = traj_to_controls(rows, -1, -1, fps=25.0, z_to=0.0)
    state = SimState()
    cmds = plan_frame(0, {}, controls, state)
    kinds = [c.kind for c in cmds]
    assert kinds == ["spawn_vehicle", "vehicle_teleport"]
    # the spawn-frame teleport defers its yaw: the real forward vector
    # only exists after the adapter spawns the actor (a placeholder
    # would poison veh_prev_yaw and the clamp keeps wrong headings)
    assert cmds[1].yaw is None
    assert cmds[1].direction is not None
    from multiverse_tpu.forking_paths.sim import smoothed_yaw

    state.note_vehicle(9.0, (1.0, 0.0))  # what the adapter does
    assert smoothed_yaw(state, 9.0, cmds[1].direction,
                        cmds[1].max_yaw_change) == pytest.approx(45.0)
    # subsequent frames plan concrete yaws against the recorded forward
    cmds1 = plan_frame(1, {}, controls, state)
    tele = [c for c in cmds1 if c.kind == "vehicle_teleport"]
    assert tele and tele[0].yaw == pytest.approx(45.0)


def test_scene_registry_roundtrip(tmp_path):
    path = tmp_path / "registry.json"
    path.write_text(json.dumps(scene_registry_schema()))
    reg = load_scene_registry(str(path))
    assert "zara01" in reg.scenes
    sc = reg.scenes["zara01"]
    assert sc.fps == 25.0 and sc.map == "Town03_ethucy"
    rigs = reg.recording_cameras("zara01")
    assert len(rigs) == 1
    assert rigs[0].intrinsic.shape == (3, 3)


def test_published_calibration_registry():
    """The packaged Forking Paths calibration matches the published
    recording setup (reference: forking_paths_dataset/code/utils.py:
    80-332 — 7 scenes + zara02 alias, 4 recording views each, one
    anchor + one annotation cam, 1920x1080 @ the per-view FOVs)."""
    import numpy as np

    from multiverse_tpu.forking_paths.scenes import (
        default_registry_path,
        load_default_registry,
    )

    assert default_registry_path().endswith("forking_paths.json")
    reg = load_default_registry()

    scenes = {"zara01", "zara02", "eth", "hotel",
              "0000", "0400", "0401", "0500"}
    assert set(reg.scenes) == scenes
    for group in ("recording", "anchor", "annotation"):
        assert set(reg.cameras[group]) == scenes

    for name in scenes:
        rigs = reg.recording_cameras(name)
        assert len(rigs) == 4, name  # anchor/left/right/top-down
        assert len(reg.cameras["anchor"][name]) == 1
        assert len(reg.cameras["annotation"][name]) == 1
        # annotation cams are all 90° FOV (utils.py:309-332)
        assert reg.cameras["annotation"][name][0].fov == 90.0
        for rig in rigs:
            K = rig.intrinsic
            assert K.shape == (3, 3)
            # 1920x1080 default + fov: fx = w / (2 tan(fov/2))
            fx = 1920.0 / (2.0 * np.tan(np.deg2rad(rig.fov) / 2.0))
            assert K[0, 0] == pytest.approx(fx)
            assert K[0, 2] == 960.0 and K[1, 2] == 540.0

    # zara02 is an alias of zara01 (utils.py:173,199,306,331)
    z1, z2 = reg.scenes["zara01"], reg.scenes["zara02"]
    assert (z1.map, z1.fps, z1.weather) == (z2.map, z2.fps, z2.weather)
    assert reg.recording_cameras("zara01") == reg.recording_cameras("zara02")

    # spot-check hand-calibrated values against the reference tables
    sc = reg.scenes["0400"]
    assert sc.map == "Town05_actev" and sc.fps == 30.0
    assert sc.weather.sun_altitude_angle == 65.0
    assert sc.weather.sun_azimuth_angle == -20.0
    anchor = reg.cameras["anchor"]["zara01"][0]
    assert anchor.transform.x == pytest.approx(-33.863022)
    assert anchor.transform.pitch == pytest.approx(-62.999184)
    assert anchor.fov == 30.0
    top_down_0500 = reg.recording_cameras("0500")[3]
    assert top_down_0500.transform.z == pytest.approx(52.925720)
    assert top_down_0500.fov == 70.0
    hotel_ann = reg.cameras["annotation"]["hotel"][0]
    assert hotel_ann.transform.yaw == pytest.approx(-0.431061)
