"""MomentEditor state machine: every reference keybinding's effect
(reference: forking_paths_dataset/code/moment_editor.py:138-172),
exercised headlessly on the pure core."""

import copy

import numpy as np
import pytest

from multiverse_tpu.forking_paths.camera import Transform
from multiverse_tpu.forking_paths.editor import MomentEditor


def _rec(pid, frame, xyz, stationary=False):
    return [float(pid), float(frame), list(xyz),
            [1.0, 0.0, 0.0], 1.0, 0.4, stationary]


def _moment(scene="0400"):
    return {
        "scenename": scene,
        "original_start_frame_id": 0,
        "ped_controls": {
            "0": [_rec(1, 0, [0, 0, 0.5]), _rec(2, 0, [5, 5, 0.5])],
            "12": [_rec(1, 12, [1, 0, 0.5]),
                   _rec(2, 12, [5, 6, 0.5])],
            "24": [_rec(1, 24, [2, 0, 0.5], True)],
        },
        "vehicle_controls": {
            "0": [_rec(9, 0, [10, 10, 0])],
            "12": [_rec(9, 12, [11, 10, 0])],
        },
        "x_agents": {"1": [[2.0, 0.0, 0.5]]},
    }


@pytest.fixture
def ed():
    return MomentEditor([_moment(), _moment("zara01")], fps=30.0)


def test_cycle_toggle_save_duplicate(ed):
    assert ed.cur == 0
    assert ed.cycle_moment(+1) == 1
    assert ed.cycle_moment(+1) == 0
    assert ed.cycle_moment(-1) == 1

    assert ed.toggle_save() is True and ed.saved == {1}
    assert ed.toggle_save() is False and ed.saved == set()
    assert ed.toggle_save_all() is True
    assert ed.saved == {0, 1}
    assert ed.toggle_save_all() is False and ed.saved == set()

    ed.cur = 0
    ed.saved = {1}
    ed.duplicate_moment()
    assert len(ed.moments) == 3
    # the saved index shifted past the insertion
    assert ed.saved == {2}
    assert ed.moments[1] == ed.moments[0]
    assert ed.moments[1] is not ed.moments[0]

    ed.saved = {0}
    assert ed.saved_moments() == [ed.moments[0]]
    ed.saved = set()
    assert len(ed.saved_moments()) == 3  # none marked -> keep all


def test_actor_selection_and_delete(ed):
    assert ed.actor_ids() == [("person", 1.0), ("person", 2.0),
                              ("vehicle", 9.0)]
    assert ed.selected == ("person", 1.0)
    assert ed.select_actor(+1) == ("person", 2.0)
    assert ed.select_actor(+1) == ("vehicle", 9.0)
    assert ed.select_actor(+1) == ("person", 1.0)  # wraps
    assert ed.select_actor(-1) == ("vehicle", 9.0)

    ed.selected = ("person", 1.0)
    ed.delete_selected_actor()
    assert ("person", 1.0) not in ed.actor_ids()
    assert "24" not in ed.moment["ped_controls"]  # frame emptied
    assert "1" not in ed.moment["x_agents"]       # x-agent dropped
    assert ed.selected in ed.actor_ids()


def test_display_toggles_and_scrub(ed):
    assert ed.toggle_static() is False
    assert ed.toggle_static() is True
    assert ed.toggle_traj() is False
    assert ed.total_frames() == 25
    assert ed.scrub(+10) == 10
    assert ed.scrub(+100) == 24     # clamped to total-1
    assert ed.scrub(-100) == 0
    ed.cycle_moment(+1)
    assert ed.scrub_frame == 0      # reset on moment change


def test_delete_last_timestep_and_add_control_point(ed):
    ed.selected = ("person", 1.0)
    f, rec = ed.last_record()
    assert f == 24 and rec[2] == [2, 0, 0.5]
    assert ed.delete_last_timestep() == 24
    assert "24" not in ed.moment["ped_controls"]
    f, _ = ed.last_record()
    assert f == 12

    # click: extend trajectory at the native 12-frame gap
    ed.add_control_point([4.0, 0.0, 0.5])
    f, rec = ed.last_record()
    assert f == 24
    assert rec[2] == [4.0, 0.0, 0.5]
    assert rec[6] is True           # new endpoint stationary
    # the previous endpoint now points toward it with derived speed
    prev = [r for r in ed.moment["ped_controls"]["12"]
            if r[0] == 1.0][0]
    assert prev[6] is False
    np.testing.assert_allclose(prev[3], [1.0, 0.0, 0.0])
    assert prev[4] == pytest.approx(3.0 / (12 / 30.0))


def test_new_actor_mode_and_type(ed):
    assert ed.toggle_new_actor_mode() is True
    assert ed.toggle_new_actor_type() == "vehicle"
    ed.add_control_point([20.0, 20.0, 0.0])
    assert ed.selected == ("vehicle", 10.0)  # max pid 9 + 1
    assert ed.new_actor_mode is True
    recs = ed.moment["vehicle_controls"]["0"]
    assert any(r[0] == 10.0 and r[2] == [20.0, 20.0, 0.0]
               for r in recs)
    assert ed.toggle_new_actor_type() == "person"
    assert ed.toggle_new_actor_mode() is False


def test_set_all_stationary(ed):
    n = ed.set_all_stationary("person")
    assert n == 5
    assert all(r[6] for recs in ed.moment["ped_controls"].values()
               for r in recs)
    assert not all(r[6] for recs
                   in ed.moment["vehicle_controls"].values()
                   for r in recs)
    ed.set_all_stationary("vehicle")
    assert all(r[6] for recs in ed.moment["vehicle_controls"].values()
               for r in recs)


def test_x_agent_ops(ed):
    ed.selected = ("person", 2.0)
    assert ed.set_x_agent() == "2"
    assert ed.moment["x_agents"]["2"] == []
    ed.selected = ("vehicle", 9.0)
    assert ed.set_x_agent() is None  # vehicles can't be x-agents

    ed.selected = ("person", 1.0)
    dest = ed.delete_last_destination()
    assert dest == [2.0, 0.0, 0.5]
    assert ed.delete_last_destination() is None  # now empty


def test_camera_ops(ed):
    p0 = ed.pose
    ed.move_camera(forward=2.0)
    assert ed.pose.x == pytest.approx(p0.x + 2.0)
    ed.move_camera(dyaw=90.0)
    ed.move_camera(forward=2.0)
    assert ed.pose.y == pytest.approx(p0.y + 2.0)
    ed.move_camera(dz=-5.0, dpitch=200.0)
    assert ed.pose.pitch == 89.9    # clamped

    assert ed.zoom(+5.0) == 95.0
    assert ed.zoom(-300.0) == 10.0  # clamped to FOV_MIN
    ed.reset_camera()
    assert ed.pose == Transform(z=30.0, pitch=-50.0)
    assert "fov=10.0" in ed.camera_str()


def test_anchor_view_uses_published_calibration(ed):
    ed.anchor_view()  # scene 0400 from the packaged registry
    assert ed.pose.x == pytest.approx(-160.418839)
    assert ed.fov == 60.0
    ed.cycle_moment(+1)  # zara01
    ed.anchor_view()
    assert ed.pose.pitch == pytest.approx(-62.999184)
    assert ed.fov == 30.0


def test_ops_keep_schema_replayable(ed):
    """Edited moments still drive the sim planner."""
    from multiverse_tpu.forking_paths.sim import SimState, plan_frame

    ed.selected = ("person", 1.0)
    ed.delete_last_timestep()
    ed.add_control_point([4.0, 0.0, 0.5])
    ed.toggle_new_actor_mode()
    ed.add_control_point([30.0, 30.0, 0.5])
    moment = copy.deepcopy(ed.moment)
    state = SimState()
    n_cmds = 0
    for frame in range(ed.total_frames()):
        n_cmds += len(plan_frame(frame, moment["ped_controls"],
                                 moment["vehicle_controls"], state))
    assert n_cmds > 0


def test_mixed_frame_key_spellings_delete_correct_record():
    """Control dicts from hand-edited JSON can hold both "12" and
    "12.0" keys; `q` must delete from the list the record lives in."""
    m = _moment()
    # selected actor's last record moves under the "24.0" spelling
    # while another actor occupies plain "24"
    m["ped_controls"]["24.0"] = m["ped_controls"].pop("24")
    m["ped_controls"]["24"] = [_rec(2, 24, [5, 7, 0.5])]
    ed = MomentEditor([m], fps=30.0)
    ed.selected = ("person", 1.0)
    assert ed.delete_last_timestep() == 24
    # person 1's record is gone, person 2's untouched
    assert all(float(r[0]) != 1.0
               for r in m["ped_controls"].get("24.0", []))
    assert [float(r[0]) for r in m["ped_controls"]["24"]] == [2.0]


def test_fractional_pid_x_agent_keys_do_not_collide():
    """pids 1.0 and 1.5 must map to distinct x_agents entries."""
    m = _moment()
    m["ped_controls"]["0"].append(_rec(1.5, 0, [7, 7, 0.5]))
    ed = MomentEditor([m], fps=30.0)
    ed.selected = ("person", 1.5)
    key = ed.set_x_agent()
    assert key == "1.5"
    assert "1.5" in m["x_agents"] and m["x_agents"]["1"] == [[2.0, 0.0, 0.5]]
    # deleting actor 1.5 removes only its own entry
    ed.delete_selected_actor()
    assert "1.5" not in m["x_agents"]
    assert m["x_agents"]["1"] == [[2.0, 0.0, 0.5]]
    # integral pid reuses the existing "1" spelling
    ed.selected = ("person", 1.0)
    assert ed.set_x_agent() == "1"
