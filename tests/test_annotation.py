"""Annotation session machine + candidate window slicing."""

import numpy as np
import pytest

from multiverse_tpu.forking_paths.annotation import (
    AnnotationSession,
    add_x_agent_destination,
    approve_moment,
    iter_annotation_tasks,
    remove_x_agent,
)
from multiverse_tpu.forking_paths.candidates import (
    make_moment_record,
    moment_windows,
    slice_controls,
)
from multiverse_tpu.forking_paths.controls import traj_to_controls


def _moments():
    return [
        {"scenename": "0400",
         "x_agents": {"1": [[5.0, 0.0, 0.5], [0.0, 5.0, 0.5]],
                      "2": [[9.0, 9.0, 0.5]]}},
        {"scenename": "zara01",
         "x_agents": {"3": [[1.0, 1.0, 0.5]]}},
    ]


def test_task_schedule():
    tasks = list(iter_annotation_tasks(_moments()))
    assert tasks == [(0, 1, 0), (0, 1, 1), (0, 2, 0), (1, 3, 0)]


def test_task_sharding():
    """start_idx / job / curJob split the task list across annotator
    processes (reference: annotate_carla.py:74-77,330-332): every
    job-th task after the start moment, shards disjoint + complete."""
    all_tasks = list(iter_annotation_tasks(_moments()))
    s1 = AnnotationSession(_moments(), obs_last_frame=1, max_frame=9,
                           job=2, cur_job=1)
    s2 = AnnotationSession(_moments(), obs_last_frame=1, max_frame=9,
                           job=2, cur_job=2)
    assert s1._tasks == all_tasks[0::2]
    assert s2._tasks == all_tasks[1::2]
    s3 = AnnotationSession(_moments(), obs_last_frame=1, max_frame=9,
                           start_idx=1)
    assert s3._tasks == [(1, 3, 0)]


def test_session_reach_and_fail():
    s = AnnotationSession(_moments(), obs_last_frame=132, max_frame=456)
    assert s.current_traj_key() == "0400_0_1_0"
    assert s.in_obs_phase(100) and not s.in_obs_phase(200)

    # walk toward the first destination
    s.record(140, [1.0, 0.0, 0.0], 2.0, [2.5, 0.0, 0.5])
    assert s.step(140, [2.5, 0.0, 0.5]) == "continue"
    s.record(150, [1.0, 0.0, 0.0], 2.0, [4.5, 0.0, 0.5])
    assert s.step(150, [4.5, 0.0, 0.5]) == "reached"  # within 2m of dest
    assert "0400_0_1_0" in s.saved
    assert len(s.saved["0400_0_1_0"]) == 2
    assert s.failure_counts["0400_0_1_0"] == 0
    assert s.current_traj_key() == "0400_0_1_1"

    # collide -> attempt restarts, samples dropped
    s.record(140, [0.0, 1.0, 0.0], 2.0, [0.0, 1.0, 0.5])
    assert s.step(140, [0.0, 1.0, 0.5], collided=True) == "failed"
    # timeout also fails
    assert s.step(999, [0.0, 1.0, 0.5]) == "failed"
    # eventually succeed; failure count recorded
    assert s.step(150, [0.0, 4.0, 0.5]) == "reached"
    assert s.failure_counts["0400_0_1_1"] == 2

    assert s.step(150, [9.0, 8.0, 0.5]) == "reached"
    assert s.step(150, [1.0, 2.0, 0.5]) == "reached"
    assert s.done
    assert set(s.saved) == {
        "0400_0_1_0", "0400_0_1_1", "0400_0_2_0", "zara01_1_3_0"}


def test_editor_ops():
    m = {"scenename": "0400", "x_agents": {}}
    m2 = add_x_agent_destination(m, 5, [1.0, 2.0, 0.5])
    m2 = add_x_agent_destination(m2, 5, [3.0, 4.0, 0.5])
    key = 5 if 5 in m2["x_agents"] else "5"
    assert len(m2["x_agents"][key]) == 2
    assert m["x_agents"] == {}  # input not mutated
    m3 = remove_x_agent(m2, 5)
    assert not m3["x_agents"]
    assert approve_moment(m)["approved"] is True


def test_moment_windows_and_slicing():
    rows = np.asarray([
        [float(f), 1.0, 0.1 * f, 0.0, 0.5] for f in range(0, 100, 5)
    ])
    controls, _ = traj_to_controls(rows, -1, -1, fps=25.0, no_offset=True)
    windows = list(moment_windows(controls, moment_length_frames=50,
                                  test_skip=2))
    assert windows[0][0] == 0 and windows[0][1] >= 50
    # slicing rebases to zero
    sliced = slice_controls(controls, windows[1][0], windows[1][1])
    assert 0 in sliced
    rec = make_moment_record("vid", "0400", {}, windows[1][0],
                             sliced, {})
    assert rec["original_start_frame_id"] == windows[1][0]
    assert rec["x_agents"] == {}
