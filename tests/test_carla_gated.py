"""Exercise the carla-gated adapter/replay/scene code against the
in-memory fake carla (tests/fake_carla.py) — covers spawn/control/
destroy batching, spawn-failure policies, collision plumbing, static
scene setup, and the candidate replay loop."""

import sys

import numpy as np
import pytest

from tests import fake_carla


@pytest.fixture
def carla_env():
    mod = fake_carla.install()
    yield mod
    sys.modules.pop("carla", None)
    # the adapter imports carla lazily per-instance; nothing cached


def _walker_bps(world):
    return (world.get_blueprint_library().filter(
        "walker.pedestrian.*"), [0])


def _vehicle_bps(world):
    return (world.get_blueprint_library().filter("vehicle.*"), [0])


def _controls(rows, fps=25.0, **kw):
    from multiverse_tpu.forking_paths.controls import traj_to_controls

    return traj_to_controls(np.asarray(rows, np.float64), -1, -1,
                            fps, **kw)[0]


def test_adapter_spawn_control_destroy(carla_env):
    from multiverse_tpu.forking_paths.sim import (
        CarlaAdapter,
        SimState,
        plan_frame,
    )

    client = carla_env.Client()
    world = client.get_world()
    adapter = CarlaAdapter(world, client, _walker_bps(world),
                           _vehicle_bps(world))
    state = SimState()
    ped = _controls([[0, 1, 0, 0, 0.5], [1, 1, 1, 0, 0.5],
                     [2, 1, 2, 0, 0.5]])
    veh = _controls([[0, 9, 5, 5, 0], [1, 9, 6, 6, 0],
                     [2, 9, 7, 7, 0]], z_to=0.0)

    adapter.execute(plan_frame(0, ped, veh, state), state)
    # walker + its collision sensor + vehicle spawned
    kinds = sorted(a.type_id for a in world.actors)
    assert kinds == ["sensor.other.collision", "vehicle.fake",
                     "walker.pedestrian"]
    veh_actor = [a for a in world.actors
                 if a.type_id == "vehicle.fake"][0]
    assert veh_actor.physics is False  # teleported vehicles

    adapter.execute(plan_frame(1, ped, veh, state), state)
    walker = [a for a in world.actors
              if a.type_id == "walker.pedestrian"][0]
    assert walker.controls, "walker received a WalkerControl"
    assert walker.controls[-1].speed > 0
    # vehicle teleported via ApplyTransform
    assert veh_actor.get_transform().location.x == pytest.approx(6.0)

    adapter.execute(plan_frame(2, ped, veh, state), state)
    assert not walker.is_alive  # destroyed at the final record
    adapter.cleanup()
    assert all(not a.is_alive for a in world.actors
               if a.type_id.startswith("sensor"))


def test_adapter_walker_spawn_failure_policies(carla_env):
    from multiverse_tpu.forking_paths.sim import (
        CarlaAdapter,
        SimState,
        plan_frame,
    )

    ped = _controls([[0, 1, 0, 0, 0.5], [1, 1, 1, 0, 0.5],
                     [2, 1, 2, 0, 0.5]])

    # tolerant mode: spawn failure skips the walker, keeps running
    client = carla_env.Client()
    world = client.get_world()
    world.fail_walker_spawns = 1
    adapter = CarlaAdapter(world, client, _walker_bps(world),
                           _vehicle_bps(world))
    state = SimState()
    out = adapter.execute(plan_frame(0, ped, {}, state), state)
    assert out is not None
    assert 1.0 not in state.peds  # rolled back, retried next frame

    # strict mode (candidate validation): returns None
    client2 = carla_env.Client()
    world2 = client2.get_world()
    world2.fail_walker_spawns = 1
    adapter2 = CarlaAdapter(world2, client2, _walker_bps(world2),
                            _vehicle_bps(world2),
                            exit_if_spawn_fail=True)
    state2 = SimState()
    assert adapter2.execute(plan_frame(0, ped, {}, state2),
                            state2) is None


def test_replay_moment_success_and_spawn_fail(carla_env):
    from multiverse_tpu.forking_paths.candidates import replay_moment

    ped = _controls([[0, 1, 0, 0, 0.5], [5, 1, 1, 0, 0.5],
                     [10, 1, 2, 0, 0.5]])
    client = carla_env.Client()
    world = client.get_world()
    ok, reason, veh_fail = replay_moment(
        client, world, _walker_bps(world), _vehicle_bps(world),
        ped, {}, start_frame=0, total_frames=10)
    assert ok and reason == "" and veh_fail is False
    assert world.frame == 10  # ticked once per frame

    world2 = carla_env.Client().get_world()
    world2.fail_walker_spawns = 99
    client2 = carla_env.Client(world2)
    ok, reason, _ = replay_moment(
        client2, world2, _walker_bps(world2), _vehicle_bps(world2),
        ped, {}, start_frame=0, total_frames=10)
    assert not ok and reason == "Ped spawn fails."


def test_scene_setup(carla_env):
    from multiverse_tpu.forking_paths.scenes import (
        SceneConfig,
        StaticCar,
        Weather,
        apply_weather,
        spawn_static_cars,
    )

    client = carla_env.Client()
    world = client.get_world()
    scene = SceneConfig(
        name="0400", map="Town05", fps=30.0,
        weather=Weather(cloudyness=20.0, sun_altitude_angle=65.0),
        static_cars=(StaticCar("vehicle.tesla.model3",
                               (1.0, 2.0, 0.3), (0.0, 90.0, 0.0)),))
    apply_weather(world, scene.weather)
    assert world.weather.params["cloudyness"] == 20.0
    actors: list = []
    spawn_static_cars(world, client, scene, actors)
    assert len(actors) == 1


def test_record_moment_end_to_end(carla_env, tmp_path):
    """The full rendering loop against the fake backend: sensor
    queues, per-frame projected boxes, mp4 encoding, bbox json."""
    import json
    import os

    import cv2

    from multiverse_tpu.forking_paths.camera import CameraRig, Transform
    from multiverse_tpu.forking_paths.recorder import record_moment
    from multiverse_tpu.forking_paths.scenes import SceneConfig, Weather

    client = carla_env.Client()
    scene = SceneConfig(name="0400", map="Town05", fps=25.0,
                        weather=Weather())
    # camera behind origin looking +x so spawned actors are in frame
    rigs = [CameraRig(Transform(x=-15.0, z=3.0), 64, 48, 90.0)]
    ped = _controls([[0, 1, 0, 0, 0.5], [5, 1, 1, 0, 0.5],
                     [10, 1, 2, 0, 0.5]])
    out = record_moment(
        client, scene, rigs, ped, {}, total_frames=10,
        out_path=str(tmp_path), moment_name="0400_0_1_0_a",
        x_agent_pid=1.0)
    name = "0400_0_1_0_a_cam1"
    assert name in out
    vcap = cv2.VideoCapture(out[name])
    assert vcap.isOpened()
    assert int(vcap.get(cv2.CAP_PROP_FRAME_COUNT)) == 10
    vcap.release()
    seg_video = os.path.join(tmp_path, "videos_seg", "%s.mp4" % name)
    assert os.path.exists(seg_video)
    # the seg video must hold CityScapes PALETTE colors (the fake
    # sensor emits raw class-4 frames): the downstream decoder must
    # recover class 4 (pedestrian), not background
    from multiverse_tpu.forking_paths.prepared_data import (
        seg_rgb_to_carla_ids)

    scap = cv2.VideoCapture(seg_video)
    ok, frame = scap.read()
    scap.release()
    assert ok
    ids = seg_rgb_to_carla_ids(frame[:, :, ::-1])  # BGR -> RGB
    assert (ids == 4).mean() > 0.99
    with open(os.path.join(tmp_path, "bbox", "%s.json" % name)) as f:
        boxes = json.load(f)
    assert boxes, "walker boxes recorded"
    assert all(b["class_name"] == "Person" for b in boxes)
    assert any(b["is_x_agent"] == 1 for b in boxes)
    x1, y1, w, h = boxes[0]["bbox"]
    assert 0 <= x1 <= 64 and w > 0
    # sync mode restored off afterwards
    assert client.get_world().settings.synchronous_mode is False


def test_find_candidate_moments_sweep(carla_env, tmp_path):
    """The auto_moment_candidates sweep: window extraction + replay
    validation + success-record schema over real trajectory files."""
    from multiverse_tpu.forking_paths.candidates import (
        find_candidate_moments,
        save_candidates,
    )
    from multiverse_tpu.forking_paths.scenes import (
        SceneConfig,
        SceneRegistry,
        Weather,
    )

    rows = ["%d\t1\t%.2f\t%.2f\t0.5" % (f, 0.2 * f, 0.0)
            for f in range(0, 100, 5)]
    traj_file = tmp_path / "VIRAT_S_040000_00.txt"
    traj_file.write_text("\n".join(rows) + "\n")

    registry = SceneRegistry(
        scenes={"0400": SceneConfig("0400", "Town05", 25.0, Weather())},
        cameras={})

    def get_scene(name):
        return name.split("_S_")[-1][:4]

    client = carla_env.Client()
    success, fails = find_candidate_moments(
        client, [str(traj_file)], registry, get_scene,
        moment_length=2.0, test_skip=5)
    assert "0400" in success and success["0400"]
    rec = success["0400"][0]
    assert rec["scenename"] == "0400"
    assert rec["ped_controls"]          # rebased controls present
    assert 0 in rec["ped_controls"]
    assert rec["x_agents"] == {}
    save_candidates(success, str(tmp_path / "moments"))
    import json
    import os

    with open(tmp_path / "moments" / "0400.json") as f:
        loaded = json.load(f)
    assert loaded[0]["original_start_frame_id"] == rec[
        "original_start_frame_id"]


def test_record_moments_cli_published_calibration(carla_env, tmp_path):
    """mvt-record-moments end-to-end on the fake backend with NO
    registry argument: the packaged published Forking Paths calibration
    supplies the real 4-view recording rig for scene 0400 (reference:
    record_annotation.py + utils.py:201-306)."""
    import json
    import os

    from multiverse_tpu.cli.vis_dataset import record_moments_main

    ped = _controls([[0, 1, 0, 0, 0.5], [1, 1, 1, 0, 0.5],
                     [2, 1, 2, 0, 0.5]])
    moment = {
        "scenename": "0400",
        "moment_id": "0400_0_1_0",
        "ped_controls": ped,
        "vehicle_controls": {},
        "x_agents": {"1": []},
    }
    moment_json = tmp_path / "moments.json"
    moment_json.write_text(json.dumps([moment], default=float))
    out = tmp_path / "out"

    record_moments_main([str(moment_json), str(out)])

    # one rgb mp4 + one seg mp4 + one bbox json per published view
    videos = sorted(os.listdir(out / "videos"))
    assert videos == ["0400_0_1_0_cam%d.mp4" % i for i in range(1, 5)]
    assert sorted(os.listdir(out / "videos_seg")) == videos
    assert sorted(os.listdir(out / "bbox")) == [
        "0400_0_1_0_cam%d.json" % i for i in range(1, 5)]


def test_record_moment_start_offset(carla_env, tmp_path):
    """start_offset frames are simulated but not recorded, and the
    recorded bbox frame ids are rebased (reference:
    record_annotation.py:57,308-333)."""
    import json
    import os

    import cv2

    from multiverse_tpu.forking_paths.camera import CameraRig, Transform
    from multiverse_tpu.forking_paths.recorder import record_moment
    from multiverse_tpu.forking_paths.scenes import SceneConfig, Weather

    client = carla_env.Client()
    scene = SceneConfig(name="0400", map="Town05", fps=25.0,
                        weather=Weather())
    rigs = [CameraRig(Transform(x=-15.0, z=3.0), 64, 48, 90.0)]
    ped = _controls([[0, 1, 0, 0, 0.5], [5, 1, 1, 0, 0.5],
                     [10, 1, 2, 0, 0.5]])
    out = record_moment(
        client, scene, rigs, ped, {}, total_frames=10,
        out_path=str(tmp_path), moment_name="m", x_agent_pid=1.0,
        start_offset=4, cam_num_offset=2)
    # camera index offset lands in the names
    assert list(out) == ["m_cam3"]
    vcap = cv2.VideoCapture(out["m_cam3"])
    assert int(vcap.get(cv2.CAP_PROP_FRAME_COUNT)) == 6  # 10 - 4
    vcap.release()
    with open(os.path.join(tmp_path, "bbox", "m_cam3.json")) as f:
        boxes = json.load(f)
    fids = sorted({b["frame_id"] for b in boxes})
    assert fids[0] == 0 and fids[-1] == 5  # rebased by -start_offset


def test_record_moments_cli_anchor_mode(carla_env, tmp_path):
    """--is_anchor_moment records the anchor view for a fixed
    obs+pred window with an anchor-style moment id and no x-agent;
    --add_3view_to_anchor widens the rig set from the recording group
    (reference: record_annotation.py:59-65,176-196,234-239)."""
    import json
    import os

    from multiverse_tpu.cli.vis_dataset import record_moments_main
    from multiverse_tpu.forking_paths.scenes import REALISM_WEATHER

    rig = {"fov": 90.0, "location_xyz": [-15.0, 0.0, 3.0],
           "rotation_pyr": [0.0, 0.0, 0.0], "width": 64, "height": 48}
    registry = {
        "scenes": {"0400": {"map": "Town05_actev", "fps": 30.0,
                            "static_cars": [], "weather": {}}},
        "cameras": {"anchor": {"0400": [rig]},
                    "recording": {"0400": [rig, rig, rig, rig]}},
    }
    reg_path = tmp_path / "registry.json"
    reg_path.write_text(json.dumps(registry))

    # long enough controls for the (3 + 2 - 1) * 4 = 16-frame window
    ped = _controls([[0, 1, 0, 0, 0.5], [8, 1, 1, 0, 0.5],
                     [16, 1, 2, 0, 0.5]], fps=30.0)
    moment = {
        "scenename": "0400",
        "filename": "VIRAT_S_040000_00",
        "original_start_frame_id": 1234,
        "ped_controls": ped,
        "vehicle_controls": {},
    }
    moment_json = tmp_path / "moments.json"
    moment_json.write_text(json.dumps([moment], default=float))
    out = tmp_path / "out"

    record_moments_main([
        str(moment_json), str(out),
        "--scene_registry", str(reg_path),
        "--is_anchor_moment", "--add_3view_to_anchor",
        "--use_alter_weather",
        "--video_fps", "10", "--annotation_fps", "2.5",
        "--obs_length", "3", "--pred_length", "2"])

    name = "VIRAT_S_040000_00_F_1234_obs3_pred2"
    videos = sorted(os.listdir(out / "videos"))
    # anchor view + recording views 2-4
    assert videos == ["%s_cam%d.mp4" % (name, i) for i in range(1, 5)]
    with open(out / "bbox" / ("%s_cam1.json" % name)) as f:
        boxes = json.load(f)
    # no x-agent in anchor recordings
    assert not any(b.get("is_x_agent") for b in boxes)
    # weather_override plumbing (the fake backend worlds are
    # per-client, so drive record_moment directly)
    from multiverse_tpu.forking_paths.camera import CameraRig, Transform
    from multiverse_tpu.forking_paths.recorder import record_moment
    from multiverse_tpu.forking_paths.scenes import SceneConfig, Weather

    client = carla_env.Client()
    record_moment(
        client, SceneConfig(name="0400", map="Town05", fps=25.0,
                            weather=Weather()),
        [CameraRig(Transform(x=-15.0, z=3.0), 64, 48, 90.0)],
        ped, {}, total_frames=2, out_path=str(tmp_path / "w"),
        moment_name="w", weather_override=REALISM_WEATHER)
    assert client.get_world().weather.params["cloudyness"] == \
        REALISM_WEATHER.cloudyness


def _actev_registry_json(tmp_path):
    import json

    registry = {
        "scenes": {"0400": {"map": "Town05", "fps": 25.0,
                            "static_cars": [], "weather": {}}},
        "cameras": {},
    }
    reg_path = tmp_path / "registry.json"
    reg_path.write_text(json.dumps(registry))
    return str(reg_path)


def test_build_moment_cli(carla_env, tmp_path, capsys):
    """mvt-build-moment replays one trajectory window on the fake
    backend (reference: build_moment.py)."""
    from multiverse_tpu.cli.moment_tools import build_moment_main

    rows = ["%d\t1\t%.2f\t%.2f\t0.5" % (f, 0.2 * f, 0.0)
            for f in range(0, 100, 5)]
    traj_file = tmp_path / "VIRAT_S_040000_00.txt"
    traj_file.write_text("\n".join(rows) + "\n")
    veh_rows = ["%d\t9\t%.2f\t%.2f\t0.0" % (f, 30.0 - 0.1 * f, 5.0)
                for f in range(0, 100, 5)]
    veh_file = tmp_path / "veh.txt"
    veh_file.write_text("\n".join(veh_rows) + "\n")

    build_moment_main([
        str(traj_file), "0", "95",
        "--vehicle_traj", str(veh_file), "--vehicle_z", "0.2",
        "--show_traj",
        "--scene_registry", _actev_registry_json(tmp_path)])
    out = capsys.readouterr().out
    assert "replay OK" in out
    # sync mode restored off afterwards
    client = carla_env.Client()
    assert client.get_world().settings.synchronous_mode is False


def test_auto_moment_candidates_cli(carla_env, tmp_path):
    """mvt-auto-moment-candidates end-to-end on the fake backend
    (reference: auto_moment_candidates.py)."""
    import json

    from multiverse_tpu.cli.moment_tools import auto_candidates_main

    traj_dir = tmp_path / "traj"
    traj_dir.mkdir()
    rows = ["%d\t1\t%.2f\t%.2f\t0.5" % (f, 0.2 * f, 0.0)
            for f in range(0, 100, 5)]
    (traj_dir / "VIRAT_S_040000_00.txt").write_text(
        "\n".join(rows) + "\n")

    moments = tmp_path / "moments"
    log_file = tmp_path / "fails.log"
    auto_candidates_main([
        str(traj_dir), str(moments),
        "--is_actev", "--only_scene", "0400",
        "--moment_length", "2.0", "--test_skip", "5",
        "--log_file", str(log_file),
        "--scene_registry", _actev_registry_json(tmp_path)])

    with open(moments / "0400.json") as f:
        recs = json.load(f)
    assert recs and recs[0]["scenename"] == "0400"
    assert recs[0]["ped_controls"]
    assert log_file.exists()

    # only_scene filtering to a scene with no files -> clean error
    import pytest

    with pytest.raises(SystemExit):
        auto_candidates_main([
            str(traj_dir), str(moments), "--is_actev",
            "--only_scene", "0000",
            "--scene_registry", _actev_registry_json(tmp_path)])


def test_auto_moment_candidates_rejects_unregistered_scene(
        carla_env, tmp_path):
    """A traj file whose scene is not in the registry must fail BEFORE
    the sweep (a KeyError mid-sweep would discard hours of accumulated
    replay results)."""
    from multiverse_tpu.cli.moment_tools import auto_candidates_main

    traj_dir = tmp_path / "traj"
    traj_dir.mkdir()
    (traj_dir / "VIRAT_S_040000_00.txt").write_text("0\t1\t0\t0\t0.5\n")
    # scene 0500 is NOT in the registry (only 0400 is)
    (traj_dir / "VIRAT_S_050000_00.txt").write_text("0\t1\t0\t0\t0.5\n")

    with pytest.raises(SystemExit, match="0500"):
        auto_candidates_main([
            str(traj_dir), str(tmp_path / "moments"), "--is_actev",
            "--scene_registry", _actev_registry_json(tmp_path)])


def test_record_moment_rejects_start_offset_past_end(carla_env,
                                                     tmp_path):
    """start_offset >= total_frames records zero frames — refuse up
    front instead of crashing in encode_video after the simulation."""
    from multiverse_tpu.forking_paths.recorder import record_moment
    from multiverse_tpu.forking_paths.scenes import SceneConfig, Weather

    client = carla_env.Client()
    scene = SceneConfig(name="0400", map="Town05", fps=25.0,
                        weather=Weather())
    with pytest.raises(ValueError, match="start_offset"):
        record_moment(
            client, scene, rigs=[], ped_controls={},
            vehicle_controls={}, total_frames=5,
            out_path=str(tmp_path), moment_name="m",
            start_offset=10)
