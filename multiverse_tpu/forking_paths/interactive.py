"""Interactive CARLA tools: annotation game + free-fly spectator.

Compact drivers over the tested cores (session state machine in
annotation.py, sim planner/adapter in sim.py, camera math in
camera.py).  They need a CARLA 0.9.6 server + pygame + a display and
are therefore exercised manually, not in CI (STATUS.md marks them 🟡).

reference: forking_paths_dataset/code/annotate_carla.py (the
annotation game: replay the obs phase, hand the x-agent to the
annotator with WASD, restart on collision/timeout, save per-frame
controls) and spectator.py (free-fly camera, click → 3D via the depth
sensor).

Keys (annotation): W/S forward/stop, A/D turn, ESC quit.
Keys (spectator): WASD+QE move, arrow keys rotate, click prints the
3D point under the cursor, P screenshot, ESC quit.
"""

from __future__ import annotations

import json
import math
import os
from typing import List, Optional

import numpy as np

from multiverse_tpu.forking_paths.annotation import (
    AnnotationSession,
    save_annotation,
)
from multiverse_tpu.forking_paths.camera import (
    CameraRig,
    Transform,
    parse_carla_depth,
    pixel_to_world,
)
from multiverse_tpu.forking_paths.sim import (
    CarlaAdapter,
    SimState,
    plan_frame,
)

WALK_SPEED = 1.4      # m/s handed to WalkerControl while annotating
TURN_DEG_PER_TICK = 4.0


def _pygame_surface(pygame, image) -> "pygame.Surface":
    arr = np.frombuffer(image.raw_data, np.uint8).reshape(
        image.height, image.width, 4)[:, :, 2::-1]
    return pygame.surfarray.make_surface(arr.swapaxes(0, 1))


def run_annotation_game(
    client,
    moment_data: List[dict],
    out_file: str,
    video_fps: float = 30.0,
    obs_length: int = 12,
    pred_length: int = 26,
    annotation_fps: float = 2.5,
    camera_rig: Optional[CameraRig] = None,
) -> dict:
    """One annotator pass; writes the saved-annotation JSON and
    returns it (reference: annotate_carla.py main loop)."""
    import carla
    import pygame

    frame_skip = int(video_fps / annotation_fps)
    obs_last = (obs_length - 1) * frame_skip
    max_frame = (obs_length + pred_length) * frame_skip

    session = AnnotationSession(
        moment_data, obs_last_frame=obs_last, max_frame=max_frame)

    pygame.init()
    rig = camera_rig or CameraRig(
        Transform(z=25.0, pitch=-60.0), 1280, 720, 110.0)
    display = pygame.display.set_mode((rig.width, rig.height))
    clock = pygame.time.Clock()

    world = client.get_world()
    settings = world.get_settings()
    settings.synchronous_mode = True
    settings.fixed_delta_seconds = 1.0 / video_fps
    world.apply_settings(settings)

    bp_lib = world.get_blueprint_library()
    cam_bp = bp_lib.find("sensor.camera.rgb")
    cam_bp.set_attribute("image_size_x", str(rig.width))
    cam_bp.set_attribute("image_size_y", str(rig.height))
    cam_bp.set_attribute("fov", str(rig.fov))

    try:
        while not session.done:
            moment_idx, x_pid, _ = session.current_task
            moment = moment_data[moment_idx]
            ped = moment["ped_controls"]
            veh = moment.get("vehicle_controls", {})
            adapter = CarlaAdapter(
                world, client,
                (bp_lib.filter("walker.pedestrian.*"), [0]),
                (bp_lib.filter("vehicle.*"), [0]))
            state = SimState()
            camera = world.spawn_actor(cam_bp, carla.Transform(
                location=carla.Location(
                    rig.transform.x, rig.transform.y, rig.transform.z),
                rotation=carla.Rotation(pitch=rig.transform.pitch)))
            frames: list = []
            camera.listen(frames.append)
            yaw = 0.0
            frame_id = 0
            restart = False

            while not restart:
                clock.tick_busy_loop(video_fps)
                for event in pygame.event.get():
                    if event.type == pygame.QUIT:
                        raise KeyboardInterrupt
                keys = pygame.key.get_pressed()
                if keys[pygame.K_ESCAPE]:
                    raise KeyboardInterrupt

                if session.in_obs_phase(frame_id):
                    cmds = plan_frame(frame_id, ped, veh, state)
                    adapter.execute(cmds, state)
                else:
                    # other agents keep replaying; annotator drives the
                    # x-agent (reference: annotate_carla.py:636-680)
                    cmds = plan_frame(frame_id, ped, veh, state,
                                      excepts=(float(x_pid), x_pid))
                    adapter.execute(cmds, state)
                    actor = adapter.actors.get(float(x_pid)) \
                        or adapter.actors.get(x_pid)
                    if actor is not None:
                        if keys[pygame.K_a]:
                            yaw -= TURN_DEG_PER_TICK
                        if keys[pygame.K_d]:
                            yaw += TURN_DEG_PER_TICK
                        speed = WALK_SPEED if keys[pygame.K_w] else 0.0
                        direction = [math.cos(math.radians(yaw)),
                                     math.sin(math.radians(yaw)), 0.0]
                        control = carla.WalkerControl()
                        control.direction = carla.Vector3D(*direction)
                        control.speed = speed
                        actor.apply_control(control)
                        loc = actor.get_location()
                        session.record(frame_id, direction, speed,
                                       [loc.x, loc.y, loc.z])
                        collided = any(
                            rec[1] in (float(x_pid), x_pid)
                            for rec in adapter.collision_history)
                        result = session.step(
                            frame_id, [loc.x, loc.y, loc.z], collided)
                        if result != "continue":
                            restart = True

                world.tick()
                if frames:
                    display.blit(
                        _pygame_surface(pygame, frames[-1]), (0, 0))
                    pygame.display.flip()
                    del frames[:]
                frame_id += 1
                if frame_id > max_frame:
                    session.step(frame_id, [1e9, 1e9, 1e9])
                    restart = True

            camera.stop()
            camera.destroy()
            adapter.cleanup()
    except KeyboardInterrupt:
        pass
    finally:
        settings.synchronous_mode = False
        settings.fixed_delta_seconds = None
        world.apply_settings(settings)
        pygame.quit()
    save_annotation(session, out_file)
    return session.saved


def run_spectator(
    client,
    width: int = 1280,
    height: int = 720,
    fov: float = 90.0,
    screenshot_path: str = "spectator_shots",
) -> None:
    """Free-fly camera with click → 3D world point
    (reference: spectator.py:135-200)."""
    import carla
    import pygame

    pygame.init()
    display = pygame.display.set_mode((width, height))
    clock = pygame.time.Clock()
    world = client.get_world()
    bp_lib = world.get_blueprint_library()

    pose = Transform(z=30.0, pitch=-45.0)

    def spawn_cams(pose):
        t = carla.Transform(
            location=carla.Location(pose.x, pose.y, pose.z),
            rotation=carla.Rotation(
                pitch=pose.pitch, yaw=pose.yaw, roll=pose.roll))
        rgb_bp = bp_lib.find("sensor.camera.rgb")
        depth_bp = bp_lib.find("sensor.camera.depth")
        for bp in (rgb_bp, depth_bp):
            bp.set_attribute("image_size_x", str(width))
            bp.set_attribute("image_size_y", str(height))
            bp.set_attribute("fov", str(fov))
        return (world.spawn_actor(rgb_bp, t),
                world.spawn_actor(depth_bp, t))

    rgb_cam, depth_cam = spawn_cams(pose)
    last = {"rgb": None, "depth": None}
    rgb_cam.listen(lambda im: last.__setitem__("rgb", im))
    depth_cam.listen(lambda im: last.__setitem__("depth", im))
    shot = 0

    try:
        while True:
            clock.tick(30)
            moved = False
            for event in pygame.event.get():
                if event.type == pygame.QUIT:
                    return
                if event.type == pygame.MOUSEBUTTONDOWN \
                        and last["depth"] is not None:
                    u, v = event.pos
                    depth_img = np.frombuffer(
                        last["depth"].raw_data, np.uint8).reshape(
                        height, width, 4)[:, :, 2::-1]
                    d = parse_carla_depth(depth_img)[v, u]
                    rig = CameraRig(pose, width, height, fov)
                    xyz = pixel_to_world(u, v, d, rig)
                    print("click (%d, %d) depth %.2fm -> world %s"
                          % (u, v, d, np.round(xyz, 3).tolist()))
            keys = pygame.key.get_pressed()
            if keys[pygame.K_ESCAPE]:
                return
            step, turn = 1.0, 2.0
            dx = dy = dz = dyaw = dpitch = 0.0
            rad = math.radians(pose.yaw)
            if keys[pygame.K_w]:
                dx, dy = step * math.cos(rad), step * math.sin(rad)
            if keys[pygame.K_s]:
                dx, dy = -step * math.cos(rad), -step * math.sin(rad)
            if keys[pygame.K_a]:
                dx, dy = step * math.sin(rad), -step * math.cos(rad)
            if keys[pygame.K_d]:
                dx, dy = -step * math.sin(rad), step * math.cos(rad)
            if keys[pygame.K_q]:
                dz = step
            if keys[pygame.K_e]:
                dz = -step
            if keys[pygame.K_LEFT]:
                dyaw = -turn
            if keys[pygame.K_RIGHT]:
                dyaw = turn
            if keys[pygame.K_UP]:
                dpitch = turn
            if keys[pygame.K_DOWN]:
                dpitch = -turn
            if keys[pygame.K_p] and last["rgb"] is not None:
                os.makedirs(screenshot_path, exist_ok=True)
                last["rgb"].save_to_disk(os.path.join(
                    screenshot_path, "shot_%04d.png" % shot))
                shot += 1
            if any((dx, dy, dz, dyaw, dpitch)):
                pose = Transform(
                    x=pose.x + dx, y=pose.y + dy, z=pose.z + dz,
                    pitch=pose.pitch + dpitch, yaw=pose.yaw + dyaw)
                t = carla.Transform(
                    location=carla.Location(pose.x, pose.y, pose.z),
                    rotation=carla.Rotation(
                        pitch=pose.pitch, yaw=pose.yaw))
                rgb_cam.set_transform(t)
                depth_cam.set_transform(t)
                moved = True
            del moved
            if last["rgb"] is not None:
                display.blit(
                    _pygame_surface(pygame, last["rgb"]), (0, 0))
                pygame.display.flip()
    finally:
        rgb_cam.stop()
        depth_cam.stop()
        rgb_cam.destroy()
        depth_cam.destroy()
        pygame.quit()


def run_moment_editor(
    client,
    moment_data: List[dict],
    out_file: str,
    width: int = 1280,
    height: int = 720,
    fov: float = 90.0,
) -> List[dict]:
    """Scenario editor/QA (reference: moment_editor.py keybindings at
    :138-172): `[`/`]` cycle moments, `g` replay, `o` approve,
    `x` select an x-agent id (number keys pick the pid), left-click
    adds a destination for the selected agent at the clicked 3D point
    (depth backprojection), `u` removes the agent, ESC saves + quits.
    """
    import carla
    import pygame

    from multiverse_tpu.forking_paths.annotation import (
        add_x_agent_destination,
        approve_moment,
        remove_x_agent,
    )

    pygame.init()
    display = pygame.display.set_mode((width, height))
    clock = pygame.time.Clock()
    world = client.get_world()
    bp_lib = world.get_blueprint_library()

    pose = Transform(z=30.0, pitch=-50.0)
    rig = CameraRig(pose, width, height, fov)
    t = carla.Transform(
        location=carla.Location(pose.x, pose.y, pose.z),
        rotation=carla.Rotation(pitch=pose.pitch))
    rgb_bp = bp_lib.find("sensor.camera.rgb")
    depth_bp = bp_lib.find("sensor.camera.depth")
    for bp in (rgb_bp, depth_bp):
        bp.set_attribute("image_size_x", str(width))
        bp.set_attribute("image_size_y", str(height))
        bp.set_attribute("fov", str(fov))
    rgb_cam = world.spawn_actor(rgb_bp, t)
    depth_cam = world.spawn_actor(depth_bp, t)
    last = {"rgb": None, "depth": None}
    rgb_cam.listen(lambda im: last.__setitem__("rgb", im))
    depth_cam.listen(lambda im: last.__setitem__("depth", im))

    cur = 0
    selected_pid = 0

    def replay(moment):
        adapter = CarlaAdapter(
            world, client,
            (bp_lib.filter("walker.pedestrian.*"), [0]),
            (bp_lib.filter("vehicle.*"), [0]),
            use_collision_sensors=False)
        state = SimState()
        total = max((int(float(k))
                     for k in moment["ped_controls"]), default=0) + 1
        for frame_id in range(total):
            adapter.execute(plan_frame(
                frame_id, moment["ped_controls"],
                moment.get("vehicle_controls", {}), state), state)
            world.tick()
            if last["rgb"] is not None:
                display.blit(_pygame_surface(pygame, last["rgb"]), (0, 0))
                pygame.display.flip()
        adapter.cleanup()

    try:
        while True:
            clock.tick(30)
            for event in pygame.event.get():
                if event.type == pygame.QUIT:
                    raise KeyboardInterrupt
                if event.type == pygame.KEYDOWN:
                    if event.key == pygame.K_ESCAPE:
                        raise KeyboardInterrupt
                    if event.key == pygame.K_RIGHTBRACKET:
                        cur = (cur + 1) % len(moment_data)
                    if event.key == pygame.K_LEFTBRACKET:
                        cur = (cur - 1) % len(moment_data)
                    if event.key == pygame.K_g:
                        replay(moment_data[cur])
                    if event.key == pygame.K_o:
                        moment_data[cur] = approve_moment(moment_data[cur])
                        print("approved moment %d" % cur)
                    if event.key == pygame.K_u:
                        moment_data[cur] = remove_x_agent(
                            moment_data[cur], selected_pid)
                    if pygame.K_0 <= event.key <= pygame.K_9:
                        selected_pid = event.key - pygame.K_0
                        print("selected x-agent pid %d" % selected_pid)
                if event.type == pygame.MOUSEBUTTONDOWN \
                        and last["depth"] is not None:
                    u, v = event.pos
                    depth_img = np.frombuffer(
                        last["depth"].raw_data, np.uint8).reshape(
                        height, width, 4)[:, :, 2::-1]
                    d = parse_carla_depth(depth_img)[v, u]
                    xyz = pixel_to_world(u, v, d, rig)
                    moment_data[cur] = add_x_agent_destination(
                        moment_data[cur], selected_pid,
                        [float(xyz[0]), float(xyz[1]), float(xyz[2])])
                    print("moment %d: pid %d destination %s" % (
                        cur, selected_pid, np.round(xyz, 2).tolist()))
            world.tick()
            if last["rgb"] is not None:
                display.blit(_pygame_surface(pygame, last["rgb"]), (0, 0))
                pygame.display.flip()
    except KeyboardInterrupt:
        pass
    finally:
        for cam in (rgb_cam, depth_cam):
            cam.stop()
            cam.destroy()
        pygame.quit()
    with open(out_file, "w") as f:
        json.dump(moment_data, f)
    return moment_data


def moment_editor_main(argv=None) -> None:
    """mvt-moment-editor CLI (reference: moment_editor.py)."""
    import argparse

    import carla

    parser = argparse.ArgumentParser()
    parser.add_argument("moment_json")
    parser.add_argument("out_file")
    parser.add_argument("--host", default="127.0.0.1")
    parser.add_argument("--port", default=2000, type=int)
    args = parser.parse_args(argv)
    with open(args.moment_json) as f:
        moment_data = json.load(f)
    client = carla.Client(args.host, args.port)
    client.set_timeout(10.0)
    run_moment_editor(client, moment_data, args.out_file)


def annotate_main(argv=None) -> None:
    """mvt-annotate CLI (reference: annotate_carla.py)."""
    import argparse

    import carla

    parser = argparse.ArgumentParser()
    parser.add_argument("moment_json")
    parser.add_argument("out_file")
    parser.add_argument("--host", default="127.0.0.1")
    parser.add_argument("--port", default=2000, type=int)
    parser.add_argument("--video_fps", type=float, default=30.0)
    parser.add_argument("--obs_length", type=int, default=12)
    parser.add_argument("--pred_length", type=int, default=26)
    args = parser.parse_args(argv)
    with open(args.moment_json) as f:
        moment_data = json.load(f)
    client = carla.Client(args.host, args.port)
    client.set_timeout(10.0)
    saved = run_annotation_game(
        client, moment_data, args.out_file,
        video_fps=args.video_fps, obs_length=args.obs_length,
        pred_length=args.pred_length)
    print("saved %d annotations -> %s" % (len(saved), args.out_file))


def spectator_main(argv=None) -> None:
    """mvt-spectator CLI (reference: spectator.py)."""
    import argparse

    import carla

    parser = argparse.ArgumentParser()
    parser.add_argument("--host", default="127.0.0.1")
    parser.add_argument("--port", default=2000, type=int)
    parser.add_argument("--width", type=int, default=1280)
    parser.add_argument("--height", type=int, default=720)
    args = parser.parse_args(argv)
    client = carla.Client(args.host, args.port)
    client.set_timeout(10.0)
    run_spectator(client, width=args.width, height=args.height)


if __name__ == "__main__":
    annotate_main()
