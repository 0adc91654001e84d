"""Forking Paths dataset toolkit: simulation-side data creation.

TPU-independent rebuild of the reference's CARLA 0.9.6 pipeline
(reference: forking_paths_dataset/code/, SURVEY.md §2.7).  The package
splits into:

    camera.py        pure-numpy camera geometry (intrinsics,
                     extrinsics, depth decoding, 8-corner 3D→2D boxes,
                     pixel→world backprojection)
    controls.py      trajectory ↔ per-frame control records
                     (stationary detection, constant-velocity
                     interpolation, direction/speed with the
                     acceleration calibration)
    scenes.py        static scene/camera calibration registry (JSON)
    sim.py           the per-frame simulation step + sensors
                     (requires the `carla` package; import-gated)
    recorder.py      the 4-camera dataset renderer (carla-gated)
    prepared_data.py bbox JSONs → obs TSVs + multifuture GT pickles,
                     seg video → class-map npys, split lists

Everything except sim.py/recorder.py runs and is tested without a
CARLA server.
"""

from multiverse_tpu.forking_paths.camera import (  # noqa: F401
    CameraRig,
    Transform,
    compute_extrinsic,
    compute_intrinsic,
    parse_carla_depth,
    pixel_to_world,
    project_3d_box,
    project_points,
    to_2d_bbox,
)
from multiverse_tpu.forking_paths.controls import (  # noqa: F401
    SPEED_CALIBRATION,
    controls_to_traj,
    direction_and_speed,
    interpolate_controls,
    interpolate_segment,
    traj_to_controls,
)
