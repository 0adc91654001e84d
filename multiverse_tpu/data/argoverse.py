"""Argoverse tracking-dataset preparation: 3D cuboid labels → 2D
person boxes in the ring-front-center camera.

reference: SimAug/code/get_prepared_data_argoverse.py — quaternion
cuboid pose → 8 corners in the egovehicle frame → camera frame via the
SE3 extrinsic → pinhole projection (skew included for u, depth sign
preserved) → clipped 2D box, with the 1920×1200 frame cropped to
1920×1080 and 30 fps dropped to 2.5 fps.

The projection math is vectorized (the reference loops per corner);
the dataset walker accepts any directory layout that provides
`vehicle_calibration_info.json` + per-frame cuboid label jsons, so the
argoverse-api package is not required.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import List, Optional

import numpy as np
from scipy.spatial.transform import Rotation

IMG_WIDTH = 1920.0
IMG_HEIGHT = 1200.0
CLIP_HEIGHT = 120.0   # 1920×1200 → 1920×1080 crop
DROP_FRAME = 12


def quat_wxyz_to_rotmat(q) -> np.ndarray:
    """(w, x, y, z) unit quaternion → 3×3 rotation
    (reference: get_prepared_data_argoverse.py:153-157)."""
    q = np.asarray(q, np.float64)
    if not np.isclose(np.linalg.norm(q), 1.0, atol=1e-9):
        raise ValueError("quaternion must be unit-norm")
    w, x, y, z = q
    return Rotation.from_quat([x, y, z, w]).as_matrix()


def se3(rotation: np.ndarray, translation: np.ndarray) -> np.ndarray:
    m = np.eye(4)
    m[:3, :3] = rotation
    m[:3, 3] = translation
    return m


@dataclasses.dataclass(frozen=True)
class ArgoverseCamera:
    """ring_front_center calibration
    (reference: get_prepared_data_argoverse.py:189-224)."""

    extrinsic: np.ndarray    # [4, 4] egovehicle → camera
    intrinsic: np.ndarray    # [3, 4]
    img_width: float = IMG_WIDTH
    img_height: float = IMG_HEIGHT

    @classmethod
    def from_calibration(cls, camera_config: dict,
                         camera_key: str = "image_raw_ring_front_center",
                         ) -> "ArgoverseCamera":
        value = None
        for cam in camera_config["camera_data_"]:
            if camera_key in cam["key"]:
                value = cam["value"]
                break
        if value is None:
            raise KeyError(camera_key)
        se3_cfg = value["vehicle_SE3_camera_"]
        t = np.asarray(se3_cfg["translation"], np.float64)
        rot = quat_wxyz_to_rotmat(se3_cfg["rotation"]["coefficients"])
        extrinsic = se3(rot.T, rot.T @ (-t))
        k = np.zeros((3, 4))
        k[0, 0] = value["focal_length_x_px_"]
        k[0, 1] = value["skew_"]
        k[0, 2] = value["focal_center_x_px_"]
        k[1, 1] = value["focal_length_y_px_"]
        k[1, 2] = value["focal_center_y_px_"]
        k[2, 2] = 1.0
        return cls(extrinsic=extrinsic, intrinsic=k)


def cuboid_corners(label: dict) -> np.ndarray:
    """Label {center, rotation, length, width, height} → [8, 3]
    egovehicle-frame corners
    (reference: get_prepared_data_argoverse.py:68-93)."""
    c = label["center"]
    t = np.array([c["x"], c["y"], c["z"]])
    r = label["rotation"]
    rot = quat_wxyz_to_rotmat([r["w"], r["x"], r["y"], r["z"]])
    sx = np.array([1, 1, 1, 1, -1, -1, -1, -1], np.float64)
    sy = np.array([1, -1, -1, 1, 1, -1, -1, 1], np.float64)
    sz = np.array([1, 1, -1, -1, 1, 1, -1, -1], np.float64)
    local = np.stack([
        label["length"] / 2 * sx,
        label["width"] / 2 * sy,
        label["height"] / 2 * sz,
    ], axis=1)
    return local @ rot.T + t


def project_to_image(points_cam: np.ndarray,
                     camera: ArgoverseCamera) -> np.ndarray:
    """Camera-frame [N, 3] → [N, 3] (u, v, depth); depth keeps its
    sign (reference: :119-151, vectorized)."""
    z = points_cam[:, 2]
    z_fixed = np.where(np.abs(z) <= 1e-4,
                       np.where(z < 0, -1e-4, 1e-4), z)
    px = points_cam[:, 0] / z_fixed
    py = points_cam[:, 1] / z_fixed
    k = camera.intrinsic
    u = k[0, 0] * px + k[0, 1] * py + k[0, 2]
    v = k[1, 1] * py + k[1, 2]
    return np.stack([u, v, z], axis=1)


def clip_2d_bbox(uvh: np.ndarray, max_w: float,
                 max_h: float) -> Optional[List[float]]:
    """[8, 3] → clipped [x1, y1, x2, y2] or None
    (reference: :165-187 — unlike the Forking Paths variant this also
    rejects boxes entirely left/above the frame)."""
    if not np.all(uvh[:, 2] > 0):
        return None
    x1 = round(float(uvh[:, 0].min()), 3)
    y1 = round(float(uvh[:, 1].min()), 3)
    x2 = round(float(uvh[:, 0].max()), 3)
    y2 = round(float(uvh[:, 1].max()), 3)
    if x1 > max_w or y1 > max_h or x2 < 0 or y2 < 0:
        return None
    return [max(x1, 0.0), max(y1, 0.0), min(x2, max_w), min(y2, max_h)]


def cuboid_to_2d_box(label: dict,
                     camera: ArgoverseCamera) -> Optional[List[float]]:
    """Full label → clipped 2D box (reference: :60-118)."""
    corners = cuboid_corners(label)
    hom = np.concatenate([corners, np.ones((8, 1))], axis=1)
    cam = (hom @ camera.extrinsic.T)[:, :3]
    return clip_2d_bbox(project_to_image(cam, camera),
                        camera.img_width, camera.img_height)


def crop_box_to_1080(bbox: List[float],
                     clip_height: float = CLIP_HEIGHT) -> Optional[List[float]]:
    """1920×1200 frame cropped vertically (centered) to 1920×1080
    (reference: main loop `clip_height`)."""
    x1, y1, x2, y2 = bbox
    y1 -= clip_height / 2.0
    y2 -= clip_height / 2.0
    y1 = max(y1, 0.0)
    y2 = min(y2, IMG_HEIGHT - CLIP_HEIGHT)
    if y2 <= y1:
        return None
    return [x1, y1, x2, y2]


def prepare_argoverse_log(
    label_files: List[str],
    calibration_file: str,
    video_id: str,
    out_path: str,
    split: str,
    drop_frame: int = DROP_FRAME,
) -> int:
    """One log → trajectory TSV + person-box pickle (bottom-center of
    the cropped box).  Returns the number of rows written."""
    import pickle

    with open(calibration_file) as f:
        camera = ArgoverseCamera.from_calibration(json.load(f))

    traj_path = os.path.join(out_path, "traj_2.5fps", split)
    person_path = os.path.join(out_path, "anno_person_box", split)
    os.makedirs(traj_path, exist_ok=True)
    os.makedirs(person_path, exist_ok=True)

    rows, person_boxes = [], {}
    for frame_idx, label_file in enumerate(
            sorted(label_files)[::drop_frame]):
        with open(label_file) as f:
            labels = json.load(f)
        for label in labels:
            if label.get("label_class") != "PEDESTRIAN":
                continue
            bbox = cuboid_to_2d_box(label, camera)
            if bbox is None:
                continue
            bbox = crop_box_to_1080(bbox)
            if bbox is None:
                continue
            tid = abs(hash(label.get("track_label_uuid", "0"))) % 10 ** 8
            x = (bbox[0] + bbox[2]) / 2.0
            y = bbox[3]
            rows.append((frame_idx * drop_frame, float(tid), x, y))
            person_boxes["%d_%d" % (frame_idx * drop_frame, tid)] = bbox

    with open(os.path.join(traj_path, "%s.txt" % video_id), "w") as f:
        for fi, p, x, y in rows:
            f.write("%d\t%.1f\t%.6f\t%.6f\n" % (fi, p, x, y))
    with open(os.path.join(
            person_path, "%s.p" % video_id), "wb") as f:
        pickle.dump(person_boxes, f)
    return len(rows)
