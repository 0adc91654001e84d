"""Grid geometry: cell centers, trajectory→cell rasterization, dense
regression targets.

Bit-compatible with the reference rasterization semantics
(reference: code/preprocess.py:89-106 grid centers,
code/preprocess.py:441-475 ceil-based cell assignment + dense targets,
code/multifuture_inference.py:115-156 the inference-side duplicate),
but fully vectorized (the reference loops per person / per timestep).

Both numpy (host preprocessing) and jax.numpy (device-side) variants are
provided; the jnp variants are jit/vmap-safe with static grid shapes.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
import numpy as np


def grid_centers(video_h: int, video_w: int, h: int, w: int) -> np.ndarray:
    """Per-cell pixel-space centers, shape [h, w, 2] ((x, y) order).

    reference: code/preprocess.py:98-106.
    """
    h_gap, w_gap = video_h / h, video_w / w
    centers_x = np.cumsum(np.full(w, w_gap)) - w_gap / 2.0
    centers_y = np.cumsum(np.full(h, h_gap)) - h_gap / 2.0
    xx = np.tile(centers_x[None, :], [h, 1])
    yy = np.tile(centers_y[:, None], [1, w])
    return np.stack((xx, yy), axis=-1)


def xy_to_cell_np(
    xy: np.ndarray, video_h: int, video_w: int, h: int, w: int
) -> np.ndarray:
    """Pixel (x, y) → flat cell id in [0, h*w), ceil semantics.

    reference: code/preprocess.py:441-459 (``ceil(x/gap)`` with the 0→1
    clamp then −1). Out-of-frame coordinates clamp to the border cell,
    matching the behaviour of the reference's one-hot scatter (indices
    beyond the grid would raise there; real data stays in frame).

    Args:
        xy: [..., 2] float pixel coordinates.
    Returns:
        [...] int32 flat cell ids (row-major over (y, x)).
    """
    h_gap, w_gap = video_h / h, video_w / w
    x_idx = np.ceil(xy[..., 0] / w_gap).astype(np.int64)
    y_idx = np.ceil(xy[..., 1] / h_gap).astype(np.int64)
    x_idx = np.clip(x_idx, 1, w) - 1
    y_idx = np.clip(y_idx, 1, h) - 1
    return (y_idx * w + x_idx).astype(np.int32)


def xy_to_cell(
    xy: jnp.ndarray, video_h: int, video_w: int, h: int, w: int
) -> jnp.ndarray:
    """jnp twin of :func:`xy_to_cell_np` (jit/vmap safe)."""
    h_gap, w_gap = video_h / h, video_w / w
    x_idx = jnp.ceil(xy[..., 0] / w_gap).astype(jnp.int32)
    y_idx = jnp.ceil(xy[..., 1] / h_gap).astype(jnp.int32)
    x_idx = jnp.clip(x_idx, 1, w) - 1
    y_idx = jnp.clip(y_idx, 1, h) - 1
    return y_idx * w + x_idx


def dense_regression_targets_np(
    xy: np.ndarray, centers: np.ndarray
) -> np.ndarray:
    """Offset of every grid cell center to the agent position.

    reference: code/preprocess.py:461-475 (`--add_all_reg` targets):
    ``target[t, i, j] = xy[t] - center[i, j]`` for every cell.

    Args:
        xy: [T, 2] pixel coordinates.
        centers: [h, w, 2] from :func:`grid_centers`.
    Returns:
        [T, h, w, 2] float32.
    """
    return (xy[:, None, None, :] - centers[None, :, :, :]).astype(np.float32)


def rasterize_traj_np(
    xy: np.ndarray,
    video_h: int,
    video_w: int,
    grids: Tuple[Tuple[int, int], ...],
) -> Tuple[np.ndarray, list]:
    """Rasterize one trajectory onto every grid scale.

    Vectorized replacement for the per-scale loop at
    reference: code/preprocess.py:438-475 /
    code/multifuture_inference.py:115-156.

    Args:
        xy: [T, 2] pixel trajectory.
        grids: sequence of (h, w) per scale.
    Returns:
        (cell ids [num_scales, T] int32,
         dense targets: list per scale of [T, h, w, 2] float32)
    """
    T = xy.shape[0]
    classes = np.zeros((len(grids), T), dtype=np.int32)
    targets = []
    for i, (h, w) in enumerate(grids):
        classes[i] = xy_to_cell_np(xy, video_h, video_w, h, w)
        centers = grid_centers(video_h, video_w, h, w)
        targets.append(dense_regression_targets_np(xy, centers))
    return classes, targets


def relative_to_abs(rel_traj: np.ndarray, start_pos) -> np.ndarray:
    """Relative displacements [T, 2] → absolute coordinates, starting
    from `start_pos` (reference: code/pred_utils.py:735-749)."""
    return np.cumsum(np.asarray(rel_traj), axis=0) + np.asarray(
        start_pos).reshape(1, 2)


def one_hot_grid(cell_ids: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    """Flat cell ids [...,] → one-hot spatial maps [..., h, w, 1].

    reference: code/pred_models.py:174-175 (tf.one_hot + reshape).
    """
    import jax

    oh = jax.nn.one_hot(cell_ids, h * w, dtype=jnp.float32)
    return oh.reshape(cell_ids.shape + (h, w, 1))
