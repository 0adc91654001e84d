"""Grid geometry goldens: centers, ceil rasterization, dense targets."""

import math

import jax.numpy as jnp
import numpy as np

from multiverse_tpu import geometry
from multiverse_tpu.config import MultiverseConfig


def test_config_grid_shapes():
    cfg = MultiverseConfig()
    assert cfg.scene_grids == ((18, 32), (9, 16))
    cfg8 = cfg.replace(scene_grid_strides=(2, 4, 8), use_grids=(True, True, False))
    # round(36/8)=4 (banker's), round(64/8)=8
    assert cfg8.scene_grids == ((18, 32), (9, 16), (4, 8))


def test_grid_centers_golden():
    c = geometry.grid_centers(1080, 1920, 18, 32)
    assert c.shape == (18, 32, 2)
    # first cell center = (gap/2, gap/2); gaps: 1920/32=60, 1080/18=60
    assert np.allclose(c[0, 0], [30.0, 30.0])
    assert np.allclose(c[0, 1], [90.0, 30.0])
    assert np.allclose(c[1, 0], [30.0, 90.0])
    assert np.allclose(c[-1, -1], [1920 - 30.0, 1080 - 30.0])


def _ref_cell(x, y, video_h, video_w, h, w):
    """Literal transcription of the reference's ceil semantics
    (reference: code/preprocess.py:441-459)."""
    h_gap, w_gap = video_h * 1.0 / h, video_w * 1.0 / w
    xi = int(math.ceil(x / w_gap))
    yi = int(math.ceil(y / h_gap))
    xi = max(xi, 1) - 1
    yi = max(yi, 1) - 1
    return yi * w + xi


def test_xy_to_cell_matches_reference_semantics(rng):
    h, w = 18, 32
    xy = rng.uniform(0, [1920, 1080], size=(500, 2)).astype(np.float32)
    # include exact boundaries and zeros
    xy = np.concatenate(
        [xy, [[0, 0], [60, 60], [60.0001, 59.9999], [1920, 1080]]]
    ).astype(np.float32)
    got = geometry.xy_to_cell_np(xy, 1080, 1920, h, w)
    want = np.array(
        [_ref_cell(x, y, 1080, 1920, h, w) for x, y in xy], dtype=np.int32
    )
    np.testing.assert_array_equal(got, want)
    # jnp twin agrees
    got_j = np.asarray(geometry.xy_to_cell(jnp.asarray(xy), 1080, 1920, h, w))
    np.testing.assert_array_equal(got_j, want)


def test_boundary_cells():
    # x=0 or y=0 go to cell 0 (the ceil(0)=0 -> clamp-to-1 rule)
    assert geometry.xy_to_cell_np(np.array([0.0, 0.0]), 1080, 1920, 18, 32) == 0
    # exactly on a gap boundary belongs to the lower cell (ceil semantics)
    assert geometry.xy_to_cell_np(np.array([60.0, 0.0]), 1080, 1920, 18, 32) == 0
    assert geometry.xy_to_cell_np(np.array([60.1, 0.0]), 1080, 1920, 18, 32) == 1


def test_dense_regression_targets(rng):
    centers = geometry.grid_centers(1080, 1920, 9, 16)
    xy = rng.uniform(0, [1920, 1080], size=(12, 2)).astype(np.float32)
    tgt = geometry.dense_regression_targets_np(xy, centers)
    assert tgt.shape == (12, 9, 16, 2)
    # reconstructing xy from any cell: center + target == xy
    for t in (0, 5, 11):
        for i, j in ((0, 0), (4, 7), (8, 15)):
            np.testing.assert_allclose(
                centers[i, j] + tgt[t, i, j], xy[t], rtol=1e-5
            )


def test_rasterize_traj_multi_scale(rng):
    cfg = MultiverseConfig()
    xy = rng.uniform(0, [1920, 1080], size=(20, 2)).astype(np.float32)
    classes, targets = geometry.rasterize_traj_np(
        xy, cfg.video_h, cfg.video_w, cfg.scene_grids
    )
    assert classes.shape == (2, 20)
    assert targets[0].shape == (20, 18, 32, 2)
    assert targets[1].shape == (20, 9, 16, 2)
    assert classes[0].max() < 18 * 32 and classes[1].max() < 9 * 16


def test_one_hot_grid():
    ids = jnp.array([[0, 5], [17 * 32 + 31, 1]])
    oh = geometry.one_hot_grid(ids, 18, 32)
    assert oh.shape == (2, 2, 18, 32, 1)
    assert float(oh[0, 0, 0, 0, 0]) == 1.0
    assert float(oh[1, 0, 17, 31, 0]) == 1.0
    assert float(jnp.sum(oh)) == 4.0


def test_relative_to_abs():
    from multiverse_tpu.geometry import relative_to_abs

    rel = np.array([[1.0, 0.0], [1.0, 2.0], [0.0, -1.0]])
    out = relative_to_abs(rel, [10.0, 5.0])
    np.testing.assert_allclose(out, [[11.0, 5.0], [12.0, 7.0],
                                     [12.0, 6.0]])
