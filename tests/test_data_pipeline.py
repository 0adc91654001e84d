"""End-to-end data pipeline: reference-format files -> npz -> batches ->
training steps -> eval -> checkpoint round-trip."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multiverse_tpu import geometry
from multiverse_tpu.data import preprocess_split, read_data
from multiverse_tpu.data.preprocess import PreprocessOptions
from multiverse_tpu.models import init_params
from multiverse_tpu.train import (
    CheckpointManager,
    evaluate,
    make_eval_step,
    make_train_step,
)
from multiverse_tpu.train.trainer import init_train_state
from synthetic import tiny_config, write_reference_format_dataset


@pytest.fixture(scope="module")
def prepro_dir(tmp_path_factory):
    rng = np.random.RandomState(0)
    root = str(tmp_path_factory.mktemp("refdata"))
    cfg = tiny_config()
    traj_path, scene_path, id2name = write_reference_format_dataset(
        root, cfg, rng)
    opts = PreprocessOptions(
        obs_len=cfg.obs_len,
        pred_len=cfg.pred_len,
        add_grid=True,
        add_all_reg=True,
        add_scene=True,
        direct_scene_feat=True,
        scene_feat_path=scene_path,
        scene_id2name=id2name,
        scene_h=cfg.scene_h,
        scene_w=cfg.scene_w,
        video_h=cfg.video_h,
        video_w=cfg.video_w,
        grid_strides="2,4",
    )
    out = os.path.join(root, "prepro")
    for split in ("train", "val", "test"):
        assert preprocess_split(traj_path, split, os.path.join(
            out, "data_%s.npz" % split), opts)
    return out, cfg


def test_npz_schema(prepro_dir):
    out, cfg = prepro_dir
    data = dict(np.load(os.path.join(out, "data_train.npz"),
                        allow_pickle=True))
    must_have = [
        "obs_traj", "pred_traj", "obs_traj_rel", "pred_traj_rel",
        "seq_start_end", "obs_frameidx", "obs_vid", "vid2name",
        "obs_grid_class", "pred_grid_class", "obs_grid_target",
        "pred_grid_target", "grid_center_0", "grid_center_1",
        "obs_grid_target_all_0", "obs_grid_target_all_1",
        "pred_grid_target_all_0", "pred_grid_target_all_1",
        "obs_scene", "pred_scene", "scene_feat", "video_wh",
        "scene_grid_strides",
    ]
    for key in must_have:
        assert key in data, key
    n = len(data["obs_traj"])
    assert n > 0
    assert data["obs_traj"].shape == (n, cfg.obs_len, 2)
    assert data["pred_traj"].shape == (n, cfg.pred_len, 2)
    assert data["obs_grid_class"].shape == (n, 2, cfg.obs_len)
    h, w = cfg.scene_grids[0]
    assert data["obs_grid_target_all_0"].shape == (
        n, cfg.obs_len, h, w, 2)
    assert data["scene_feat"].dtype == np.uint8
    # scene one-hot: exactly one class per pixel
    assert np.all(data["scene_feat"].sum(-1) == 1)


def test_npz_grid_consistency(prepro_dir):
    """grid class/targets in the npz must equal direct rasterization of
    the stored trajectories (the round-trip invariant)."""
    out, cfg = prepro_dir
    data = dict(np.load(os.path.join(out, "data_train.npz"),
                        allow_pickle=True))
    full = np.concatenate([data["obs_traj"], data["pred_traj"]], axis=1)
    for idx in (0, len(full) - 1):
        cls, tgts = geometry.rasterize_traj_np(
            full[idx], cfg.video_h, cfg.video_w, cfg.scene_grids)
        np.testing.assert_array_equal(
            data["obs_grid_class"][idx], cls[:, :cfg.obs_len])
        np.testing.assert_array_equal(
            data["pred_grid_class"][idx], cls[:, cfg.obs_len:])
        np.testing.assert_allclose(
            data["obs_grid_target_all_0"][idx], tgts[0][:cfg.obs_len],
            rtol=1e-5)
    # rel displacements
    np.testing.assert_allclose(
        data["obs_traj_rel"][:, 1:],
        data["obs_traj"][:, 1:] - data["obs_traj"][:, :-1],
        rtol=1e-5,
    )
    assert np.all(data["obs_traj_rel"][:, 0] == 0)


def test_dataset_batching(prepro_dir):
    out, cfg = prepro_dir
    ds = read_data(out, "train", cfg)
    bs = 4
    batches = list(ds.get_batches(bs, full=True, shuffle=False))
    assert len(batches) == ds.num_batches(bs)
    total = 0
    for batch, extras in batches:
        assert batch.obs_grid_class.shape[0] == bs  # padded
        assert batch.scene_feat.shape[0] == min(
            bs * cfg.obs_len, len(ds.shared["scene_feat"]))
        assert batch.obs_scene.max() < batch.scene_feat.shape[0]
        total += extras["original_batch_size"]
        # remapped scene rows must equal the originals
        orig = ds.data["obs_scene"]
    assert total == ds.num_examples

    # shuffle reuses one fixed order across epochs (reference behavior)
    b1 = list(ds.get_batches(bs, num_steps=2, shuffle=True))
    b2 = list(ds.get_batches(bs, num_steps=2, shuffle=True))
    np.testing.assert_array_equal(
        b1[0][0].obs_grid_class, b2[0][0].obs_grid_class)


def test_scene_remap_preserves_features(prepro_dir):
    out, cfg = prepro_dir
    ds = read_data(out, "train", cfg)
    batch, extras = next(ds.get_batches(3, full=True, shuffle=False))
    # row referenced by (sample, t) must equal the original shared row
    orig_idx = ds.data["obs_scene"][:3]  # [n, T, 1] original ids
    for a in range(3):
        for t in range(cfg.obs_len):
            np.testing.assert_array_equal(
                batch.scene_feat[batch.obs_scene[a, t]],
                ds.shared["scene_feat"][int(orig_idx[a, t, 0])],
            )


def test_train_loop_and_eval(prepro_dir, tmp_path):
    out, cfg = prepro_dir
    cfg = cfg.replace(batch_size=4, wd=0.0)
    ds = read_data(out, "train", cfg)
    params = init_params(jax.random.PRNGKey(0), cfg)
    state, tx = init_train_state(params, cfg, ds.num_examples)
    train_step = make_train_step(cfg, tx)

    to_dev = lambda b: jax.tree_util.tree_map(jnp.asarray, b)

    losses = []
    for batch, _ in ds.get_batches(cfg.batch_size, num_steps=12):
        state, parts = train_step(state, to_dev(batch))
        losses.append(float(parts["total"]))
    assert all(np.isfinite(losses))
    assert np.mean(losses[-4:]) < np.mean(losses[:4]), losses

    # eval produces the reference metric table
    eval_step = make_eval_step(cfg)

    def step_fn(batch):
        cl, rg = eval_step(state.params, to_dev(batch))
        return ({k: np.asarray(v) for k, v in cl.items()},
                {k: np.asarray(v) for k, v in rg.items()})

    perf = evaluate(ds, cfg, step_fn)
    for key in ("grid0_acc", "grid0_traj_ade", "grid0_traj_fde",
                "grid0_traj_centerOnly_ade", "grid0_acc_@T=0"):
        assert key in perf
        assert np.isfinite(perf[key])
    assert perf["grid0_traj_ade"] > 0

    # checkpoint round-trip (params only, like reference restore)
    mgr = CheckpointManager(str(tmp_path / "run"))
    mgr.save(int(state.step), state.params, best=False)
    mgr.save(int(state.step), state.params, best=True)
    template = jax.tree_util.tree_map(np.zeros_like, state.params)
    restored = mgr.restore_params(template, best=True)
    for a, b in zip(jax.tree_util.tree_leaves(restored),
                    jax.tree_util.tree_leaves(state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # cross-process visibility (the hot-reload contract): a step saved
    # by a DIFFERENT manager instance is invisible to the plain
    # latest_step (orbax caches its step list per instance) but found
    # by poll_latest_step, which re-reads the directory
    writer = CheckpointManager(str(tmp_path / "run"))
    writer.save(int(state.step) + 7, state.params, best=False)
    assert mgr.latest_step(best=False) == int(state.step)
    assert mgr.poll_latest_step(best=False) == int(state.step) + 7


def test_evaluate_only_scene(prepro_dir, tmp_path):
    """only_scene must reproduce exactly the per-scene bucket metrics
    (reference: SimAug/code/pred_utils.py:501-505 skips non-matching
    examples inside the eval loop)."""
    from multiverse_tpu.train.evaluate import get_scene

    out, cfg = prepro_dir
    ds = read_data(out, "test", cfg)
    params = init_params(jax.random.PRNGKey(0), cfg)
    eval_step = make_eval_step(cfg)
    to_dev = lambda b: jax.tree_util.tree_map(jnp.asarray, b)

    def step_fn(batch):
        cl, rg = eval_step(params, to_dev(batch))
        return ({k: np.asarray(v) for k, v in cl.items()},
                {k: np.asarray(v) for k, v in rg.items()})

    scenes = sorted({get_scene(k) for k in ds.data["traj_key"]})
    assert len(scenes) >= 2, scenes  # the filter must actually filter

    # full run with per-scene buckets = the independent ground truth
    # (the bucket loop and the ex_idx slicing are separate code paths)
    full = evaluate(ds, cfg, step_fn, batch_size=4, per_scene_eval=True)

    scene = scenes[0]
    pkl = str(tmp_path / "filtered.p")
    filt = evaluate(ds, cfg, step_fn, batch_size=4,
                    only_scene=scene, save_output=pkl)
    np.testing.assert_allclose(
        filt["grid0_traj_ade"], full["%s_ade" % scene], rtol=1e-6)
    np.testing.assert_allclose(
        filt["grid0_traj_fde"], full["%s_fde" % scene], rtol=1e-6)
    # metrics must differ from the unfiltered run (filter is real)
    assert filt["grid0_traj_ade"] != full["grid0_traj_ade"]

    # the output pickle is filtered too, and consistently so
    import pickle
    with open(pkl, "rb") as f:
        saved = pickle.load(f)
    n_scene = sum(get_scene(k) == scene for k in ds.data["traj_key"])
    assert len(saved["seq_ids"]) == n_scene
    assert all(get_scene(str(k)) == scene for k in saved["seq_ids"])
    assert len(saved["grid0_pred_traj"]) == n_scene

    with pytest.raises(ValueError, match="only_scene"):
        evaluate(ds, cfg, step_fn, batch_size=4, only_scene="9999")


def test_evaluate_empty_split_is_nonfatal(prepro_dir):
    """A zero-example split WITHOUT a scene filter yields nan metrics
    instead of raising — an empty/misconfigured val split must not
    abort a training run mid-flight (only a only_scene filter that
    matches nothing is a caller error)."""
    from multiverse_tpu.data.dataset import TrajectoryDataset

    out, cfg = prepro_dir
    ds = read_data(out, "test", cfg)
    empty = TrajectoryDataset(
        {k: v[:0] for k, v in ds.data.items()}, ds.shared, cfg, "test")

    def step_fn(batch):  # must never run: there are no batches
        raise AssertionError("step_fn called on an empty split")

    perf = evaluate(empty, cfg, step_fn, batch_size=4)
    assert np.isnan(perf["grid0_traj_ade"])
    assert np.isnan(perf["grid0_acc"])
