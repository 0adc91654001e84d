"""Mesh/sharding tests on the 8-virtual-device CPU platform.

Validates that the DP(+TP) sharded paths produce the same numbers as
single-device execution — the GSPMD equivalent of a distributed-backend
correctness suite (the reference has no distributed execution at all,
SURVEY.md §2.9).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multiverse_tpu.config import MultiverseConfig
from multiverse_tpu.models import Batch, init_params
from multiverse_tpu.parallel import (
    init_sharded_train_state,
    make_mesh,
    make_sharded_train_step,
    param_pspecs,
    shard_batch,
)
from multiverse_tpu.train.trainer import (
    build_optimizer,
    init_train_state,
    make_train_step,
)


def tiny_cfg(**kw):
    base = dict(
        scene_h=12, scene_w=16,
        enc_hidden_size=32, dec_hidden_size=32,
        scene_conv_dim=16, emb_size=8,
        scene_grid_strides=(2, 4), use_grids=(True, False),
        batch_size=8,
    )
    base.update(kw)
    return MultiverseConfig(**base).validate()


def tiny_batch(cfg, n, seed=0):
    rnd = np.random.RandomState(seed)
    i = cfg.active_scales[0]
    h, w = cfg.scene_grids[i]
    F = 4
    scene = np.zeros((F, cfg.scene_h, cfg.scene_w, cfg.scene_class),
                     np.uint8)
    scene[..., 0] = 1
    return Batch(
        obs_grid_class=rnd.randint(
            0, h * w, (n, cfg.num_scales, cfg.obs_len)).astype(np.int32),
        obs_grid_target_all=(
            rnd.randn(n, cfg.obs_len, h, w, 2).astype(np.float32),),
        obs_scene=rnd.randint(0, F, (n, cfg.obs_len)).astype(np.int32),
        scene_feat=scene,
        pred_grid_class=rnd.randint(
            0, h * w, (n, cfg.num_scales, cfg.pred_len)).astype(np.int32),
        pred_grid_target_all=(
            rnd.randn(n, cfg.pred_len, h, w, 2).astype(np.float32),),
    )


def test_mesh_shapes():
    mesh = make_mesh(n_devices=8)
    assert dict(mesh.shape) == {"data": 8, "model": 1}
    mesh = make_mesh(n_devices=8, model_parallel=2)
    assert dict(mesh.shape) == {"data": 4, "model": 2}
    with pytest.raises(ValueError):
        make_mesh(n_devices=7, model_parallel=2)


def test_param_pspecs_tp_shards_channel_axes():
    cfg = tiny_cfg()
    params = init_params(jax.random.PRNGKey(0), cfg)
    mesh = make_mesh(n_devices=8, model_parallel=2)
    specs = param_pspecs(params, mesh)
    k = specs["scales"]["0"]["enc_class"]["kernel"]
    assert k[-1] == "model"  # 4*D gate axis sharded
    # replicated under pure DP
    mesh1 = make_mesh(n_devices=8, model_parallel=1)
    specs1 = param_pspecs(params, mesh1)
    assert all(
        s == jax.sharding.PartitionSpec()
        for s in jax.tree.leaves(
            specs1, is_leaf=lambda x: isinstance(
                x, jax.sharding.PartitionSpec))
    )


@pytest.mark.parametrize("model_parallel,masked", [
    (1, False), (2, False),
    # mask_grid_regression's normalizer is a global mask count: the
    # shard_map path must psum it over "data" (compute_loss axis_name)
    # for mean-of-shard-means to equal the single-device loss
    (1, True), (2, True),
])
def test_sharded_train_step_matches_single_device(model_parallel, masked):
    # soft labels make per-EXAMPLE mask counts vary (the smoothing
    # kernel loses mass at grid borders) — with hard one-hot labels
    # every example masks exactly T cells and per-shard normalizers
    # would be equal by construction, hiding a mean-of-means bug
    cfg = tiny_cfg(mask_grid_regression=masked,
                   use_soft_grid_class=masked, soft_grid=1)
    n = cfg.batch_size
    params = init_params(jax.random.PRNGKey(0), cfg)
    batch = tiny_batch(cfg, n)
    tx = build_optimizer(cfg, train_num_examples=n * 4)

    # single-device reference (copy params — the step donates its input)
    state0, _ = init_train_state(
        jax.tree.map(jnp.array, params), cfg, n * 4)
    step0 = make_train_step(cfg, tx)
    new_state0, losses0 = step0(state0, jax.tree.map(jnp.asarray, batch))
    ref_total = float(losses0["total"])

    mesh = make_mesh(n_devices=8, model_parallel=model_parallel)
    state = init_sharded_train_state(params, tx, mesh)
    sbatch = shard_batch(mesh, batch)
    step = make_sharded_train_step(cfg, tx, mesh)
    with mesh:
        new_state, losses = step(state, sbatch)
    total = float(jax.device_get(losses["total"]))
    assert np.isfinite(total)
    np.testing.assert_allclose(total, ref_total, rtol=2e-4)
    # gradient exactness: the optimizer update from pmean'd shard grads
    # must land on the same params as the single-device update
    for a, b in zip(jax.tree.leaves(jax.device_get(new_state.params)),
                    jax.tree.leaves(jax.device_get(new_state0.params))):
        np.testing.assert_allclose(a, b, rtol=1e-3, atol=1e-5)
    # updated params finite and actually changed
    leaf = jax.device_get(jax.tree.leaves(new_state.params)[0])
    assert np.isfinite(leaf).all()
    assert int(new_state.step) == 1
    # regression: the step's output TrainState must re-enter the SAME
    # executable — optimizer accumulators from tx.init used to come out
    # with default (single-device) shardings, so call #2 recompiled the
    # whole train graph (~35s per mvt-train launch on the TPU backend)
    with mesh:
        step(new_state, sbatch)
    assert step._cache_size() == 1


def test_multidevice_steps_disable_pallas():
    # pallas_call has no GSPMD partitioning rule: sharded multi-device
    # steps must fall back to the jnp paths, single-device keeps kernels
    from multiverse_tpu.parallel.mesh import _no_pallas_if_multidevice

    cfg = tiny_cfg()
    assert cfg.allow_pallas
    assert not _no_pallas_if_multidevice(
        cfg, make_mesh(n_devices=8)).allow_pallas
    assert _no_pallas_if_multidevice(
        cfg, make_mesh(n_devices=1)).allow_pallas


@pytest.mark.parametrize("quant", ["none", "int8"])
def test_sharded_beam_step_keeps_fused_kernels(monkeypatch, quant):
    """Multi-device inference goes through shard_map, so the fused
    pallas decode kernel runs on every chip's batch slice — outputs
    must equal the single-device fused path exactly (same per-sample
    kernel math; GSPMD alone cannot partition pallas_call).  Covered
    for the bf16 kernel AND the int8 tier `mvt-serve` defaults to on
    TPU (the quantized operands ride shard_map the same way)."""
    from multiverse_tpu.inference import beam_forward
    from multiverse_tpu.ops import pallas_decode
    from multiverse_tpu.parallel import make_sharded_beam_step

    monkeypatch.setattr(pallas_decode, "FORCE_INTERPRET_FUSED", True)
    cfg = tiny_cfg(use_beam_search=True, beam_size=4, diverse_beam=True,
                   diverse_gamma=0.01, use_gnn=True, use_scene_enc=True,
                   compute_dtype="bfloat16", decode_quant=quant)
    n = 8
    params = init_params(jax.random.PRNGKey(0), cfg)
    batch = tiny_batch(cfg, n)._replace(
        pred_grid_class=None, pred_grid_target_all=None,
        pred_length=np.full(n, cfg.pred_len, np.int32))

    mesh = make_mesh(n_devices=8)
    step = make_sharded_beam_step(cfg, mesh)
    with mesh:
        beam_m, reg_m = step(params, shard_batch(mesh, batch))

    jb = jax.tree.map(lambda x: None if x is None else jnp.asarray(x),
                      batch, is_leaf=lambda x: x is None)
    beam_1, reg_1 = jax.jit(lambda p, b: beam_forward(p, b, cfg))(
        params, jb)
    # the decode kernel is per-sample (bitwise across batchings), but
    # the bf16 encoder convs accumulate in a batch-size-dependent order
    # — beam ids stay identical, scores agree to bf16 precision
    np.testing.assert_array_equal(np.asarray(beam_m.ids),
                                  np.asarray(beam_1.ids))
    np.testing.assert_allclose(np.asarray(beam_m.logprobs),
                               np.asarray(beam_1.logprobs),
                               rtol=5e-3, atol=5e-3)
    np.testing.assert_allclose(
        np.asarray(reg_m, np.float32), np.asarray(reg_1, np.float32),
        rtol=2e-2, atol=2e-2)


def test_sharded_beam_step_runs():
    cfg = tiny_cfg(use_beam_search=True, beam_size=4, diverse_beam=True,
                   diverse_gamma=0.01)
    from multiverse_tpu.inference import beam_forward

    n = 8
    params = init_params(jax.random.PRNGKey(0), cfg)
    batch = tiny_batch(cfg, n)
    batch = Batch(
        obs_grid_class=batch.obs_grid_class,
        obs_grid_target_all=batch.obs_grid_target_all,
        obs_scene=batch.obs_scene,
        scene_feat=batch.scene_feat,
        pred_length=np.full(n, cfg.pred_len, np.int32),
    )
    mesh = make_mesh(n_devices=8)
    sbatch = shard_batch(mesh, batch)
    step = jax.jit(lambda p, b: beam_forward(p, b, cfg))
    with mesh:
        beam, reg = step(params, sbatch)
    i = cfg.active_scales[0]
    h, w = cfg.scene_grids[i]
    assert beam.ids.shape == (n, 4, cfg.pred_len)
    assert reg.shape == (n, cfg.pred_len, h, w, 2)
    assert np.isfinite(np.asarray(beam.logprobs)).all()


def test_graft_entry_dryrun():
    import importlib
    import os
    import sys

    # repo root (__graft_entry__.py lives there, not in tests/)
    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    g = importlib.import_module("__graft_entry__")
    g.dryrun_multichip(8)
    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    assert all(np.isfinite(np.asarray(o)).all() for o in jax.tree.leaves(out))
