"""SimAug training machinery: attacks, multiview mixup, loss, data."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multiverse_tpu.data.multiview import (
    build_multiview_extras,
    get_agent_id,
)
from multiverse_tpu.geometry import one_hot_grid
from multiverse_tpu.models import init_params
from multiverse_tpu.models.simaug import (
    MultiviewBatch,
    SimAugConfig,
    _per_example_ce,
    make_simaug_train_step,
    multiview_augmentation,
    simaug_loss,
    tower_forward,
    white_box_attack,
)
from multiverse_tpu.train.trainer import build_optimizer, init_train_state


def tiny_cfg(**kw):
    base = dict(
        obs_len=4, pred_len=5,
        scene_h=12, scene_w=16, scene_class=5,
        emb_size=8, enc_hidden_size=16, dec_hidden_size=16,
        scene_conv_dim=8,
        scene_grid_strides=(2, 4), use_grids=(True, False),
        use_gnn=True, use_scene_enc=True,
        batch_size=4, adv_epsilon=0.1,
    )
    base.update(kw)
    return SimAugConfig(**base).validate()


def make_mv_batch(cfg, n, m, rng):
    i = cfg.active_scales[0]
    h, w = cfg.scene_grids[i]
    F = 6
    scene = np.zeros((F, cfg.scene_h, cfg.scene_w, cfg.scene_class),
                     np.uint8)
    lab = rng.randint(0, cfg.scene_class, (F, cfg.scene_h, cfg.scene_w))
    scene[np.arange(F)[:, None, None],
          np.arange(cfg.scene_h)[None, :, None],
          np.arange(cfg.scene_w)[None, None, :], lab] = 1
    return MultiviewBatch(
        obs_grid_class=rng.randint(
            0, h * w, (n, cfg.num_scales, cfg.obs_len)).astype(np.int32),
        obs_grid_target=rng.randn(
            n, cfg.obs_len, h, w, 2).astype(np.float32),
        obs_scene=rng.randint(0, F, (n, cfg.obs_len)).astype(np.int32),
        scene_feat=scene.astype(np.float32),
        pred_grid_class=rng.randint(
            0, h * w, (n, cfg.num_scales, cfg.pred_len)).astype(np.int32),
        pred_grid_target=rng.randn(
            n, cfg.pred_len, h, w, 2).astype(np.float32),
        obs_grid_class_extra=rng.randint(
            0, h * w, (n, m, cfg.obs_len)).astype(np.int32),
        pred_grid_class_extra=rng.randint(
            0, h * w, (n, m, cfg.pred_len)).astype(np.int32),
        obs_scene_extra=rng.randint(
            0, F, (n, m, cfg.obs_len)).astype(np.int32),
    )


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_cfg()
    params = init_params(jax.random.PRNGKey(0), cfg)
    batch = make_mv_batch(cfg, 4, cfg.multiview_max_num,
                          np.random.RandomState(0))
    return cfg, params, batch


def _scene_input(batch, cfg):
    N = batch.obs_grid_class.shape[0]
    return batch.scene_feat[batch.obs_scene.reshape(-1)].reshape(
        (N, cfg.obs_len) + batch.scene_feat.shape[1:]).astype(np.float32)


def test_fgsm_attack_bounded_and_targeted(setup):
    cfg, params, batch = setup
    cfg = cfg.replace(adv_use_fgsm=True, adv_train=True)
    i = cfg.active_scales[0]
    h, w = cfg.scene_grids[i]
    scene = jnp.asarray(_scene_input(batch, cfg))
    obs_oh = one_hot_grid(batch.obs_grid_class[:, i], h, w)
    labels = jnp.asarray(batch.pred_grid_class[:, i])

    adv, target = white_box_attack(
        params, jax.random.PRNGKey(1), scene, labels,
        obs_oh, jnp.asarray(batch.obs_grid_target), cfg)
    adv = np.asarray(adv)
    # inside the ε-ball and value-clipped
    assert np.abs(adv - np.asarray(scene)).max() <= cfg.adv_epsilon + 1e-6
    assert adv.min() >= -1.0 - 1e-6 and adv.max() <= 1.0 + 1e-6
    # targets differ from the true labels everywhere
    assert (np.asarray(target) != np.asarray(labels)).all()
    # the FGSM step reduced CE toward the target vs the clean input
    ce_clean = _per_example_ce(
        params, scene, obs_oh, jnp.asarray(batch.obs_grid_target),
        target, cfg)
    ce_adv = _per_example_ce(
        params, jnp.asarray(adv), obs_oh,
        jnp.asarray(batch.obs_grid_target), target, cfg)
    assert float(ce_adv.mean()) < float(ce_clean.mean())


def test_pgd_attack_runs(setup):
    cfg, params, batch = setup
    cfg = cfg.replace(adv_use_fgsm=False, adv_num_iter=3,
                      adv_step_size=0.02, adv_train=True)
    i = cfg.active_scales[0]
    h, w = cfg.scene_grids[i]
    scene = jnp.asarray(_scene_input(batch, cfg))
    obs_oh = one_hot_grid(batch.obs_grid_class[:, i], h, w)
    adv, _ = white_box_attack(
        params, jax.random.PRNGKey(1), scene,
        jnp.asarray(batch.pred_grid_class[:, i]),
        obs_oh, jnp.asarray(batch.obs_grid_target), cfg)
    assert np.isfinite(np.asarray(adv)).all()
    assert np.abs(np.asarray(adv) - np.asarray(scene)).max() \
        <= cfg.adv_epsilon + 1e-6


def test_multiview_exp3(setup):
    cfg, params, batch = setup
    cfg = cfg.replace(multiview_train=True, multiview_exp=3,
                      adv_use_fgsm=True)
    scene = jnp.asarray(_scene_input(batch, cfg))
    adv, mix = multiview_augmentation(
        params, jax.random.PRNGKey(2), batch, scene, cfg)
    assert adv.shape == scene.shape
    assert np.isfinite(np.asarray(adv)).all()
    focal = np.asarray(mix.focal_weight)
    assert (focal >= 0).all() and (focal <= 1).all()
    sel = np.asarray(mix.selected_idx)
    assert (sel >= 0).all() and (sel < cfg.multiview_max_num).all()
    assert 0.0 <= float(mix.beta_weight) <= 1.0


@pytest.mark.parametrize("mode", ["clean", "adv", "multiview", "standard"])
def test_simaug_loss_and_grads(setup, mode):
    cfg, params, batch = setup
    kw = dict(
        adv=dict(adv_train=True, adv_use_fgsm=True),
        multiview=dict(multiview_train=True, multiview_exp=3,
                       double_weighting=True),
        standard=dict(standard_aug=True),
        clean=dict(),
    )[mode]
    cfg = cfg.replace(**kw)
    total, parts = simaug_loss(
        params, batch, cfg, jax.random.PRNGKey(3))
    assert np.isfinite(float(total))
    grads = jax.grad(
        lambda p: simaug_loss(p, batch, cfg, jax.random.PRNGKey(3))[0]
    )(params)
    gnorm = sum(float(jnp.abs(g).sum()) for g in jax.tree.leaves(grads))
    assert np.isfinite(gnorm) and gnorm > 0


def test_simaug_train_step(setup):
    cfg, params, batch = setup
    cfg = cfg.replace(multiview_train=True, multiview_exp=3,
                      adv_use_fgsm=True)
    tx = build_optimizer(cfg, 40)
    state, _ = init_train_state(
        jax.tree.map(jnp.array, params), cfg, 40)
    step = make_simaug_train_step(cfg, tx)
    state, parts = step(state, batch, jax.random.PRNGKey(4))
    assert np.isfinite(float(parts["total"]))
    assert int(state.step) == 1


def test_clean_simaug_matches_multiverse_core(setup):
    """With every augmentation off, the SimAug tower must agree with
    the Multiverse forward pass (shared parameter pytree)."""
    from multiverse_tpu.models import Batch, model_forward

    cfg, params, batch = setup
    i = cfg.active_scales[0]
    h, w = cfg.scene_grids[i]
    scene = jnp.asarray(_scene_input(batch, cfg))
    obs_oh = one_hot_grid(batch.obs_grid_class[:, i], h, w)
    logits_t, reg_t = tower_forward(
        params, scene, obs_oh, jnp.asarray(batch.obs_grid_target), cfg)

    core_batch = Batch(
        obs_grid_class=jnp.asarray(batch.obs_grid_class),
        obs_grid_target_all=(jnp.asarray(batch.obs_grid_target),),
        obs_scene=jnp.asarray(batch.obs_scene),
        scene_feat=jnp.asarray(batch.scene_feat),
        pred_grid_class=jnp.asarray(batch.pred_grid_class),
        pred_grid_target_all=(jnp.asarray(batch.pred_grid_target),),
    )
    out = model_forward(params, core_batch, cfg, is_train=False)
    np.testing.assert_allclose(
        np.asarray(logits_t), np.asarray(out.class_logits[i]),
        rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(reg_t), np.asarray(out.reg_out[i]),
        rtol=1e-5, atol=1e-5)


def test_agent_grouping():
    keys = [
        "VIRAT_S_0400_F_1879_obs12_pred16_cam1_84_4",
        "VIRAT_S_0400_F_1879_obs12_pred16_cam2_84_4",
        "VIRAT_S_0400_F_1879_obs12_pred16_cam3_84_4",
        "VIRAT_S_0400_F_1879_obs12_pred16_cam1_85_2",
    ]
    assert get_agent_id(keys[0]) == get_agent_id(keys[1])
    assert get_agent_id(keys[0]) != get_agent_id(keys[3])

    rng = np.random.RandomState(0)
    obs = rng.randint(0, 48, (4, 4)).astype(np.int32)
    pred = rng.randint(0, 48, (4, 5)).astype(np.int32)
    scn = rng.randint(0, 3, (4, 4)).astype(np.int32)
    ex = build_multiview_extras(keys, obs, pred, scn, max_views=2)
    assert ex.num_views == 2
    # example 0's extras are examples 1 and 2 (same agent)
    np.testing.assert_array_equal(ex.obs_grid_class_extra[0, 0], obs[1])
    np.testing.assert_array_equal(ex.obs_grid_class_extra[0, 1], obs[2])
    # the singleton agent pads with itself
    np.testing.assert_array_equal(ex.obs_grid_class_extra[3, 0], obs[3])
    np.testing.assert_array_equal(ex.pred_grid_class_extra[3, 1], pred[3])


def test_simaug_grad_through_pallas_gnn_dispatch(setup, monkeypatch):
    """On the chip, gnn_step_auto routes the attack towers through the
    Pallas GNN custom_vjp — which has NO forward-mode rule, so
    jax.value_and_grad(simaug_loss) dies with "Linearization failed"
    unless the attack subgraph is primal-only (params stop_gradient'ed
    at the attack entry; its outputs already were).  CPU tests never
    hit this (the dispatch is TPU-only), so this test replicates the
    TPU dispatch via interpret mode and takes the full outer gradient.
    """
    import multiverse_tpu.models.multiverse as mv
    from multiverse_tpu.ops.pallas_gnn import gnn_step_pallas

    def pallas_dispatch(hidden, scene_feat=None, compute_dtype=None,
                        allow_pallas=True):
        return gnn_step_pallas(
            hidden.astype(jnp.bfloat16),
            None if scene_feat is None
            else scene_feat.astype(jnp.bfloat16),
            interpret=True)

    monkeypatch.setattr(mv, "gnn_step_auto", pallas_dispatch)
    cfg, params, batch = setup
    cfg = cfg.replace(multiview_train=True)
    jb = jax.tree_util.tree_map(jnp.asarray, batch)
    (total, _), grads = jax.value_and_grad(simaug_loss, has_aux=True)(
        params, jb, cfg, jax.random.PRNGKey(0))
    assert np.isfinite(float(total))
    gsum = sum(float(np.abs(np.asarray(g)).sum())
               for g in jax.tree_util.tree_leaves(grads))
    assert np.isfinite(gsum) and gsum > 0
