"""norm_input ([-1,1] scene scaling) consistency across train/eval.

The reference normalizes inside build_tower for train AND test alike
(reference: SimAug/code/pred_models.py:284-286) and exposes
--norm_input on its test driver (SimAug/code/test.py:103-105).  Here
the flag is a BASE config field applied in scene_encode, so the SimAug
training loss, the in-training val eval, mvt-test, and the beam path
all see the same inputs.
"""

import jax
import jax.numpy as jnp
import numpy as np

from multiverse_tpu.models import init_params, model_forward
from multiverse_tpu.models.simaug import tower_forward
from synthetic import make_batch, tiny_config
from test_simaug import make_mv_batch, tiny_cfg


def _to_jax(batch):
    return jax.tree_util.tree_map(jnp.asarray, batch)


def test_norm_input_changes_forward(rng):
    cfg = tiny_config(use_gnn=True, use_scene_enc=True)
    params = init_params(jax.random.PRNGKey(0), cfg)
    batch = _to_jax(make_batch(rng, cfg, 2)[0])
    base = model_forward(params, batch, cfg)
    normed = model_forward(params, batch,
                           cfg.replace(norm_input=True))
    assert not np.array_equal(np.asarray(base.class_logits[0]),
                              np.asarray(normed.class_logits[0]))


def test_train_eval_consistency_under_norm_input():
    """The training tower (explicitly normalized scene input) and the
    shared eval forward (cfg.norm_input in scene_encode) must produce
    IDENTICAL outputs for the same weights — this is the guarantee the
    in-training val eval and mvt-test rely on."""
    cfg = tiny_cfg(norm_input=True)
    params = init_params(jax.random.PRNGKey(0), cfg)
    mv = make_mv_batch(cfg, 3, cfg.multiview_max_num,
                       np.random.RandomState(1))
    mv = _to_jax(mv)
    i = cfg.active_scales[0]

    # training-side tower: normalize explicitly like simaug_loss does
    scene_input = mv.scene_feat[mv.obs_scene.reshape(-1)].reshape(
        (3, cfg.obs_len) + mv.scene_feat.shape[1:]).astype(jnp.float32)
    scene_input = scene_input * 2.0 - 1.0
    from multiverse_tpu.geometry import one_hot_grid
    h, w = cfg.scene_grids[i]
    obs_onehot = one_hot_grid(mv.obs_grid_class[:, i], h, w)
    tower_logits, tower_reg = tower_forward(
        params, scene_input, obs_onehot, mv.obs_grid_target, cfg)

    # eval-side shared forward (what mvt-test / the val eval run)
    from multiverse_tpu.models import Batch
    eval_batch = Batch(
        obs_grid_class=mv.obs_grid_class,
        obs_grid_target_all=(mv.obs_grid_target,),
        obs_scene=mv.obs_scene,
        scene_feat=mv.scene_feat,
    )
    out = model_forward(params, eval_batch, cfg, is_train=False)
    np.testing.assert_allclose(np.asarray(out.class_logits[i]),
                               np.asarray(tower_logits),
                               rtol=0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out.reg_out[i]),
                               np.asarray(tower_reg),
                               rtol=0, atol=1e-5)


def test_norm_input_cli_plumbing():
    """--norm_input parses on mvt-test and mvt-train-simaug and lands
    in the config (incl. the SimAugConfig built from base fields)."""
    import dataclasses

    from multiverse_tpu.cli import test as cli_test
    from multiverse_tpu.cli import train_simaug as cli_ts
    from multiverse_tpu.cli.common import config_from_args
    from multiverse_tpu.models.simaug import SimAugConfig

    args = cli_test.build_parser().parse_args(
        ["prep", "out", "model", "--norm_input"])
    assert config_from_args(args).norm_input is True

    args = cli_ts.build_parser().parse_args(
        ["prep", "out", "model", "--norm_input"])
    base = config_from_args(args)
    cfg = SimAugConfig(
        **dataclasses.asdict(base),
        **{k: getattr(args, k) for k in cli_ts.SIMAUG_FIELDS},
    ).validate()
    assert cfg.norm_input is True
    # the SimAug trainer defaults to the reference's keep_prob 0.7
    assert cfg.keep_prob == 0.7
