"""Recurrent (cell-input) dropout — the reference's DropoutWrapper.

The reference wraps all four ConvLSTM cells in
``tf.nn.rnn_cell.DropoutWrapper(cell, keep_prob)`` (input dropout,
fresh mask per timestep, train-only: code/pred_models.py:130-131,
:195,:202,:242,:249).  keep_prob == 1 must stay bit-identical to the
dropout-free build; keep_prob < 1 must actually perturb training and
never touch the eval path.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multiverse_tpu.config import MultiverseConfig
from multiverse_tpu.models import (
    compute_loss,
    init_params,
    model_forward,
)
from multiverse_tpu.ops.convlstm import (
    convlstm_init,
    convlstm_scan,
    input_dropout,
)
from synthetic import make_batch, tiny_config


def _to_jax(batch):
    return jax.tree_util.tree_map(jnp.asarray, batch)


# ------------------------------------------------------------- unit level


def test_input_dropout_inverted_scaling():
    key = jax.random.PRNGKey(0)
    x = jnp.ones((64, 64), jnp.float32)
    y = np.asarray(input_dropout(key, x, 0.7))
    # surviving entries are scaled by 1/keep_prob, dropped are zero
    assert np.all((np.abs(y) < 1e-6) | (np.abs(y - 1.0 / 0.7) < 1e-5))
    # keep fraction is near keep_prob
    assert abs((y > 0).mean() - 0.7) < 0.05


def test_convlstm_scan_dropout_gating():
    params = convlstm_init(jax.random.PRNGKey(1), 3, 8)
    xs = jnp.asarray(np.random.RandomState(0).randn(2, 4, 6, 6, 3),
                     jnp.float32)
    base, _ = convlstm_scan(params, xs)
    # keep_prob < 1 but NO rng -> dropout off (eval path)
    same, _ = convlstm_scan(params, xs, keep_prob=0.7)
    np.testing.assert_array_equal(np.asarray(base), np.asarray(same))
    # rng given but keep_prob == 1 -> off
    same2, _ = convlstm_scan(params, xs, keep_prob=1.0,
                             dropout_rng=jax.random.PRNGKey(2))
    np.testing.assert_array_equal(np.asarray(base), np.asarray(same2))
    # both -> on, reproducible per key, different across keys
    d1, _ = convlstm_scan(params, xs, keep_prob=0.7,
                          dropout_rng=jax.random.PRNGKey(2))
    d1b, _ = convlstm_scan(params, xs, keep_prob=0.7,
                           dropout_rng=jax.random.PRNGKey(2))
    d2, _ = convlstm_scan(params, xs, keep_prob=0.7,
                          dropout_rng=jax.random.PRNGKey(3))
    assert not np.array_equal(np.asarray(base), np.asarray(d1))
    np.testing.assert_array_equal(np.asarray(d1), np.asarray(d1b))
    assert not np.array_equal(np.asarray(d1), np.asarray(d2))


def test_convlstm_scan_dropout_masks_differ_per_timestep():
    """Non-variational wrapper: a fresh mask every step, so a constant
    input must produce different zero patterns at different t."""
    params = convlstm_init(jax.random.PRNGKey(1), 4, 4)
    xs = jnp.ones((1, 6, 4, 4, 4), jnp.float32)
    # recover the per-step masks by scanning a cell with zero kernel:
    # gates are all bias (=0) so outputs depend only on the mask... use
    # input_dropout directly instead, folded like the scan body does
    rng = jax.random.PRNGKey(7)
    m0 = np.asarray(input_dropout(jax.random.fold_in(rng, 0),
                                  xs[:, 0], 0.5))
    m1 = np.asarray(input_dropout(jax.random.fold_in(rng, 1),
                                  xs[:, 1], 0.5))
    assert not np.array_equal(m0, m1)


def test_config_rejects_bad_keep_prob():
    with pytest.raises(ValueError):
        MultiverseConfig(keep_prob=0.0).validate()
    with pytest.raises(ValueError):
        MultiverseConfig(keep_prob=1.5).validate()
    MultiverseConfig(keep_prob=0.7).validate()


# ------------------------------------------------------------ model level


def test_model_forward_keep_prob1_bit_identical(rng):
    cfg = tiny_config()
    assert cfg.keep_prob == 1.0
    params = init_params(jax.random.PRNGKey(0), cfg)
    batch = _to_jax(make_batch(rng, cfg, 3)[0])
    base = model_forward(params, batch, cfg, is_train=True)
    # supplying an rng at keep_prob == 1 must not change anything
    withrng = model_forward(params, batch, cfg, is_train=True,
                            rng=jax.random.PRNGKey(5))
    np.testing.assert_array_equal(np.asarray(base.class_logits[0]),
                                  np.asarray(withrng.class_logits[0]))
    np.testing.assert_array_equal(np.asarray(base.reg_out[0]),
                                  np.asarray(withrng.reg_out[0]))


def test_model_forward_dropout_requires_rng(rng):
    cfg = tiny_config(keep_prob=0.7)
    params = init_params(jax.random.PRNGKey(0), cfg)
    batch = _to_jax(make_batch(rng, cfg, 2)[0])
    with pytest.raises(ValueError, match="keep_prob"):
        model_forward(params, batch, cfg, is_train=True)
    # eval path never needs one and is unaffected by keep_prob
    ev = model_forward(params, batch, cfg, is_train=False)
    ev_ref = model_forward(params, batch, cfg.replace(keep_prob=1.0),
                           is_train=False)
    np.testing.assert_array_equal(np.asarray(ev.class_logits[0]),
                                  np.asarray(ev_ref.class_logits[0]))


def test_train_loss_perturbed_by_dropout(rng):
    cfg = tiny_config(keep_prob=0.7)
    params = init_params(jax.random.PRNGKey(0), cfg)
    batch = _to_jax(make_batch(rng, cfg, 3)[0])

    def loss(key):
        out = model_forward(params, batch, cfg, is_train=True, rng=key)
        return float(compute_loss(params, batch, out, cfg)[0])

    l1 = loss(jax.random.PRNGKey(1))
    l1b = loss(jax.random.PRNGKey(1))
    l2 = loss(jax.random.PRNGKey(2))
    clean = float(compute_loss(
        params, batch,
        model_forward(params, batch, cfg.replace(keep_prob=1.0),
                      is_train=True), cfg)[0])
    assert l1 == l1b                       # reproducible per key
    assert l1 != l2                        # mask actually varies
    assert l1 != clean and l2 != clean     # dropout actually applied


def test_train_step_threads_rng(rng):
    from multiverse_tpu.train.trainer import (
        init_train_state,
        make_train_step,
    )

    cfg = tiny_config(keep_prob=0.7)
    params = init_params(jax.random.PRNGKey(0), cfg)
    state, tx = init_train_state(params, cfg, 40)
    step = make_train_step(cfg, tx)
    batch = _to_jax(make_batch(rng, cfg, cfg.batch_size)[0])
    s1, p1 = step(state, batch, jax.random.PRNGKey(1))
    # the step donates its state (params included) — rebuild from a
    # fresh, undonated param pytree for the second key
    params2 = init_params(jax.random.PRNGKey(0), cfg)
    state2, _ = init_train_state(params2, cfg, 40)
    s2, p2 = step(state2, batch, jax.random.PRNGKey(2))
    assert float(p1["total"]) != float(p2["total"])


def test_sharded_train_step_dropout_runs(rng):
    """Pure-DP shard_map path with dropout: per-shard masks are
    decorrelated via axis_index and the step runs end-to-end."""
    from multiverse_tpu.parallel import (
        init_sharded_train_state,
        make_mesh,
        make_sharded_train_step,
        shard_batch,
    )
    from multiverse_tpu.train.trainer import build_optimizer

    cfg = tiny_config(keep_prob=0.7)
    params = init_params(jax.random.PRNGKey(0), cfg)
    mesh = make_mesh(n_devices=2)
    tx = build_optimizer(cfg, 40)
    state = init_sharded_train_state(params, tx, mesh)
    step = make_sharded_train_step(cfg, tx, mesh)
    batch = make_batch(rng, cfg, cfg.batch_size)[0]
    with mesh:
        s1, p1 = step(state, shard_batch(mesh, batch),
                      jax.random.PRNGKey(1))
    assert np.isfinite(float(p1["total"]))


def test_simaug_dropout(rng):
    from multiverse_tpu.models.simaug import SimAugConfig, simaug_loss
    from test_simaug import make_mv_batch, tiny_cfg

    cfg = tiny_cfg(keep_prob=0.7, multiview_train=True,
                   use_grids=(True, False))
    batch = jax.tree_util.tree_map(
        jnp.asarray, make_mv_batch(cfg, 2, cfg.multiview_max_num,
                                   np.random.RandomState(0)))
    params = init_params(jax.random.PRNGKey(0), cfg)
    t1, _ = simaug_loss(params, batch, cfg, jax.random.PRNGKey(1))
    t1b, _ = simaug_loss(params, batch, cfg, jax.random.PRNGKey(1))
    # same rng but dropout OFF -> differs (so dropout is in the path)
    t_clean, _ = simaug_loss(params, batch,
                             cfg.replace(keep_prob=1.0),
                             jax.random.PRNGKey(1))
    assert float(t1) == float(t1b)
    assert float(t1) != float(t_clean)
