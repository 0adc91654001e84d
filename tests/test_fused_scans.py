"""Paired-scan fusion (ops/fused_scans.py) == the separate scans, for
values AND gradients — both fusion modes, encoder and decoder pairs."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multiverse_tpu.config import MultiverseConfig
from multiverse_tpu.models import init_params
from multiverse_tpu.models.multiverse import greedy_decode
from multiverse_tpu.ops.convlstm import (
    ConvLSTMState,
    convlstm_init,
    convlstm_scan,
)
from multiverse_tpu.ops.fused_scans import (
    paired_convlstm_scan,
    paired_decode_scan,
)

N, T, H, W, D = 2, 3, 4, 6, 8
CA, CB = 5, 2


@pytest.fixture(scope="module")
def enc_setup():
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    cell_a = convlstm_init(k1, CA, D, 3)
    cell_b = convlstm_init(k2, CB, D, 3)
    rs = np.random.RandomState(0)
    xs_a = jnp.asarray(rs.randn(N, T, H, W, CA), jnp.float32)
    xs_b = jnp.asarray(rs.randn(N, T, H, W, CB), jnp.float32)
    return cell_a, cell_b, xs_a, xs_b


@pytest.mark.parametrize("mode", ["two_convs", "blockdiag"])
def test_paired_encoder_scan_matches_separate(enc_setup, mode):
    cell_a, cell_b, xs_a, xs_b = enc_setup
    oa, la = convlstm_scan(cell_a, xs_a)
    ob, lb = convlstm_scan(cell_b, xs_b)
    (poa, pla), (pob, plb) = paired_convlstm_scan(
        cell_a, cell_b, xs_a, xs_b, mode=mode)
    tol = dict(rtol=0, atol=0) if mode == "two_convs" \
        else dict(rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(poa, oa, **tol)
    np.testing.assert_allclose(pob, ob, **tol)
    np.testing.assert_allclose(pla.c, la.c, **tol)
    np.testing.assert_allclose(plb.h, lb.h, **tol)


@pytest.mark.parametrize("mode", ["two_convs", "blockdiag"])
def test_paired_encoder_grads_match(enc_setup, mode):
    cell_a, cell_b, xs_a, xs_b = enc_setup

    def loss_sep(ca, cb, xa, xb):
        oa, la = convlstm_scan(ca, xa)
        ob, lb = convlstm_scan(cb, xb)
        return (jnp.sum(oa ** 2) + jnp.sum(ob ** 2)
                + jnp.sum(la.h) + jnp.sum(lb.c))

    def loss_pair(ca, cb, xa, xb):
        (oa, la), (ob, lb) = paired_convlstm_scan(
            ca, cb, xa, xb, mode=mode)
        return (jnp.sum(oa ** 2) + jnp.sum(ob ** 2)
                + jnp.sum(la.h) + jnp.sum(lb.c))

    g_sep = jax.grad(loss_sep, (0, 1, 2, 3))(cell_a, cell_b, xs_a, xs_b)
    g_pair = jax.grad(loss_pair, (0, 1, 2, 3))(cell_a, cell_b, xs_a, xs_b)
    for a, b in zip(jax.tree_util.tree_leaves(g_sep),
                    jax.tree_util.tree_leaves(g_pair)):
        np.testing.assert_allclose(a, b, rtol=2e-5, atol=2e-5)


@pytest.fixture(scope="module")
def dec_setup():
    cfg = MultiverseConfig(
        scene_h=H * 2, scene_w=W * 2, scene_class=4,
        scene_grid_strides=(2, 4), use_grids=(True, False),
        emb_size=6, enc_hidden_size=D, dec_hidden_size=D,
        scene_conv_dim=5, use_gnn=True, use_scene_enc=True,
    ).validate()
    params = init_params(jax.random.PRNGKey(1), cfg)
    sp = params["scales"][str(cfg.active_scales[0])]
    rs = np.random.RandomState(1)
    first_onehot = jnp.asarray(
        (rs.rand(N, H, W, 1) > 0.9).astype(np.float32))
    first_reg = jnp.asarray(rs.randn(N, H, W, 2), jnp.float32)
    st_c = ConvLSTMState(
        c=jnp.asarray(rs.randn(N, H, W, D), jnp.float32),
        h=jnp.asarray(rs.randn(N, H, W, D), jnp.float32))
    st_r = ConvLSTMState(
        c=jnp.asarray(rs.randn(N, H, W, D), jnp.float32),
        h=jnp.asarray(rs.randn(N, H, W, D), jnp.float32))
    smean = jnp.asarray(rs.randn(N, H, W, 5), jnp.float32)
    return cfg, sp, first_onehot, first_reg, st_c, st_r, smean


@pytest.mark.parametrize("mode", ["two_convs", "blockdiag"])
def test_paired_decoder_scan_matches_separate(dec_setup, mode):
    cfg, sp, first_onehot, first_reg, st_c, st_r, smean = dec_setup
    T_pred = cfg.pred_len
    logits, states = greedy_decode(
        sp, cfg, first_onehot, st_c, T_pred,
        "dec_class_emb", "dec_class", "h2g_class",
        use_gnn=True, scene_mean=smean, feedback="onehot")
    reg, _ = greedy_decode(
        sp, cfg, first_reg, st_r, T_pred,
        "dec_reg_emb", "dec_reg", "h2g_reg",
        use_gnn=False, feedback="raw")
    p_logits, p_states, p_reg = paired_decode_scan(
        sp, cfg, first_onehot, st_c, first_reg, st_r, T_pred, smean,
        mode=mode)
    tol = dict(rtol=0, atol=0) if mode == "two_convs" \
        else dict(rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(p_logits, logits, **tol)
    np.testing.assert_allclose(p_states, states, **tol)
    np.testing.assert_allclose(p_reg, reg, **tol)


@pytest.mark.parametrize("mode", ["two_convs", "blockdiag"])
def test_paired_decoder_grads_match(dec_setup, mode):
    cfg, sp, first_onehot, first_reg, st_c, st_r, smean = dec_setup
    T_pred = cfg.pred_len

    def loss_sep(p, sc, sr, sm):
        logits, states = greedy_decode(
            p, cfg, first_onehot, sc, T_pred,
            "dec_class_emb", "dec_class", "h2g_class",
            use_gnn=True, scene_mean=sm, feedback="onehot")
        reg, _ = greedy_decode(
            p, cfg, first_reg, sr, T_pred,
            "dec_reg_emb", "dec_reg", "h2g_reg",
            use_gnn=False, feedback="raw")
        return jnp.sum(logits ** 2) + jnp.sum(states) + jnp.sum(reg ** 2)

    def loss_pair(p, sc, sr, sm):
        logits, states, reg = paired_decode_scan(
            p, cfg, first_onehot, sc, first_reg, sr, T_pred, sm,
            mode=mode)
        return jnp.sum(logits ** 2) + jnp.sum(states) + jnp.sum(reg ** 2)

    g_sep = jax.grad(loss_sep, (0, 1, 2, 3))(sp, st_c, st_r, smean)
    g_pair = jax.grad(loss_pair, (0, 1, 2, 3))(sp, st_c, st_r, smean)
    for (pa, a), (pb, b) in zip(
            jax.tree_util.tree_flatten_with_path(g_sep)[0],
            jax.tree_util.tree_flatten_with_path(g_pair)[0]):
        np.testing.assert_allclose(a, b, rtol=3e-5, atol=3e-5,
                                   err_msg=str(pa))


def test_model_forward_fuse_scan_pairs_identical():
    """cfg.fuse_scan_pairs flips the encoder+decoder pairs to the
    merged scans; the full train-mode forward (incl. dropout — the
    per-site rng streams must line up) is bit-identical."""
    import sys

    sys.path.insert(0, "/root/repo")
    from __graft_entry__ import _flagship_config, _synthetic_batch
    from multiverse_tpu.models import model_forward

    cfg = _flagship_config().replace(
        scene_h=12, scene_w=16, enc_hidden_size=16, dec_hidden_size=16,
        scene_conv_dim=8, emb_size=8, obs_len=3, pred_len=4,
        keep_prob=0.7).validate()
    params = init_params(jax.random.PRNGKey(2), cfg)
    batch = _synthetic_batch(cfg, 3, np.random.RandomState(3))
    rng = jax.random.PRNGKey(5)
    # pin BOTH sides: fuse_scan_pairs defaults to True since round 5,
    # so an un-pinned baseline would compare fused against fused
    out = model_forward(
        params, batch, cfg.replace(fuse_scan_pairs=False).validate(),
        is_train=True, rng=rng)
    out_f = model_forward(
        params, batch, cfg.replace(fuse_scan_pairs=True).validate(),
        is_train=True, rng=rng)
    for d, df in ((out.class_logits, out_f.class_logits),
                  (out.reg_out, out_f.reg_out),
                  (out.dec_states, out_f.dec_states)):
        for k in d:
            np.testing.assert_array_equal(np.asarray(d[k]),
                                          np.asarray(df[k]))
    # and gradients through the paired path stay finite + matching
    def loss(p, fuse):
        c = cfg.replace(fuse_scan_pairs=fuse).validate()
        o = model_forward(p, batch, c, is_train=True, rng=rng)
        i = c.active_scales[0]
        return jnp.sum(o.class_logits[i] ** 2) + jnp.sum(o.reg_out[i] ** 2)

    g = jax.grad(loss)(params, False)
    gf = jax.grad(loss)(params, True)
    for a, b in zip(jax.tree_util.tree_leaves(g),
                    jax.tree_util.tree_leaves(gf)):
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("mode", ["two_convs", "blockdiag"])
def test_paired_encoder_dropout_matches_separate(enc_setup, mode):
    """Dropout parity: each half must consume the SAME rng stream the
    separate scans would (fresh fold_in(t) mask per step per cell)."""
    cell_a, cell_b, xs_a, xs_b = enc_setup
    ra, rb = jax.random.PRNGKey(7), jax.random.PRNGKey(9)
    oa, la = convlstm_scan(cell_a, xs_a, keep_prob=0.6, dropout_rng=ra)
    ob, lb = convlstm_scan(cell_b, xs_b, keep_prob=0.6, dropout_rng=rb)
    (poa, pla), (pob, plb) = paired_convlstm_scan(
        cell_a, cell_b, xs_a, xs_b, mode=mode, keep_prob=0.6,
        dropout_rngs=(ra, rb))
    tol = dict(rtol=0, atol=0) if mode == "two_convs" \
        else dict(rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(poa, oa, **tol)
    np.testing.assert_allclose(pob, ob, **tol)
    np.testing.assert_allclose(pla.h, la.h, **tol)
    np.testing.assert_allclose(plb.c, lb.c, **tol)
