"""Model forward + loss tests on tiny shapes."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multiverse_tpu.models import (
    compute_loss,
    init_params,
    model_forward,
    soft_grid_labels,
    SOFT_GRID_KERNELS,
)
from synthetic import make_batch, tiny_config


def _to_jax(batch):
    return jax.tree_util.tree_map(jnp.asarray, batch)


def test_forward_shapes(rng):
    cfg = tiny_config()
    params = init_params(jax.random.PRNGKey(0), cfg)
    batch, _ = make_batch(rng, cfg, 4)
    out = model_forward(params, _to_jax(batch), cfg)
    h, w = cfg.scene_grids[0]
    assert out.class_logits[0].shape == (4, cfg.pred_len, h, w, 1)
    assert out.reg_out[0].shape == (4, cfg.pred_len, h, w, 2)
    assert out.dec_states[0].shape == (4, cfg.pred_len, h, w, 16)
    assert len(out.scene_convs) == 2
    assert out.scene_convs[0].shape == (4, cfg.obs_len, h, w, 8)


def test_forward_two_scales(rng):
    cfg = tiny_config(use_grids=(True, True))
    params = init_params(jax.random.PRNGKey(0), cfg)
    batch, _ = make_batch(rng, cfg, 2)
    out = model_forward(params, _to_jax(batch), cfg)
    assert set(out.class_logits) == {0, 1}
    h2, w2 = cfg.scene_grids[1]
    assert out.class_logits[1].shape == (2, cfg.pred_len, h2, w2, 1)


def test_forward_no_scene_enc_no_gnn(rng):
    cfg = tiny_config(use_scene_enc=False, use_gnn=False)
    params = init_params(jax.random.PRNGKey(0), cfg)
    assert "scene_conv1" not in params
    assert "enc_grid_emb" in params["scales"]["0"]
    batch, _ = make_batch(rng, cfg, 2)
    out = model_forward(params, _to_jax(batch), cfg)
    assert out.class_logits[0].shape[1] == cfg.pred_len


def test_forward_single_decoder(rng):
    cfg = tiny_config(use_single_decoder=True)
    params = init_params(jax.random.PRNGKey(0), cfg)
    assert "dec_reg" not in params["scales"]["0"]
    batch, _ = make_batch(rng, cfg, 2)
    out = model_forward(params, _to_jax(batch), cfg)
    assert out.reg_out[0].shape[-1] == 2


def test_forward_deterministic_and_jittable(rng):
    cfg = tiny_config()
    params = init_params(jax.random.PRNGKey(0), cfg)
    batch, _ = make_batch(rng, cfg, 2)
    jb = _to_jax(batch)
    f = jax.jit(lambda p, b: model_forward(p, b, cfg))
    o1 = f(params, jb)
    o2 = f(params, jb)
    np.testing.assert_array_equal(
        np.asarray(o1.class_logits[0]), np.asarray(o2.class_logits[0])
    )
    o3 = model_forward(params, jb, cfg)
    np.testing.assert_allclose(
        np.asarray(o1.class_logits[0]),
        np.asarray(o3.class_logits[0]),
        rtol=2e-5, atol=2e-5,
    )


def test_argmax_feedback_loop(rng):
    """The class decoder must feed back the one-hot of its own argmax."""
    from multiverse_tpu.models.multiverse import _grid_argmax_onehot

    logits = jnp.asarray(rng.randn(3, 6, 8, 1).astype(np.float32))
    oh = _grid_argmax_onehot(logits)
    flat = np.asarray(logits).reshape(3, -1)
    for i in range(3):
        want = np.zeros(48)
        want[flat[i].argmax()] = 1
        np.testing.assert_array_equal(np.asarray(oh[i]).reshape(-1), want)


def test_soft_grid_labels_matches_scipy(rng):
    from scipy import ndimage

    h, w = 6, 9
    labels = jnp.asarray(rng.randint(0, h * w, (2, 3)))
    for sg in sorted(SOFT_GRID_KERNELS):
        got = np.asarray(soft_grid_labels(labels, h, w, sg))
        k = np.asarray(SOFT_GRID_KERNELS[sg], dtype="float64")
        for i in range(2):
            for t in range(3):
                onehot = np.zeros((h * w))
                onehot[int(labels[i, t])] = 1.0
                want = ndimage.convolve(
                    onehot.reshape(h, w), k, mode="constant", cval=0.0
                )
                np.testing.assert_allclose(
                    got[i, t, :, :, 0], want, rtol=1e-5, atol=1e-6
                )


def test_loss_values(rng):
    cfg = tiny_config()
    params = init_params(jax.random.PRNGKey(0), cfg)
    batch, _ = make_batch(rng, cfg, 4)
    jb = _to_jax(batch)
    out = model_forward(params, jb, cfg, is_train=True)
    total, parts = compute_loss(params, jb, out, cfg)
    assert np.isfinite(float(total))
    # manual CE check
    h, w = cfg.scene_grids[0]
    logits = np.asarray(out.class_logits[0]).reshape(-1, h * w)
    labels = np.asarray(batch.pred_grid_class)[:, 0].reshape(-1)
    lse = np.log(np.exp(logits - logits.max(1, keepdims=True)).sum(1))
    ce = (lse - (logits - logits.max(1, keepdims=True))[
        np.arange(len(labels)), labels]).mean()
    np.testing.assert_allclose(float(parts["grid0_class"]),
                               ce * cfg.grid_loss_weight, rtol=1e-4)
    # huber: |err|<=1 -> 0.5 err^2
    reg = np.asarray(out.reg_out[0])
    tgt = np.asarray(batch.pred_grid_target_all[0])
    err = reg - tgt
    hub = np.where(np.abs(err) <= 1, 0.5 * err ** 2, np.abs(err) - 0.5)
    np.testing.assert_allclose(
        float(parts["grid0_reg"]), hub.mean() * cfg.grid_reg_loss_weight,
        rtol=1e-4,
    )
    assert float(parts["wd"]) > 0
    np.testing.assert_allclose(
        float(total),
        float(parts["grid0_class"] + parts["grid0_reg"] + parts["wd"]),
        rtol=1e-5,
    )


def test_loss_soft_grid_and_mask(rng):
    cfg = tiny_config(use_soft_grid_class=True, soft_grid=4,
                      mask_grid_regression=True)
    params = init_params(jax.random.PRNGKey(0), cfg)
    batch, _ = make_batch(rng, cfg, 2)
    jb = _to_jax(batch)
    out = model_forward(params, jb, cfg, is_train=True)
    total, parts = compute_loss(params, jb, out, cfg)
    assert np.isfinite(float(total))
    assert float(parts["grid0_reg"]) >= 0


def test_loss_gradients_flow(rng):
    cfg = tiny_config()
    params = init_params(jax.random.PRNGKey(0), cfg)
    batch, _ = make_batch(rng, cfg, 2)
    jb = _to_jax(batch)

    def loss_fn(p):
        out = model_forward(p, jb, cfg, is_train=True)
        return compute_loss(p, jb, out, cfg)[0]

    grads = jax.grad(loss_fn)(params)
    flat = jax.tree_util.tree_leaves(grads)
    assert all(np.all(np.isfinite(np.asarray(g))) for g in flat)
    # every parameter gets some gradient (encoder regs etc.)
    nonzero = [float(np.abs(np.asarray(g)).max()) > 0 for g in flat]
    assert sum(nonzero) >= len(flat) - 2  # scene convs may be tiny but not 0


def test_remat_gradients_match(rng):
    """cfg.remat recomputes the scan steps in the backward (capacity
    feature for large-batch training) — gradients must be identical to
    the stored-residual path."""
    cfg = tiny_config()
    params = init_params(jax.random.PRNGKey(0), cfg)
    batch, _ = make_batch(rng, cfg, 2)
    jb = _to_jax(batch)

    def loss_fn(c):
        def f(p):
            out = model_forward(p, jb, c, is_train=True)
            return compute_loss(p, jb, out, c)[0]
        return f

    v0, g0 = jax.value_and_grad(loss_fn(cfg))(params)
    v1, g1 = jax.value_and_grad(loss_fn(cfg.replace(remat=True)))(params)
    np.testing.assert_allclose(float(v0), float(v1), rtol=1e-6)
    for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-7)


def test_bf16_training_step_differentiable(rng):
    """Gradients must flow through the full bf16 compute path (bf16
    conv outputs have no transpose rule when f32-preferred)."""
    import jax

    from multiverse_tpu.models import init_params
    from multiverse_tpu.train.trainer import (
        build_optimizer,
        init_train_state,
        make_train_step,
    )
    from tests.synthetic import make_batch, tiny_config

    cfg = tiny_config(compute_dtype="bfloat16", use_gnn=True,
                      use_scene_enc=True)
    params = init_params(jax.random.PRNGKey(0), cfg)
    batch, _ = make_batch(rng, cfg, 4)
    tx = build_optimizer(cfg, 16)
    state, _ = init_train_state(params, cfg, 16)
    step = make_train_step(cfg, tx)
    state, losses = step(state, batch)
    assert np.isfinite(float(losses["total"]))


def test_dual_scale_forward_loss_and_eval(rng):
    """Both grid scales active (use_grids 1,1): per-scale heads, losses
    and metrics (reference supports <=2 active scales,
    code/pred_utils.py:124)."""
    import jax

    from multiverse_tpu.models import (
        compute_loss,
        init_params,
        model_forward,
    )
    from tests.synthetic import make_batch, tiny_config

    cfg = tiny_config(use_grids=(True, True), use_gnn=True,
                      use_scene_enc=True)
    params = init_params(jax.random.PRNGKey(0), cfg)
    batch, _ = make_batch(rng, cfg, 3)
    out = model_forward(params, batch, cfg, is_train=True)
    assert set(out.class_logits) == {0, 1}
    for i in (0, 1):
        h, w = cfg.scene_grids[i]
        assert out.class_logits[i].shape == (3, cfg.pred_len, h, w, 1)
        assert out.reg_out[i].shape == (3, cfg.pred_len, h, w, 2)
    total, parts = compute_loss(params, batch, out, cfg)
    assert np.isfinite(float(total))
    assert "grid0_class" in parts and "grid1_class" in parts

    # gradient flows through both scales
    def loss_fn(p):
        o = model_forward(p, batch, cfg, is_train=True)
        return compute_loss(p, batch, o, cfg)[0]

    grads = jax.grad(loss_fn)(params)
    g0 = jax.tree.leaves(grads["scales"]["0"])
    g1 = jax.tree.leaves(grads["scales"]["1"])
    assert all(np.isfinite(np.asarray(g)).all() for g in g0 + g1)
    assert sum(float(np.abs(np.asarray(g)).sum()) for g in g1) > 0


def test_dual_scale_evaluate(rng):
    """evaluate() reports per-scale metrics with both scales active."""
    import jax

    from multiverse_tpu.data.dataset import TrajectoryDataset
    from multiverse_tpu.models import init_params, model_forward
    from multiverse_tpu.train.evaluate import evaluate
    from tests.synthetic import make_batch, tiny_config
    from multiverse_tpu import geometry

    cfg = tiny_config(use_grids=(True, True))
    params = init_params(jax.random.PRNGKey(0), cfg)
    n = 6
    batch, trajs = make_batch(rng, cfg, n)
    data = {
        "obs_grid_class": np.asarray(batch.obs_grid_class),
        "pred_grid_class": np.asarray(batch.pred_grid_class),
        "obs_scene": np.asarray(batch.obs_scene)[..., None],
        "obs_traj": trajs[:, :cfg.obs_len],
        "pred_traj": trajs[:, cfg.obs_len:],
        "traj_key": ["v_%d_0" % i for i in range(n)],
    }
    for idx, i in enumerate(cfg.active_scales):
        data["obs_grid_target_all_%d" % i] = np.asarray(
            batch.obs_grid_target_all[idx])
        data["pred_grid_target_all_%d" % i] = np.asarray(
            batch.pred_grid_target_all[idx])
    shared = {
        "scene_feat": np.asarray(batch.scene_feat, np.uint8),
    }
    for i in range(cfg.num_scales):
        h, w = cfg.scene_grids[i]
        shared["grid_center_%d" % i] = geometry.grid_centers(
            cfg.video_h, cfg.video_w, h, w)
    ds = TrajectoryDataset(data, shared, cfg, "test")

    def step_fn(b):
        out = model_forward(params, b, cfg, is_train=False)
        return out.class_logits, out.reg_out

    perf = evaluate(ds, cfg, step_fn, batch_size=3, use_gt_grid=True)
    assert "grid0_traj_ade" in perf and "grid1_traj_ade" in perf
    # with GT cells the center-only error is bounded by a cell diagonal
    h1, w1 = cfg.scene_grids[1]
    diag = np.hypot(cfg.video_h / h1, cfg.video_w / w1)
    assert perf["grid1_traj_centerOnly_ade"] <= diag


@pytest.mark.parametrize("quant", ["none", "int8", "int8a"])
def test_fused_greedy_wiring_interpret(rng, monkeypatch, quant):
    """greedy_decode's fused branch (argmax-id carry, emb table,
    identity parents) exercised on CPU in interpret mode: batched ==
    per-sample exactly, and the first step (no feedback divergence
    yet) matches the composed bf16 path within kernel tolerance.
    Parametrized over the int8 tiers (the mvt-test/serving greedy fast
    paths ride the same select_quant dispatch)."""
    import jax.numpy as jnp

    from multiverse_tpu.ops import pallas_decode
    from synthetic import make_batch, tiny_config

    cfg = tiny_config(compute_dtype="bfloat16", decode_quant=quant)
    params = init_params(jax.random.PRNGKey(3), cfg)
    batch, _ = make_batch(rng, cfg, 3)
    jb = jax.tree_util.tree_map(jnp.asarray, batch)
    i = cfg.active_scales[0]

    composed = model_forward(params, jb, cfg, is_train=False)

    monkeypatch.setattr(pallas_decode, "FORCE_INTERPRET_FUSED", True)
    fused = model_forward(params, jb, cfg, is_train=False)

    # first step: same inputs — bf16-rounding-level agreement for the
    # plain tier, composed-f32-distance tolerance for the int8 tiers
    # (the composed path has no quantization; cf. test_ops' q8 bound)
    tol = 3e-2 if quant == "none" else 0.1
    np.testing.assert_allclose(
        np.asarray(fused.class_logits[i][:, 0], np.float32),
        np.asarray(composed.class_logits[i][:, 0], np.float32),
        rtol=tol, atol=tol)

    # batched fused == per-sample fused (same kernel/rounding -> exact)
    def slice_batch(b, n):
        def cut(name, v):
            if v is None or name == "scene_feat":
                return v
            if isinstance(v, tuple):
                return tuple(x[n:n + 1] for x in v)
            return v[n:n + 1]

        return type(b)(**{name: cut(name, getattr(b, name))
                          for name in b._fields})

    for n in range(3):
        one = model_forward(params, slice_batch(jb, n), cfg,
                            is_train=False)
        np.testing.assert_array_equal(
            np.asarray(fused.class_logits[i][n]),
            np.asarray(one.class_logits[i][0]))
