"""Layer library unit tests: conv2d/linear vs numpy refs, ConvLSTM vs a
literal transcription of tf.contrib.rnn.ConvLSTMCell gate math, GNN step
vs a dense numpy reference."""

import jax
import jax.numpy as jnp
import numpy as np

from multiverse_tpu.ops import (
    ConvLSTMState,
    conv2d,
    convlstm_init,
    convlstm_scan,
    convlstm_step,
    gnn_neighbor_mask,
    gnn_step,
    init_conv,
    init_linear,
    linear,
)
from multiverse_tpu.ops.layers import exp_mask, l2_weight_decay


def _np_conv2d_same(x, w, stride=1):
    """Naive NHWC SAME conv."""
    n, h, wd, cin = x.shape
    kh, kw, _, cout = w.shape
    ph, pw = kh // 2, kw // 2
    xp = np.pad(x, [(0, 0), (ph, ph), (pw, pw), (0, 0)])
    oh = int(np.ceil(h / stride))
    ow = int(np.ceil(wd / stride))
    out = np.zeros((n, oh, ow, cout), dtype=np.float32)
    for i in range(oh):
        for j in range(ow):
            patch = xp[:, i * stride:i * stride + kh, j * stride:j * stride + kw, :]
            out[:, i, j, :] = np.tensordot(patch, w, axes=([1, 2, 3], [0, 1, 2]))
    return out


def test_conv2d_matches_numpy(rng):
    key = jax.random.PRNGKey(0)
    p = init_conv(key, 4, 8, kernel=3)
    x = rng.randn(2, 6, 10, 4).astype(np.float32)
    got = np.asarray(conv2d(p, jnp.asarray(x)))
    want = _np_conv2d_same(x, np.asarray(p["w"])) + np.asarray(p["b"])
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_conv2d_stride2_shape():
    key = jax.random.PRNGKey(1)
    p = init_conv(key, 11, 64, kernel=3)
    x = jnp.zeros((3, 36, 64, 11))
    # stride-2 SAME over 36x64 -> 18x32; over odd 9x16... ceil division
    assert conv2d(p, x, stride=2).shape == (3, 18, 32, 64)
    p2 = init_conv(key, 64, 64, kernel=3)
    assert conv2d(p2, conv2d(p, x, stride=2), stride=2).shape == (3, 9, 16, 64)


def test_linear(rng):
    key = jax.random.PRNGKey(2)
    p = init_linear(key, 5, 7, add_bias=True)
    x = rng.randn(3, 4, 5).astype(np.float32)
    got = np.asarray(linear(p, jnp.asarray(x)))
    want = x @ np.asarray(p["w"]) + np.asarray(p["b"])
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


# ---------------------------------------------------------------- ConvLSTM


def _ref_convlstm_step(kernel, bias, x, c, h, forget_bias=1.0):
    """Literal numpy transcription of TF1.15 contrib ConvLSTMCell.call:
    one conv over concat([x, h]), split into (i, g, f, o)."""

    def sigmoid(v):
        return 1.0 / (1.0 + np.exp(-v))

    xin = np.concatenate([x, h], axis=-1)
    gates = _np_conv2d_same(xin, kernel) + bias
    i, g, f, o = np.split(gates, 4, axis=-1)
    new_c = sigmoid(f + forget_bias) * c + sigmoid(i) * np.tanh(g)
    new_h = np.tanh(new_c) * sigmoid(o)
    return new_c, new_h


def test_convlstm_step_matches_tf_gate_math(rng):
    key = jax.random.PRNGKey(3)
    in_ch, hid = 3, 5
    p = convlstm_init(key, in_ch, hid, kernel=3)
    x = rng.randn(2, 4, 6, in_ch).astype(np.float32)
    c0 = rng.randn(2, 4, 6, hid).astype(np.float32)
    h0 = rng.randn(2, 4, 6, hid).astype(np.float32)
    out, st = convlstm_step(
        p, jnp.asarray(x), ConvLSTMState(jnp.asarray(c0), jnp.asarray(h0))
    )
    want_c, want_h = _ref_convlstm_step(
        np.asarray(p["kernel"]), np.asarray(p["bias"]), x, c0, h0
    )
    np.testing.assert_allclose(np.asarray(st.c), want_c, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(st.h), want_h, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(out), want_h, rtol=1e-4, atol=1e-4)


def test_convlstm_scan_matches_unrolled(rng):
    key = jax.random.PRNGKey(4)
    p = convlstm_init(key, 2, 4, kernel=3)
    xs = rng.randn(3, 6, 4, 5, 2).astype(np.float32)
    outs, final = convlstm_scan(p, jnp.asarray(xs))
    c = np.zeros((3, 4, 5, 4), np.float32)
    h = np.zeros((3, 4, 5, 4), np.float32)
    for t in range(6):
        c, h = _ref_convlstm_step(
            np.asarray(p["kernel"]), np.asarray(p["bias"]), xs[:, t], c, h
        )
        np.testing.assert_allclose(
            np.asarray(outs[:, t]), h, rtol=1e-4, atol=1e-4
        )
    np.testing.assert_allclose(np.asarray(final.h), h, rtol=1e-4, atol=1e-4)


def test_convlstm_seq_length_masking(rng):
    key = jax.random.PRNGKey(5)
    p = convlstm_init(key, 2, 4)
    xs = rng.randn(2, 6, 4, 5, 2).astype(np.float32)
    lengths = jnp.array([6, 3])
    outs, final = convlstm_scan(p, jnp.asarray(xs), seq_lengths=lengths)
    # sample 1: outputs zero past t=3, state frozen at t=3
    assert float(jnp.abs(outs[1, 3:]).max()) == 0.0
    outs_full, _ = convlstm_scan(p, jnp.asarray(xs[1:2, :3]))
    np.testing.assert_allclose(
        np.asarray(outs[1, :3]), np.asarray(outs_full[0]), rtol=1e-5, atol=1e-5
    )


# ---------------------------------------------------------------- GNN


def test_gnn_neighbor_mask_golden():
    m = gnn_neighbor_mask(3, 4)  # 12 cells
    # cell (1,1)=idx5 neighbors: all 9 cells around it
    want = np.zeros((3, 4))
    want[0:3, 0:3] = 1
    np.testing.assert_array_equal(m[5].reshape(3, 4), want)
    # corner cell 0 has 4 neighbors
    assert m[0].sum() == 4
    # edge cell 1 has 6
    assert m[1].sum() == 6
    assert np.all(m == m.T)


def test_gnn_step_matches_numpy(rng):
    h, w, d = 3, 4, 6
    hidden = rng.randn(2, h, w, d).astype(np.float32)
    scene = rng.randn(2, h, w, 5).astype(np.float32)
    mask = gnn_neighbor_mask(h, w)
    got = np.asarray(gnn_step(jnp.asarray(hidden), jnp.asarray(mask),
                              jnp.asarray(scene)))

    # numpy reference (reference: code/pred_models.py:808-909 math)
    node = np.concatenate(
        [hidden.reshape(2, h * w, d), scene.reshape(2, h * w, 5)], -1
    )
    node = node / np.sqrt(
        np.maximum((node ** 2).sum(-1, keepdims=True), 1e-12)
    )
    edges = node @ node.transpose(0, 2, 1)
    edges = edges + (1 - mask)[None] * -1e30
    e = np.exp(edges - edges.max(-1, keepdims=True))
    attn = e / e.sum(-1, keepdims=True)
    want = (attn @ hidden.reshape(2, h * w, d)).reshape(2, h, w, d)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_exp_mask():
    v = jnp.array([1.0, 2.0])
    m = jnp.array([1.0, 0.0])
    out = np.asarray(exp_mask(v, m))
    assert out[0] == 1.0 and out[1] < -1e29


def test_l2_weight_decay_only_w():
    params = {
        "a": {"w": jnp.ones((2, 2)), "b": jnp.ones((2,))},
        "cell": {"kernel": jnp.ones((3, 3)), "bias": jnp.ones((3,))},
    }
    wd = float(l2_weight_decay(params, 0.1))
    # only a/w counts: 0.5 * 0.1 * 4
    assert abs(wd - 0.2) < 1e-6


def test_gnn_neighbor_reformulation_matches_dense():
    """The 9-shift GNN must equal the dense masked-softmax version."""
    import jax.numpy as jnp

    from multiverse_tpu.ops import (
        gnn_neighbor_mask,
        gnn_step,
        gnn_step_neighbors,
    )

    rng = np.random.RandomState(0)
    N, H, W, D, C = 3, 6, 8, 16, 4
    hidden = jnp.asarray(rng.randn(N, H, W, D).astype(np.float32))
    scene = jnp.asarray(rng.randn(N, H, W, C).astype(np.float32))
    mask = jnp.asarray(gnn_neighbor_mask(H, W))

    dense = np.asarray(gnn_step(hidden, mask, scene))
    fast = np.asarray(gnn_step_neighbors(hidden, scene))
    np.testing.assert_allclose(fast, dense, rtol=1e-5, atol=1e-5)

    # without scene features too
    dense = np.asarray(gnn_step(hidden, mask, None))
    fast = np.asarray(gnn_step_neighbors(hidden, None))
    np.testing.assert_allclose(fast, dense, rtol=1e-5, atol=1e-5)


def test_pallas_gnn_kernel_matches(monkeypatch):
    """The fused Pallas kernel equals the jnp paths (interpret mode)."""
    import jax.numpy as jnp

    from multiverse_tpu.ops import gnn_step_neighbors
    from multiverse_tpu.ops.pallas_gnn import gnn_step_pallas

    rng = np.random.RandomState(1)
    h = jnp.asarray(rng.randn(8, 6, 8, 16).astype(np.float32))
    s = jnp.asarray(rng.randn(8, 6, 8, 4).astype(np.float32))
    out = np.asarray(gnn_step_pallas(h, s, block_n=4, interpret=True))
    ref = np.asarray(gnn_step_neighbors(h, s))
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)
    out = np.asarray(gnn_step_pallas(h, None, block_n=4, interpret=True))
    ref = np.asarray(gnn_step_neighbors(h, None))
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)
    # non-divisible N falls back to a valid divisor
    h7 = jnp.asarray(rng.randn(6, 6, 8, 16).astype(np.float32))
    out = np.asarray(gnn_step_pallas(h7, None, block_n=4, interpret=True))
    ref = np.asarray(gnn_step_neighbors(h7, None))
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)


def test_pallas_gnn_custom_vjp_matches_jnp_grads():
    """The kernel's fused backward (custom VJP) gives the same
    gradients as autodiff through the jnp 9-neighbor path — so training
    and SimAug input-gradient attacks may run the Pallas fast path."""
    import jax
    import jax.numpy as jnp

    from multiverse_tpu.ops import gnn_step_neighbors
    from multiverse_tpu.ops.pallas_gnn import gnn_step_pallas

    rng = np.random.RandomState(2)
    h = jnp.asarray(rng.randn(4, 6, 8, 16).astype(np.float32))
    s = jnp.asarray(rng.randn(4, 6, 8, 4).astype(np.float32))
    cot = jnp.asarray(rng.randn(4, 6, 8, 16).astype(np.float32))

    def loss_pallas(h, s):
        return jnp.sum(gnn_step_pallas(h, s, interpret=True) * cot)

    def loss_jnp(h, s):
        return jnp.sum(gnn_step_neighbors(h, s) * cot)

    gh_p, gs_p = jax.grad(loss_pallas, argnums=(0, 1))(h, s)
    gh_j, gs_j = jax.grad(loss_jnp, argnums=(0, 1))(h, s)
    np.testing.assert_allclose(np.asarray(gh_p), np.asarray(gh_j),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gs_p), np.asarray(gs_j),
                               rtol=1e-4, atol=1e-4)

    # without scene features (single differentiable input)
    gh_p = jax.grad(
        lambda h: jnp.sum(gnn_step_pallas(h, None, interpret=True)
                          * cot))(h)
    gh_j = jax.grad(
        lambda h: jnp.sum(gnn_step_neighbors(h, None) * cot))(h)
    np.testing.assert_allclose(np.asarray(gh_p), np.asarray(gh_j),
                               rtol=1e-4, atol=1e-4)


def test_pallas_cell_kernel_matches(rng):
    """Fused cell kernel == cell step within bf16 rounding
    (the kernel keeps f32 gates; the XLA bf16 path stores bf16 gates)."""
    import jax
    import jax.numpy as jnp

    from multiverse_tpu.ops import ConvLSTMState, convlstm_init
    from multiverse_tpu.ops.convlstm import convlstm_step
    from multiverse_tpu.ops.pallas_cell import convlstm_step_pallas

    params = convlstm_init(jax.random.PRNGKey(0), 8, 16, 3)
    x = jnp.asarray(rng.randn(4, 6, 8, 8).astype(np.float32))
    st = ConvLSTMState(
        c=jnp.asarray(rng.randn(4, 6, 8, 16).astype(np.float32)),
        h=jnp.asarray(rng.randn(4, 6, 8, 16).astype(np.float32)))
    ref_h, ref_st = convlstm_step(params, x, st,
                                  compute_dtype=jnp.bfloat16)
    out_h, out_st = convlstm_step_pallas(params, x, st, interpret=True)
    np.testing.assert_allclose(
        np.asarray(out_h, np.float32), np.asarray(ref_h, np.float32),
        atol=0.05)
    np.testing.assert_allclose(
        np.asarray(out_st.c, np.float32),
        np.asarray(ref_st.c, np.float32), atol=0.05)


def test_pallas_decode_step_matches_composition(rng):
    """Fused decode-step kernel == GNN + cell + readout composition."""
    import jax
    import jax.numpy as jnp

    from multiverse_tpu.ops import (
        ConvLSTMState,
        conv2d,
        convlstm_init,
        convlstm_step,
        gnn_step_neighbors,
        init_conv,
    )
    from multiverse_tpu.ops.pallas_decode import decode_step_pallas

    N, H, W, E, D, C = 3, 6, 8, 8, 16, 4
    bf = jnp.bfloat16
    cell_p = convlstm_init(jax.random.PRNGKey(0), E, D, 3)
    h2g_p = init_conv(jax.random.PRNGKey(1), D, 1, 3, add_bias=False)
    emb = jnp.asarray(rng.randn(N, H, W, E).astype(np.float32)).astype(bf)
    st = ConvLSTMState(
        c=jnp.asarray(rng.randn(N, H, W, D).astype(np.float32)).astype(bf),
        h=jnp.asarray(rng.randn(N, H, W, D).astype(np.float32)).astype(bf))
    scene = jnp.asarray(
        rng.randn(N, H, W, C).astype(np.float32)).astype(bf)

    agg = gnn_step_neighbors(st.h, scene, compute_dtype=bf)
    st2 = ConvLSTMState(
        c=st.c, h=(st.h.astype(jnp.float32) + agg).astype(bf))
    out, ref_st = convlstm_step(cell_p, emb, st2, compute_dtype=bf)
    ref_logits = conv2d(h2g_p, out, compute_dtype=bf)

    fh, fst, flogits = decode_step_pallas(
        cell_p, h2g_p, emb, st, scene, H, W, interpret=True)
    np.testing.assert_allclose(
        np.asarray(fh, np.float32), np.asarray(out, np.float32),
        atol=0.06)
    np.testing.assert_allclose(
        np.asarray(fst.c, np.float32), np.asarray(ref_st.c, np.float32),
        atol=0.06)
    np.testing.assert_allclose(
        np.asarray(flogits), np.asarray(ref_logits), atol=0.06)


def test_pallas_decode_v2_matches_v1(rng):
    """v2 (emb gate tables + scalar prefetch) == v1 in interpret mode
    (not wired on TPU: Mosaic dynamic-store alignment — see
    pallas_decode.py docstring)."""
    import jax
    import jax.numpy as jnp

    from multiverse_tpu.geometry import one_hot_grid
    from multiverse_tpu.ops import (
        ConvLSTMState,
        conv2d,
        convlstm_init,
        init_conv,
    )
    from multiverse_tpu.ops.layers import get_activation
    from multiverse_tpu.ops.pallas_decode import (
        build_emb_gates_tables,
        decode_step_pallas,
        decode_step_pallas_v2,
    )

    N, H, W, E, D, C = 3, 6, 8, 8, 16, 4
    bf = jnp.bfloat16
    act = get_activation("tanh")
    cell_p = convlstm_init(jax.random.PRNGKey(0), E, D, 3)
    h2g_p = init_conv(jax.random.PRNGKey(1), D, 1, 3, add_bias=False)
    emb_p = init_conv(jax.random.PRNGKey(2), 1, E, 3)
    ids = jnp.asarray(rng.randint(0, H * W, N).astype(np.int32))
    st = ConvLSTMState(
        c=jnp.asarray(rng.randn(N, H, W, D).astype(np.float32)).astype(bf),
        h=jnp.asarray(rng.randn(N, H, W, D).astype(np.float32)).astype(bf))
    scene = jnp.asarray(
        rng.randn(N, H, W, C).astype(np.float32)).astype(bf)
    basis = one_hot_grid(jnp.arange(H * W), H, W)
    emb_table = conv2d(emb_p, basis, activation=act, compute_dtype=bf)
    h1, st1, l1 = decode_step_pallas(
        cell_p, h2g_p, emb_table[ids], st, scene, H, W, interpret=True)
    bg, dev = build_emb_gates_tables(emb_p, cell_p, H, W, act)
    h2, st2, l2 = decode_step_pallas_v2(
        cell_p, h2g_p, ids, bg, dev, st, scene, H, W, interpret=True)
    np.testing.assert_allclose(
        np.asarray(h1, np.float32), np.asarray(h2, np.float32),
        atol=0.05)
    np.testing.assert_allclose(
        np.asarray(l1), np.asarray(l2), atol=0.05)


def test_pallas_decode_gathered_matches_gather_then_step(rng):
    """decode_step_pallas_gathered (beam reorder folded into the
    kernel's scalar-prefetch block reads) == explicit parent gather +
    decode_step_pallas, in interpret mode."""
    import jax.numpy as jnp

    from multiverse_tpu.ops.convlstm import ConvLSTMState
    from multiverse_tpu.ops.pallas_decode import (
        decode_step_pallas,
        decode_step_pallas_gathered,
    )

    H, W, D, E, C, NK = 6, 8, 16, 8, 4, 6
    HW = H * W
    cell = {"kernel": jnp.asarray(
        rng.randn(3, 3, E + D, 4 * D), jnp.float32),
        "bias": jnp.asarray(rng.randn(4 * D), jnp.float32)}
    h2g = {"w": jnp.asarray(rng.randn(3, 3, D, 1), jnp.float32)}
    emb_table = jnp.asarray(rng.randn(HW, H, W, E), jnp.float32)
    state = ConvLSTMState(
        c=jnp.asarray(rng.randn(NK, H, W, D), jnp.float32),
        h=jnp.asarray(rng.randn(NK, H, W, D), jnp.float32))
    scene = jnp.asarray(rng.randn(NK, H, W, C), jnp.float32)
    ids = jnp.asarray(rng.randint(0, HW, NK), jnp.int32)
    parents = jnp.asarray(rng.permutation(NK), jnp.int32)

    st_g = ConvLSTMState(c=state.c[parents], h=state.h[parents])
    _, s1, l1 = decode_step_pallas(
        cell, h2g, emb_table[ids], st_g, scene[parents], H, W,
        interpret=True)
    _, s2, l2 = decode_step_pallas_gathered(
        cell, h2g, ids, parents, emb_table, state, scene[parents],
        H, W, interpret=True)
    for a, b in [(s1.h, s2.h), (s1.c, s2.c), (l1, l2)]:
        np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b, np.float32),
            rtol=2e-2, atol=2e-2)


def test_pallas_decode_gathered_q8_tracks_f32(rng):
    """int8-gate fused step (decode_step_pallas_gathered_q8) tracks the
    composed f32 path within quantization tolerance in interpret mode.

    The int8 path's static scales rely on the decode invariants: the
    recurrent h is a ConvLSTM output (tanh·sigmoid, |h| < 1) so
    |h + agg| < 2, and the embedding rows come from a precomputed table
    quantized with per-channel maxima.  The test states respect the
    h-bound the way every real decode does (encoder h seeds the beam)."""
    import jax.numpy as jnp

    from multiverse_tpu.geometry import one_hot_grid
    from multiverse_tpu.ops import (
        ConvLSTMState,
        conv2d,
        convlstm_step,
        gnn_step,
        gnn_neighbor_mask,
    )
    from multiverse_tpu.ops.pallas_decode import (
        decode_step_pallas_gathered_q8,
        decode_step_pallas_gathered_q8v2,
        quantize_decode_weights,
        quantize_decode_weights_v2,
    )

    H, W, D, E, C, NK = 6, 8, 16, 8, 4, 6
    HW = H * W
    cell = {"kernel": jnp.asarray(
        rng.randn(3, 3, E + D, 4 * D), jnp.float32) * 0.05,
        "bias": jnp.asarray(rng.randn(4 * D), jnp.float32) * 0.1}
    h2g = {"w": jnp.asarray(rng.randn(3, 3, D, 1), jnp.float32) * 0.1}
    emb_p = {"w": jnp.asarray(rng.randn(3, 3, 1, E), jnp.float32) * 0.5,
             "b": jnp.asarray(rng.randn(E), jnp.float32) * 0.1}
    basis = one_hot_grid(jnp.arange(HW), H, W)
    emb_table = conv2d(emb_p, basis, activation=jnp.tanh)
    state = ConvLSTMState(
        c=jnp.asarray(rng.randn(NK, H, W, D), jnp.float32),
        h=jnp.asarray(np.tanh(rng.randn(NK, H, W, D)), jnp.float32))
    scene = jnp.asarray(rng.randn(NK, H, W, C), jnp.float32) * 0.3
    ids = jnp.asarray(rng.randint(0, HW, NK), jnp.int32)
    parents = jnp.asarray(rng.permutation(NK), jnp.int32)

    # composed f32 reference with explicit gathers
    hg, cg = state.h[parents], state.c[parents]
    mask = jnp.asarray(gnn_neighbor_mask(H, W))
    hh = hg + gnn_step(hg, mask, scene)
    out, ref_st = convlstm_step(
        cell, emb_table[ids], ConvLSTMState(c=cg, h=hh))
    ref_logits = conv2d(h2g, out)

    quant = quantize_decode_weights(cell, emb_table)
    assert quant[0].dtype == jnp.int8 and quant[1].dtype == jnp.int8
    qh, qst, qlogits = decode_step_pallas_gathered_q8(
        quant, cell["bias"], h2g, ids, parents,
        state, scene, H, W, interpret=True)

    np.testing.assert_allclose(
        np.asarray(qh, np.float32), np.asarray(out, np.float32),
        atol=0.08)
    np.testing.assert_allclose(
        np.asarray(qst.c, np.float32), np.asarray(ref_st.c, np.float32),
        atol=0.08)
    np.testing.assert_allclose(
        np.asarray(qlogits), np.asarray(ref_logits), atol=0.08)

    # int8a: same quantized operands, attention matmuls in int8 too.
    # Operand bounds are structural (unit-norm node rows, softmax
    # weights, tanh-bounded h), so the same composed-f32 tolerance must
    # hold; additionally it must stay within pure attention-quant noise
    # of the plain q8 step (same gate matmul bit-for-bit given equal
    # attention output granularity ~1/127).
    from multiverse_tpu.ops.pallas_decode import (
        decode_step_pallas_gathered_q8a,
    )
    ah, ast, alogits = decode_step_pallas_gathered_q8a(
        quant, cell["bias"], h2g, ids, parents,
        state, scene, H, W, interpret=True)
    np.testing.assert_allclose(
        np.asarray(ah, np.float32), np.asarray(out, np.float32),
        atol=0.08)
    np.testing.assert_allclose(
        np.asarray(ast.c, np.float32), np.asarray(ref_st.c, np.float32),
        atol=0.08)
    np.testing.assert_allclose(
        np.asarray(alogits), np.asarray(ref_logits), atol=0.08)
    np.testing.assert_allclose(
        np.asarray(ah, np.float32), np.asarray(qh, np.float32),
        atol=0.03)

    # v2: split emb/recurrent matmuls + per-row dynamic scales
    quant2 = quantize_decode_weights_v2(cell, emb_table)
    assert quant2[0].dtype == jnp.int8
    assert quant2[1].dtype == jnp.int8 and quant2[3].dtype == jnp.int8
    q2h, q2st, q2logits = decode_step_pallas_gathered_q8v2(
        quant2, cell["bias"], h2g, ids, parents,
        state, scene, H, W, interpret=True)
    np.testing.assert_allclose(
        np.asarray(q2h, np.float32), np.asarray(out, np.float32),
        atol=0.08)
    np.testing.assert_allclose(
        np.asarray(q2logits), np.asarray(ref_logits), atol=0.08)


def test_analytic_flops_accounting():
    """multiverse_tpu.flops sanity: the MFU artifact's numerator."""
    from multiverse_tpu.config import MultiverseConfig
    from multiverse_tpu.flops import (
        beam_decode_flops,
        convlstm_step_flops,
        gnn_step_flops,
        train_fwd_flops,
        train_step_flops,
    )

    # hand-checked: 2 * hw * 9 * (cin + d) * 4d
    assert convlstm_step_flops(18, 32, 32, 256) == \
        2 * 576 * 9 * 288 * 1024
    assert gnn_step_flops(18, 32, 256, 64) == \
        2 * 576 * 576 * (256 + 64) + 2 * 576 * 576 * 256

    cfg = MultiverseConfig(
        scene_grid_strides=(2, 4), use_grids=(True, False),
        use_gnn=True, use_scene_enc=True, use_beam_search=True,
        beam_size=20, diverse_beam=True).validate()
    f1 = beam_decode_flops(cfg, 64, 25)
    # the beam axis dominates: doubling K must roughly double the total
    f2 = beam_decode_flops(cfg.replace(beam_size=40).validate(), 64, 25)
    assert 1.7 < f2 / f1 < 2.0
    # flagship decode batch is O(100) TFLOP (STATUS.md §Perf scale)
    assert 50e12 < f1 < 200e12

    assert train_step_flops(cfg, 20) == 3.0 * train_fwd_flops(cfg, 20)
    # disabling the GNN removes its per-step cost
    assert train_fwd_flops(cfg.replace(use_gnn=False), 20) < \
        train_fwd_flops(cfg, 20)

    # the int8a-tier partition sums exactly to the total, and the class
    # readout really is negligible (the recorded quantize-the-readout
    # negative, VERDICT r4 #4)
    from multiverse_tpu.flops import beam_decode_flops_split
    split = beam_decode_flops_split(cfg, 64, 25)
    assert split["int8_gate"] + split["int8_attn"] \
        + split["bf16_rest"] == f1
    assert split["bf16_readout_class"] / f1 < 0.002
    assert split["int8_gate"] / f1 > 0.5
