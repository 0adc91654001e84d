"""Per-segment roofline decomposition of the training step.

The whole train step measures ~55% of the chip's matmul roofline
(BENCH_EXTRA_r03.json); this bench breaks that number down so each
segment's achieved TFLOP/s can be compared against ITS OWN bound
instead of leaving the gap unexplained.  Round 2 proved these conv
shapes can hide layout disasters invisible at step altitude (the
channel-first readout fix), so each stage of model_forward is timed as
its own jitted fwd+bwd at the published training shape (batch 20,
bf16), with analytic FLOPs from flops.train_segment_flops:

* scene_cnn    — strided conv pyramid (bwd wrt params only, but the
                 first conv's weight grads need dgrad through the
                 second -> ~2.5x fwd for a two-layer pyramid)
* enc_class    — class ConvLSTM encoder scan (bwd wrt params+inputs,
                 its input is the scene conv output -> 3x fwd)
* enc_reg      — offset encoder scan (bwd wrt cell params only, but
                 BPTT still computes dL/dh_{t-1} through the gate
                 conv each step, and the recurrent h channels are
                 256 of the 258 gate-conv input channels -> the
                 executed dgrad is effectively full -> 3x fwd)
* dec_class    — GNN-attended class decoder scan (3x fwd)
* dec_reg      — offset decoder scan (3x fwd)
* loss_softgrid— soft-grid label conv + CE/Huber (elementwise-dominated;
                 matmul FLOPs are the label conv only)
* optimizer    — adadelta update (elementwise; 0 matmul FLOPs)

Also times the WHOLE fused train step in the same process and reports
coverage = sum(segment times) / step time: segments are timed in
isolation, so coverage > 1 means XLA overlaps/fuses across segment
boundaries in the full graph (that headroom is the fusion win, not a
measurement error).

Prints ONE JSON line with per-segment {ms, tflops, pct_roofline}.
"""

import json
import os
import sys
import time

import numpy as np

BATCH = int(os.environ.get("BENCH_SEG_BATCH", "20"))
ITERS = int(os.environ.get("BENCH_SEG_ITERS", "10"))
WINDOWS = int(os.environ.get("BENCH_SEG_WINDOWS", "2"))
# bfloat16 is the training dtype on TPU; CPU smoke runs need float32
# (XLA-CPU emulates bf16 convs orders of magnitude slower)
DTYPE = os.environ.get("BENCH_SEG_DTYPE", "bfloat16")


def main():
    import jax
    import jax.numpy as jnp

    from bench import _measure_matmul_roofline, _wait_for_backend
    from bench_train import _synthetic_batch
    from multiverse_tpu.config import MultiverseConfig
    from multiverse_tpu.flops import train_segment_flops, train_step_flops
    from multiverse_tpu.models import (
        compute_loss,
        init_params,
        model_forward,
    )
    from multiverse_tpu.models.multiverse import (
        ForwardOutputs,
        greedy_decode,
        scene_encode,
    )
    from multiverse_tpu.ops.convlstm import ConvLSTMState, convlstm_scan
    from multiverse_tpu.train.trainer import (
        init_train_state,
        make_train_step,
    )

    cfg = MultiverseConfig(
        scene_grid_strides=(2, 4),
        use_grids=(True, False),
        use_gnn=True,
        use_scene_enc=True,
        batch_size=BATCH,
        compute_dtype=DTYPE,
    ).validate()
    cdt = jnp.bfloat16 if DTYPE == "bfloat16" else jnp.float32
    i = cfg.active_scales[0]
    h, w = cfg.scene_grids[i]
    N, T_obs, T_pred = BATCH, cfg.obs_len, cfg.pred_len
    D, E, CS = cfg.dec_hidden_size, cfg.emb_size, cfg.scene_conv_dim

    dev = _wait_for_backend(
        jax, float(os.environ.get("BENCH_BACKEND_WAIT_S", "900")))
    print(f"bench_segments: device={dev.platform}:{dev.device_kind} "
          f"batch={BATCH}", file=sys.stderr)

    params = jax.device_put(init_params(jax.random.PRNGKey(0), cfg))
    batch = jax.device_put(_synthetic_batch(
        cfg, BATCH, np.random.RandomState(0)))
    sp = params["scales"][str(i)]
    rs = np.random.RandomState(1)

    def dput(x):
        return jax.device_put(jnp.asarray(x))

    # realistic intermediate tensors (bf16, training layout)
    scene_convs_i = dput(rs.randn(N, T_obs, h, w, CS).astype(np.float32)
                         .astype(cdt))
    enc_reg_in = batch.obs_grid_target_all[0]
    zero_state = ConvLSTMState(
        c=dput(np.zeros((N, h, w, D), np.float32)).astype(cdt),
        h=dput(np.zeros((N, h, w, D), np.float32)).astype(cdt))
    first_onehot = dput((np.arange(N * h * w).reshape(N, h, w, 1) % 97
                         == 0).astype(np.float32))
    first_reg = dput(rs.randn(N, h, w, 2).astype(np.float32))
    scene_mean = dput(rs.randn(N, h, w, CS).astype(np.float32)
                      .astype(cdt))
    class_gt = dput(rs.randn(N, T_pred, h, w, 1).astype(np.float32))
    reg_gt = batch.pred_grid_target_all[0]
    fake_out = ForwardOutputs(
        class_logits={i: dput(rs.randn(N, T_pred, h, w, 1)
                              .astype(np.float32))},
        reg_out={i: dput(rs.randn(N, T_pred, h, w, 2)
                         .astype(np.float32))},
        dec_states={}, scene_convs=[])

    def _sum(tree):
        return sum(jnp.sum(x.astype(jnp.float32))
                   for x in jax.tree_util.tree_leaves(tree))

    # --- segment functions: value_and_grad wrt what the real backward
    # chain differentiates at that stage
    def f_scene(p):
        return _sum(scene_encode(p, batch.scene_feat, batch.obs_scene,
                                 cfg, compute_dtype=cdt)[i])

    def f_enc_class(cell_p, xs):
        outs, last = convlstm_scan(cell_p, xs, compute_dtype=cdt)
        return _sum((outs, last))

    def f_enc_reg(cell_p):
        outs, last = convlstm_scan(cell_p, enc_reg_in, compute_dtype=cdt)
        return _sum((outs, last))

    def f_dec_class(scale_p, init_state, smean):
        logits, states = greedy_decode(
            scale_p, cfg, first_onehot, init_state, T_pred,
            "dec_class_emb", "dec_class", "h2g_class",
            use_gnn=True, scene_mean=smean, feedback="onehot",
            pred_gt=class_gt, compute_dtype=cdt)
        return _sum((logits, states))

    def f_dec_reg(scale_p, init_state):
        reg, states = greedy_decode(
            scale_p, cfg, first_reg, init_state, T_pred,
            "dec_reg_emb", "dec_reg", "h2g_reg",
            use_gnn=False, feedback="raw", pred_gt=reg_gt,
            compute_dtype=cdt)
        return _sum((reg, states))

    def f_loss(out):
        total, _ = compute_loss(params, batch, out, cfg)
        return total

    state, tx = init_train_state(params, cfg, BATCH * 1000)
    grads_like = jax.tree_util.tree_map(jnp.ones_like, params)

    def f_opt(g, opt_state, p):
        updates, new_opt = tx.update(g, opt_state, p)
        import optax
        return _sum(optax.apply_updates(p, updates)), new_opt

    segs = {
        "scene_cnn": (jax.jit(jax.value_and_grad(f_scene)),
                      (params,), 2.5),
        "enc_class": (jax.jit(jax.value_and_grad(f_enc_class, (0, 1))),
                      (sp["enc_class"], scene_convs_i), 3.0),
        "enc_reg": (jax.jit(jax.value_and_grad(f_enc_reg)),
                    (sp["enc_reg"],), 3.0),
        "dec_class": (jax.jit(jax.value_and_grad(f_dec_class, (0, 1, 2))),
                      (sp, zero_state, scene_mean), 3.0),
        "dec_reg": (jax.jit(jax.value_and_grad(f_dec_reg, (0, 1))),
                    (sp, zero_state), 3.0),
        "loss_softgrid": (jax.jit(jax.value_and_grad(f_loss)),
                          (fake_out,), 2.0),
        "optimizer": (jax.jit(f_opt),
                      (grads_like, state.opt_state, params), 0.0),
    }
    fwd_flops = train_segment_flops(cfg, BATCH)

    def sync(out):
        leaf = jax.tree_util.tree_leaves(out)[0]
        return float(np.asarray(jnp.sum(leaf.astype(jnp.float32))
                                if leaf.ndim else leaf))

    def time_one(fn, args):
        t0 = time.perf_counter()
        sync(fn(*args))
        compile_s = time.perf_counter() - t0
        sync(fn(*args))                       # warm
        best = float("inf")
        for _ in range(WINDOWS):
            t0 = time.perf_counter()
            for _ in range(ITERS):
                out = fn(*args)
            sync(out)
            best = min(best, (time.perf_counter() - t0) / ITERS)
        return best, compile_s

    roofline = (_measure_matmul_roofline(jax)
                if dev.platform == "tpu" else float("nan"))

    table = {}
    total_ms = 0.0
    for name, (fn, args, mult) in segs.items():
        sec, compile_s = time_one(fn, args)
        flops = fwd_flops[name] * mult
        tflops = flops / sec / 1e12
        table[name] = {
            "ms": round(sec * 1e3, 2),
            "tflops": round(tflops, 1),
            "bwd_mult": mult,
        }
        if roofline == roofline:          # omit off-TPU (nan != nan)
            table[name]["pct_roofline"] = round(
                100.0 * tflops / roofline, 1)
        total_ms += sec * 1e3
        pct = table[name].get("pct_roofline", float("nan"))
        print(f"bench_segments: {name:>14} {sec * 1e3:7.2f} ms "
              f"{tflops:6.1f} TF/s ({pct:5.1f}% "
              f"of roofline; compile {compile_s:.0f}s)", file=sys.stderr)

    # the whole fused step, same process/shapes (cross-check)
    step = make_train_step(cfg, tx)
    st = state
    t0 = time.perf_counter()
    st, parts = step(st, batch)
    sync(parts["total"])
    print(f"bench_segments: full step compile "
          f"{time.perf_counter() - t0:.0f}s", file=sys.stderr)
    st, parts = step(st, batch)
    sync(parts["total"])
    best = float("inf")
    for _ in range(WINDOWS):
        t0 = time.perf_counter()
        for _ in range(ITERS):
            st, parts = step(st, batch)
        sync(parts["total"])
        best = min(best, (time.perf_counter() - t0) / ITERS)
    step_ms = best * 1e3
    step_tflops = train_step_flops(cfg, BATCH) / best / 1e12

    record = {
        "metric": "train_step_segment_rooflines",
        "unit": "ms|TFLOP/s",
        "batch": BATCH,
        "dtype": DTYPE,
        "segments": table,
        "segments_total_ms": round(total_ms, 2),
        "full_step_ms": round(step_ms, 2),
        "full_step_tflops": round(step_tflops, 1),
        "coverage": round(total_ms / step_ms, 3),
    }
    if roofline == roofline:              # off-TPU: no roofline fields
        record["roofline_tflops"] = round(roofline, 1)
        record["full_step_pct_roofline"] = round(
            100.0 * step_tflops / roofline, 1)
    print(json.dumps(record))


if __name__ == "__main__":
    main()
