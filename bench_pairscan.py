"""Paired-scan fusion probe (VERDICT r4 #2 — the last measured
train-MFU lever).

SEGMENTS_r04.json shows the four recurrent stages at 38-62% of the
matmul roofline with the gap attributed to sequential `lax.scan`
exposure: each scan step is ONE gate conv whose matmul is too narrow to
fill the MXU while its backward cannot overlap across timesteps.  The
class and regression encoders are independent given their inputs
(reference: code/pred_models.py:189-234 — two separate dynamic_rnn
calls over the same T_obs), and so are the two decoders given their
feedback streams, so each pair can run as ONE scan with twice the work
per sequential step.  Three forms, measured as jitted fwd+bwd at the
published training shape (batch 20, bf16, 18x32, D=256):

* sep        — today's two scans (the baseline the model runs)
* merged2    — one scan, both cells stepped inside one body (bitwise
               the same math; halves the number of sequential scan
               bodies, lets XLA overlap the two gate convs per step)
* blockdiag  — one scan, ONE gate conv per step over the concatenated
               [x_c, h_c, x_r, h_r] input with a block-diagonal
               [3,3,C_cat,2*4D] kernel (2x the matmul FLOPs — half of
               them against zero blocks — but a 2048-wide MXU output
               per sequential step; wins iff the conv is not
               contraction-bound at these spatial dims, which the
               round-4 hoisting probe's 640-vs-784 us data suggests)

Decoder variants replicate the real decode-step structure (GNN residual
on the class cell, 3x3 input embeddings, readouts, argmax/raw
feedback).  Prints ONE JSON line; A/B lands in SEGMENTS_r05.json.
"""

import json
import os
import sys
import time

import numpy as np

BATCH = int(os.environ.get("BENCH_PAIR_BATCH", "20"))
ITERS = int(os.environ.get("BENCH_PAIR_ITERS", "10"))
WINDOWS = int(os.environ.get("BENCH_PAIR_WINDOWS", "2"))
DTYPE = os.environ.get("BENCH_PAIR_DTYPE", "bfloat16")


def main():
    import jax
    import jax.numpy as jnp

    from bench import _measure_matmul_roofline, _wait_for_backend
    from multiverse_tpu.config import MultiverseConfig
    from multiverse_tpu.flops import train_segment_flops
    from multiverse_tpu.models.multiverse import greedy_decode
    from multiverse_tpu.models import init_params
    from multiverse_tpu.ops.convlstm import (
        ConvLSTMState,
        convlstm_scan,
        convlstm_step,
    )
    from multiverse_tpu.ops.fused_scans import (
        paired_convlstm_scan,
        paired_decode_scan,
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
    D, CS = cfg.dec_hidden_size, cfg.scene_conv_dim

    dev = _wait_for_backend(
        jax, float(os.environ.get("BENCH_BACKEND_WAIT_S", "900")))
    print(f"bench_pairscan: device={dev.platform}:{dev.device_kind} "
          f"batch={BATCH}", file=sys.stderr)

    params = jax.device_put(init_params(jax.random.PRNGKey(0), cfg))
    sp = params["scales"][str(i)]
    rs = np.random.RandomState(1)

    def dput(x):
        return jax.device_put(jnp.asarray(x))

    xs_class = dput(rs.randn(N, T_obs, h, w, CS).astype(np.float32)
                    .astype(cdt))
    xs_reg = dput(rs.randn(N, T_obs, h, w, 2).astype(np.float32))
    zero_state = ConvLSTMState(
        c=dput(np.zeros((N, h, w, D), np.float32)).astype(cdt),
        h=dput(np.zeros((N, h, w, D), np.float32)).astype(cdt))
    first_onehot = dput((np.arange(N * h * w).reshape(N, h, w, 1) % 97
                         == 0).astype(np.float32))
    first_reg = dput(rs.randn(N, h, w, 2).astype(np.float32))
    scene_mean = dput(rs.randn(N, h, w, CS).astype(np.float32)
                      .astype(cdt))

    def _sum(tree):
        return sum(jnp.sum(x.astype(jnp.float32))
                   for x in jax.tree_util.tree_leaves(tree))

    # ------------------------------------------------ encoder variants
    def enc_sep(cell_c, cell_r, xc, xr):
        oc, lc = convlstm_scan(cell_c, xc, compute_dtype=cdt)
        orr, lr = convlstm_scan(cell_r, xr, compute_dtype=cdt)
        return _sum((oc, lc, orr, lr))

    def enc_merged(mode):
        def f(cell_c, cell_r, xc, xr):
            (oc, lc), (orr, lr) = paired_convlstm_scan(
                cell_c, cell_r, xc, xr, compute_dtype=cdt, mode=mode)
            return _sum((oc, lc, orr, lr))
        return f

    # ------------------------------------------------ decoder variants
    def dec_sep(scale_p, st_c, st_r, smean):
        logits, states = greedy_decode(
            scale_p, cfg, first_onehot, st_c, T_pred,
            "dec_class_emb", "dec_class", "h2g_class",
            use_gnn=True, scene_mean=smean, feedback="onehot",
            compute_dtype=cdt)
        reg, _ = greedy_decode(
            scale_p, cfg, first_reg, st_r, T_pred,
            "dec_reg_emb", "dec_reg", "h2g_reg",
            use_gnn=False, feedback="raw", compute_dtype=cdt)
        return _sum((logits, states, reg))

    def dec_merged(mode):
        def f(scale_p, st_c, st_r, smean):
            logits, states, reg = paired_decode_scan(
                scale_p, cfg, first_onehot, st_c, first_reg, st_r,
                T_pred, smean, compute_dtype=cdt, mode=mode)
            return _sum((logits, states, reg))
        return f

    variants = {
        "enc_sep": (jax.jit(jax.value_and_grad(enc_sep, (0, 1, 2, 3))),
                    (sp["enc_class"], sp["enc_reg"], xs_class, xs_reg)),
        "enc_merged2": (
            jax.jit(jax.value_and_grad(enc_merged("two_convs"),
                                       (0, 1, 2, 3))),
            (sp["enc_class"], sp["enc_reg"], xs_class, xs_reg)),
        "enc_blockdiag": (
            jax.jit(jax.value_and_grad(enc_merged("blockdiag"),
                                       (0, 1, 2, 3))),
            (sp["enc_class"], sp["enc_reg"], xs_class, xs_reg)),
        "dec_sep": (jax.jit(jax.value_and_grad(dec_sep, (0, 1, 2, 3))),
                    (sp, zero_state, zero_state, scene_mean)),
        "dec_merged2": (
            jax.jit(jax.value_and_grad(dec_merged("two_convs"),
                                       (0, 1, 2, 3))),
            (sp, zero_state, zero_state, scene_mean)),
        "dec_blockdiag": (
            jax.jit(jax.value_and_grad(dec_merged("blockdiag"),
                                       (0, 1, 2, 3))),
            (sp, zero_state, zero_state, scene_mean)),
    }

    # true algorithmic FLOPs (the separate-scan accounting) so achieved
    # TFLOP/s is comparable across variants; blockdiag's padding FLOPs
    # are waste, not work
    fwd = train_segment_flops(cfg, BATCH)
    flops = {
        "enc": (fwd["enc_class"] + fwd["enc_reg"]) * 3.0,
        "dec": (fwd["dec_class"] + fwd["dec_reg"]) * 3.0,
    }

    def sync(out):
        leaf = jax.tree_util.tree_leaves(out)[0]
        return float(np.asarray(jnp.sum(leaf.astype(jnp.float32))
                                if leaf.ndim else leaf))

    def time_one(fn, args):
        t0 = time.perf_counter()
        val = sync(fn(*args))
        compile_s = time.perf_counter() - t0
        sync(fn(*args))
        best = float("inf")
        for _ in range(WINDOWS):
            t0 = time.perf_counter()
            for _ in range(ITERS):
                out = fn(*args)
            sync(out)
            best = min(best, (time.perf_counter() - t0) / ITERS)
        return best, compile_s, val

    roofline = (_measure_matmul_roofline(jax)
                if dev.platform == "tpu" else float("nan"))

    table, vals = {}, {}
    for name, (fn, args) in variants.items():
        sec, compile_s, val = time_one(fn, args)
        group = name.split("_")[0]
        tflops = flops[group] / sec / 1e12
        table[name] = {"ms": round(sec * 1e3, 2),
                       "tflops": round(tflops, 1)}
        if roofline == roofline:
            table[name]["pct_roofline"] = round(
                100.0 * tflops / roofline, 1)
        vals[name] = val
        print(f"bench_pairscan: {name:>14} {sec * 1e3:7.2f} ms "
              f"{tflops:6.1f} TF/s (compile {compile_s:.0f}s)",
              file=sys.stderr)

    # numerical cross-checks: merged2 must match sep exactly-ish (same
    # math, same dtype); blockdiag to bf16 tolerance (different
    # contraction padding)
    checks = {
        "enc_merged2_vs_sep": abs(vals["enc_merged2"] - vals["enc_sep"]),
        "enc_blockdiag_vs_sep": abs(vals["enc_blockdiag"]
                                    - vals["enc_sep"]),
        "dec_merged2_vs_sep": abs(vals["dec_merged2"] - vals["dec_sep"]),
        "dec_blockdiag_vs_sep": abs(vals["dec_blockdiag"]
                                    - vals["dec_sep"]),
    }
    record = {
        "metric": "paired_scan_fusion_probe",
        "unit": "ms|TFLOP/s",
        "batch": BATCH,
        "dtype": DTYPE,
        "variants": table,
        "speedup": {
            "enc_merged2": round(table["enc_sep"]["ms"]
                                 / table["enc_merged2"]["ms"], 3),
            "enc_blockdiag": round(table["enc_sep"]["ms"]
                                   / table["enc_blockdiag"]["ms"], 3),
            "dec_merged2": round(table["dec_sep"]["ms"]
                                 / table["dec_merged2"]["ms"], 3),
            "dec_blockdiag": round(table["dec_sep"]["ms"]
                                   / table["dec_blockdiag"]["ms"], 3),
        },
        "value_abs_delta": {k: float(v) for k, v in checks.items()},
    }
    if roofline == roofline:
        record["roofline_tflops"] = round(roofline, 1)
    print(json.dumps(record))


if __name__ == "__main__":
    main()
