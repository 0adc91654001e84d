"""Training-throughput benchmark at the published configurations.

Measures full-size training steps/second in two workloads:

* --mode base (default): the base Multiverse trainer (scene CNN + 2
  ConvLSTM encoders + 2 graph-attended decoders + losses + adadelta
  update) at the reference's published batch size 20 (reference:
  TRAINING.md — batch 20, 80 epochs, ~48 h on a TITAN X ⇒ ~0.36
  steps/s there), reporting both the naive fetch-every-step loop and
  mvt-train's buffered loss fetch (--loss_fetch_period).
* --mode simaug: the SimAug multiview flagship — multiview_exp 3,
  batch 12, M=3 extra views, use_gnn, keep_prob 1.0, exactly the
  published recipe (reference: SimAug/TRAINING.md "36 hours on a GTX
  1080 TI" for 30 epochs).  Each step runs the tiled N*M attack tower
  (fwd + input-grad bwd) plus the full train fwd+bwd.
* --mode simaug_adv: the PGD adversarial-training variant
  (--adv_train, 30 attack iterations — reference:
  SimAug/code/train.py adv defaults).

Prints ONE JSON line, e.g.:
    {"metric": "train_step_throughput", "value": <steps/s buffered>,
     "unit": "steps/s", "fetch_every_step": N, "examples_per_sec": N,
     "batch": 20, "dtype": "bfloat16"}
"""

import argparse
import json
import os
import sys
import time

import numpy as np

BATCH = 20
SIMAUG_BATCH = 12       # reference: SimAug/TRAINING.md published recipe
WARMUP = 3
ITERS = 40
FLUSH = 20


def _synthetic_batch(cfg, batch_size, rng):
    from multiverse_tpu.models import Batch

    i = cfg.active_scales[0]
    h, w = cfg.scene_grids[i]
    T_obs, T_pred = cfg.obs_len, cfg.pred_len
    F = max(2, batch_size)
    scene = np.zeros((F, cfg.scene_h, cfg.scene_w, cfg.scene_class),
                     np.uint8)
    scene[..., 0] = 1
    return Batch(
        obs_grid_class=rng.randint(
            0, h * w, (batch_size, cfg.num_scales, T_obs)).astype(np.int32),
        obs_grid_target_all=(
            rng.randn(batch_size, T_obs, h, w, 2).astype(np.float32),),
        obs_scene=rng.randint(0, F, (batch_size, T_obs)).astype(np.int32),
        scene_feat=scene,
        pred_grid_class=rng.randint(
            0, h * w, (batch_size, cfg.num_scales, T_pred)
        ).astype(np.int32),
        pred_grid_target_all=(
            rng.randn(batch_size, T_pred, h, w, 2).astype(np.float32),),
    )


def _simaug_cfg(adv: bool):
    """The published SimAug flagship config (reference:
    SimAug/TRAINING.md — obs 8 / pred 12 / emb 32 / hidden 256 /
    scene 36x64 conv_dim 64 / strides 2,4 / use_grids 1,0 / use_gnn /
    batch 12 / keep_prob 1.0 / multiview_exp 3), or the --adv_train
    PGD-30 variant (reference: SimAug/code/train.py adv defaults)."""
    from multiverse_tpu.models.simaug import SimAugConfig

    return SimAugConfig(
        scene_grid_strides=(2, 4),
        use_grids=(True, False),
        use_gnn=True,
        use_scene_enc=True,
        emb_size=32,
        batch_size=SIMAUG_BATCH,
        keep_prob=1.0,
        compute_dtype="bfloat16",
        adv_train=adv,
        adv_epsilon=0.1,
        adv_num_iter=30,
        multiview_train=not adv,
        multiview_exp=3,
        multiview_max_num=3,
        mixup_alpha=0.2,
    ).validate()


def _synthetic_mv_batch(cfg, batch_size, rng):
    """Full-size synthetic MultiviewBatch (M extra camera views)."""
    from multiverse_tpu.models.simaug import MultiviewBatch

    i = cfg.active_scales[0]
    h, w = cfg.scene_grids[i]
    m = cfg.multiview_max_num
    T_obs, T_pred = cfg.obs_len, cfg.pred_len
    F = max(2, batch_size)
    scene = np.zeros((F, cfg.scene_h, cfg.scene_w, cfg.scene_class),
                     np.float32)
    scene[..., 0] = 1
    return MultiviewBatch(
        obs_grid_class=rng.randint(
            0, h * w, (batch_size, cfg.num_scales, T_obs)
        ).astype(np.int32),
        obs_grid_target=rng.randn(
            batch_size, T_obs, h, w, 2).astype(np.float32),
        obs_scene=rng.randint(0, F, (batch_size, T_obs)).astype(np.int32),
        scene_feat=scene,
        pred_grid_class=rng.randint(
            0, h * w, (batch_size, cfg.num_scales, T_pred)
        ).astype(np.int32),
        pred_grid_target=rng.randn(
            batch_size, T_pred, h, w, 2).astype(np.float32),
        obs_grid_class_extra=rng.randint(
            0, h * w, (batch_size, m, T_obs)).astype(np.int32),
        pred_grid_class_extra=rng.randint(
            0, h * w, (batch_size, m, T_pred)).astype(np.int32),
        obs_scene_extra=rng.randint(
            0, F, (batch_size, m, T_obs)).astype(np.int32),
    )


def _run_simaug(jax, dev, adv: bool, iters: int):
    """SimAug training throughput: buffered-fetch steps/s + achieved
    TFLOP/s vs the measured roofline + a vs-reference wall-clock note."""
    from multiverse_tpu.flops import simaug_step_flops
    from multiverse_tpu.models import init_params
    from multiverse_tpu.models.simaug import make_simaug_train_step
    from multiverse_tpu.train.trainer import (
        build_optimizer,
        init_train_state,
    )

    cfg = _simaug_cfg(adv)
    mode = "simaug_adv" if adv else "simaug"
    print(f"bench_train: mode={mode} batch={cfg.batch_size} "
          f"views={cfg.multiview_max_num} "
          f"pgd_iters={cfg.adv_num_iter if adv else 0}", file=sys.stderr)

    params = init_params(jax.random.PRNGKey(0), cfg)
    state, tx = init_train_state(params, cfg,
                                 train_num_examples=cfg.batch_size * 1000)
    step = make_simaug_train_step(cfg, tx)
    batch = jax.device_put(_synthetic_mv_batch(
        cfg, cfg.batch_size, np.random.RandomState(0)))
    rng = jax.random.PRNGKey(1)

    def fetch(loss):
        return float(np.asarray(loss))

    t0 = time.perf_counter()
    rng, k = jax.random.split(rng)
    state, parts = step(state, batch, k)
    fetch(parts["total"])
    print(f"bench_train: compile+first step "
          f"{time.perf_counter() - t0:.1f}s", file=sys.stderr)
    for _ in range(WARMUP - 1):
        rng, k = jax.random.split(rng)
        state, parts = step(state, batch, k)
    fetch(parts["total"])

    t0 = time.perf_counter()
    pending = []
    for _ in range(iters):
        rng, k = jax.random.split(rng)
        state, parts = step(state, batch, k)
        pending.append(parts["total"])
        if len(pending) >= FLUSH:
            [fetch(v) for v in jax.device_get(pending)]
            pending.clear()
    if pending:
        [fetch(v) for v in jax.device_get(pending)]
    buffered = iters / (time.perf_counter() - t0)

    tflops = simaug_step_flops(cfg, cfg.batch_size) * buffered / 1e12
    record = {
        "metric": f"{mode}_train_step_throughput",
        "value": round(buffered, 3),
        "unit": "steps/s",
        "examples_per_sec": round(buffered * cfg.batch_size, 1),
        "batch": cfg.batch_size,
        "dtype": "bfloat16",
        "tflops": round(tflops, 1),
        # the reference's only published figure is wall-clock: 36 h
        # for 30 epochs at batch 12 on a GTX 1080 TI
        # (SimAug/TRAINING.md) — with N training examples that is
        # 30*N/12 steps in 129600 s, i.e. steps/s_ref = N / 51840.
        # The anchor dataset isn't downloadable here, so the note
        # keeps the formula instead of guessing N.
        "reference_note": ("36h/30ep@batch12 on 1080TI => "
                           "steps/s_ref = N_train_examples / 51840"),
    }
    if dev.platform == "tpu":
        from bench import _measure_matmul_roofline

        roofline = _measure_matmul_roofline(jax)
        record["roofline_tflops"] = round(roofline, 1)
        record["mfu_vs_roofline"] = round(tflops / roofline, 3)
    print(json.dumps(record))


def main():
    import jax

    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", default="base",
                    choices=("base", "simaug", "simaug_adv"))
    ap.add_argument("--iters", type=int, default=None,
                    help="timing iterations (default: 40 base, "
                         "20 simaug, 8 simaug_adv)")
    ap.add_argument("--fuse_scan_pairs", default=True,
                    action=argparse.BooleanOptionalAction,
                    help="base mode: run the encoder/decoder pairs as "
                         "merged scans (cfg.fuse_scan_pairs; default ON "
                         "to match the config/CLI default since round "
                         "5) — --no-fuse_scan_pairs A/Bs the unfused "
                         "path")
    args = ap.parse_args()

    from bench import _wait_for_backend
    dev = _wait_for_backend(
        jax, float(os.environ.get("BENCH_BACKEND_WAIT_S", "900")))

    if args.mode != "base":
        _run_simaug(jax, dev, adv=args.mode == "simaug_adv",
                    iters=args.iters or (8 if args.mode == "simaug_adv"
                                         else 20))
        return

    from multiverse_tpu.config import MultiverseConfig
    from multiverse_tpu.models import init_params
    from multiverse_tpu.parallel import (
        init_sharded_train_state,
        make_mesh,
        make_sharded_train_step,
        shard_batch,
    )
    from multiverse_tpu.train.trainer import build_optimizer

    cfg = MultiverseConfig(
        scene_grid_strides=(2, 4),
        use_grids=(True, False),
        use_gnn=True,
        use_scene_enc=True,
        batch_size=BATCH,
        compute_dtype="bfloat16",
        fuse_scan_pairs=args.fuse_scan_pairs,
    ).validate()

    print(f"bench_train: device={dev.platform}:{dev.device_kind} "
          f"batch={BATCH}", file=sys.stderr)

    mesh = make_mesh(n_devices=1)
    params = init_params(jax.random.PRNGKey(0), cfg)
    tx = build_optimizer(cfg, train_num_examples=BATCH * 1000)
    state = init_sharded_train_state(params, tx, mesh)
    batch = shard_batch(mesh, _synthetic_batch(
        cfg, BATCH, np.random.RandomState(0)))
    step = make_sharded_train_step(cfg, tx, mesh)

    def fetch(loss):
        # scalar host fetch = the only reliable sync on this backend
        return float(np.asarray(loss))

    with mesh:
        t0 = time.perf_counter()
        state, losses = step(state, batch)
        fetch(losses["total"])
        print(f"bench_train: compile+first step "
              f"{time.perf_counter() - t0:.1f}s", file=sys.stderr)
        for _ in range(WARMUP - 1):
            state, losses = step(state, batch)
        fetch(losses["total"])

        # mode 1: fetch the loss scalar every step
        t0 = time.perf_counter()
        for _ in range(ITERS):
            state, losses = step(state, batch)
            fetch(losses["total"])
        per_step_fetch = ITERS / (time.perf_counter() - t0)

        # mode 2: buffered — flush one batched fetch every FLUSH steps
        t0 = time.perf_counter()
        pending = []
        for i in range(ITERS):
            state, losses = step(state, batch)
            pending.append(losses["total"])
            if len(pending) >= FLUSH:
                [fetch(v) for v in jax.device_get(pending)]
                pending.clear()
        if pending:
            [fetch(v) for v in jax.device_get(pending)]
        buffered = ITERS / (time.perf_counter() - t0)

    # analytic train-step FLOPs (multiverse_tpu.flops: fwd + the
    # standard 3x-forward backward convention, matmul/conv MACs only —
    # achieved TFLOP/s is a floor) vs the measured matmul roofline
    from multiverse_tpu.flops import train_step_flops

    tflops = train_step_flops(cfg, BATCH) * buffered / 1e12
    record = {
        "metric": "train_step_throughput",
        "value": round(buffered, 2),
        "unit": "steps/s",
        "fetch_every_step": round(per_step_fetch, 2),
        "examples_per_sec": round(buffered * BATCH, 1),
        "batch": BATCH,
        "dtype": "bfloat16",
        "fuse_scan_pairs": args.fuse_scan_pairs,
        "tflops": round(tflops, 1),
    }
    if dev.platform == "tpu":
        from bench import _measure_matmul_roofline

        roofline = _measure_matmul_roofline(jax)
        record["roofline_tflops"] = round(roofline, 1)
        record["mfu_vs_roofline"] = round(tflops / roofline, 3)
    print(json.dumps(record))


if __name__ == "__main__":
    main()
