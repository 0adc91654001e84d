"""Training-throughput benchmark at the published configuration.

Measures full-size training steps/second (scene CNN + 2 ConvLSTM
encoders + 2 graph-attended decoders + losses + adadelta update) at the
reference's published batch size 20 (reference: TRAINING.md — batch 20,
80 epochs, ~48 h on a TITAN X ⇒ ~0.36 steps/s there), in two modes:

* fetch_every_step — the naive loop that pulls the loss scalar to host
  each step (stalls the TPU stream once per step);
* fetch_every_20   — mvt-train's buffered loss fetch
  (--loss_fetch_period): the stream stays full between flushes.

Prints ONE JSON line:
    {"metric": "train_step_throughput", "value": <steps/s buffered>,
     "unit": "steps/s", "fetch_every_step": N, "examples_per_sec": N,
     "batch": 20, "dtype": "bfloat16"}
"""

import json
import os
import sys
import time

import numpy as np

BATCH = 20
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


def main():
    import jax

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
    ).validate()

    from bench import _wait_for_backend
    dev = _wait_for_backend(
        jax, float(os.environ.get("BENCH_BACKEND_WAIT_S", "900")))
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
