"""Greedy-inference throughput benchmark (the mvt-test path).

Measures single-future greedy decode — scene CNN + encoders + the
argmax-feedback class decoder and the regression decoder
(reference: code/pred_models.py:311-471 grid_decoder; test.py path) —
at the flagship configuration, batched on one chip, bf16.

Prints ONE JSON line:
    {"metric": "greedy_decode_throughput", "value": N,
     "unit": "traj/s", "batch": N, "dtype": "bfloat16"}
"""

import json
import os
import sys
import time

import numpy as np

BATCH = 256
WARMUP = 2
ITERS = 8


def main():
    import jax

    from bench_train import _synthetic_batch
    from multiverse_tpu.config import MultiverseConfig
    from multiverse_tpu.models import init_params, model_forward

    cfg = MultiverseConfig(
        scene_grid_strides=(2, 4),
        use_grids=(True, False),
        use_gnn=True,
        use_scene_enc=True,
        compute_dtype="bfloat16",
    ).validate()

    from bench import _wait_for_backend
    dev = _wait_for_backend(
        jax, float(os.environ.get("BENCH_BACKEND_WAIT_S", "900")))
    print(f"bench_greedy: device={dev.platform}:{dev.device_kind} "
          f"batch={BATCH}", file=sys.stderr)

    params = init_params(jax.random.PRNGKey(0), cfg)
    batch = _synthetic_batch(cfg, BATCH, np.random.RandomState(0))
    batch = jax.device_put(batch)
    params = jax.device_put(params)
    i = cfg.active_scales[0]

    @jax.jit
    def step(p, b):
        out = model_forward(p, b, cfg, is_train=False)
        return out.class_logits[i], out.reg_out[i]

    def sync(out):
        return float(np.asarray(out[0].ravel()[0]))

    t0 = time.perf_counter()
    sync(step(params, batch))
    print(f"bench_greedy: compile+first run "
          f"{time.perf_counter() - t0:.1f}s", file=sys.stderr)
    for _ in range(WARMUP - 1):
        sync(step(params, batch))

    t0 = time.perf_counter()
    for _ in range(ITERS):
        sync(step(params, batch))
    dt = time.perf_counter() - t0

    record = {
        "metric": "greedy_decode_throughput",
        "value": round(BATCH * ITERS / dt, 2),
        "unit": "traj/s",
        "batch": BATCH,
        "dtype": "bfloat16",
    }

    # the serving-default quant tier (int8a) on the same greedy path
    if dev.platform == "tpu":
        cfg8 = cfg.replace(decode_quant="int8a").validate()

        @jax.jit
        def step8(p, b):
            out = model_forward(p, b, cfg8, is_train=False)
            return out.class_logits[i], out.reg_out[i]

        sync(step8(params, batch))
        sync(step8(params, batch))
        t0 = time.perf_counter()
        for _ in range(ITERS):
            sync(step8(params, batch))
        record["int8a_value"] = round(
            BATCH * ITERS / (time.perf_counter() - t0), 2)

    print(json.dumps(record))


if __name__ == "__main__":
    main()
