"""Serving latency/throughput curve (VERDICT r4 #6).

The round-3/4 serving numbers publish a single operating point
(max_batch=64, p50 ~2.3 s) — a throughput ceiling, not a latency
story.  This bench sweeps the engine's max_batch dial across
{8, 16, 32, 64} for the beam tier and the greedy tier at the int8a
serving default, each point driven to closed-loop saturation
(engine-direct: no HTTP — the asyncio front end tracks the engine
within ~2%, BENCH_EXTRA_r04.json), and publishes req/s + client p50/p99
per point so a deployment can pick a latency budget.

Each max_batch compiles its own static-shape graph (one-time cost,
excluded via warmup).  Prints ONE JSON line; lands in
BENCH_SERVE_r05.json with the recommended operating points documented
in STATUS.md §Serving.
"""

import json
import os
import sys
import time

import numpy as np

from bench_serve import run_load

T_PRED = 25
MAX_DELAY_MS = 20.0
SWEEP = tuple(int(x) for x in os.environ.get(
    "BENCH_SWEEP_BATCHES", "8,16,32,64").split(","))
REQS_PER_CLIENT = int(os.environ.get("BENCH_SWEEP_REQS", "6"))


def main():
    import jax

    from bench import _wait_for_backend
    from multiverse_tpu.config import MultiverseConfig
    from multiverse_tpu.models import init_params
    from multiverse_tpu.serving.engine import ServingEngine

    dev = _wait_for_backend(
        jax, float(os.environ.get("BENCH_BACKEND_WAIT_S", "900")))
    print(f"bench_serve_sweep: device={dev.platform}:{dev.device_kind}",
          file=sys.stderr)

    points = []
    for greedy in (False, True):
        cfg = MultiverseConfig(
            scene_grid_strides=(2, 4), use_grids=(True, False),
            use_beam_search=not greedy, beam_size=20,
            diverse_beam=not greedy, diverse_gamma=0.01,
            fix_num_timestep=1, compute_dtype="bfloat16",
            decode_quant="int8a").validate()
        params = init_params(jax.random.PRNGKey(0), cfg)
        for max_batch in SWEEP:
            eng = ServingEngine(
                params, cfg, max_batch=max_batch,
                max_delay_ms=MAX_DELAY_MS, T_pred=T_PRED,
                inflight_slots=int(os.environ.get(
                    "BENCH_SERVE_SLOTS", "2")))
            w = eng.warmup()
            # closed-loop saturation: ~3 batches of clients fill the
            # 3-deep pipeline (collecting + dispatched + computing)
            n_clients = max_batch * 3
            rng = np.random.RandomState(0)
            obs_all = [np.stack(
                [rng.uniform(0, cfg.video_w, cfg.obs_len),
                 rng.uniform(0, cfg.video_h, cfg.obs_len)], 1)
                for _ in range(n_clients)]

            def make_predict(k):
                def predict(obs):
                    out = eng.predict(obs, pred_len=T_PRED, timeout=300)
                    assert out.trajs.shape == (cfg.beam_size, T_PRED, 2)
                return predict

            wall, cpu, errors, lats = run_load(
                make_predict, n_clients, REQS_PER_CLIENT, obs_all)
            stats = eng.stats.snapshot()
            eng.close()
            point = {
                "tier": "greedy" if greedy else "beam",
                "max_batch": max_batch,
                "clients": n_clients,
                "req_s": round(len(lats) / wall, 2),
                "p50_ms": round(
                    float(np.percentile(lats, 50)) * 1e3, 1)
                if lats else None,
                "p99_ms": round(
                    float(np.percentile(lats, 99)) * 1e3, 1)
                if lats else None,
                "errors": len(errors),
                "occupancy": stats["mean_batch_occupancy"],
                "cpu_frac": round(cpu / wall, 3),
            }
            points.append(point)
            print(f"bench_serve_sweep: {point} (warmup {w:.0f}s)",
                  file=sys.stderr)

    print(json.dumps({
        "metric": "serving_latency_throughput_curve",
        "unit": "req/s|ms",
        "decode_quant": "int8a",
        "max_delay_ms": MAX_DELAY_MS,
        "reqs_per_client": REQS_PER_CLIENT,
        "points": points,
    }))


if __name__ == "__main__":
    main()
