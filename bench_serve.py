"""Serving load test: sustained req/s of mvt-serve's engine + HTTP stack.

Drives the full online-prediction path on the real chip at the flagship
configuration — dynamic batcher + one static-shape compiled K=20 beam
decode graph + the stdlib HTTP front end — with many concurrent
closed-loop clients (each sends its next request when the previous
answer returns).  The engine's two-stage pipeline (batcher thread
dispatches async device work while the resolver blocks on results)
keeps the MXU busy during host-side batch assembly.

The reference has no serving subsystem at all; its closest path decodes
one trajectory per batch-1 sess.run (reference:
code/multifuture_inference.py:460-472).

Prints ONE JSON line:
    {"metric": "serving_throughput", "value": <req/s>, "unit": "req/s",
     "clients": N, "errors": N, "mean_batch_occupancy": N,
     "mean_latency_ms": N, "max_batch": N}
"""

import json
import sys
import threading
import time

import numpy as np

# the engine pipeline is 3 deep (collecting + dispatched + computing);
# closed-loop clients split across the stages, so saturating a
# max_batch=64 engine needs ~3*64 of them
N_CLIENTS = 256
REQS_PER_CLIENT = 6
MAX_BATCH = 64
MAX_DELAY_MS = 20.0
T_PRED = 25


def main(greedy: bool = False):
    import jax

    from multiverse_tpu.config import MultiverseConfig
    from multiverse_tpu.models import init_params
    from multiverse_tpu.serving.client import PredictionClient
    from multiverse_tpu.serving.engine import ServingEngine
    from multiverse_tpu.serving.server import PredictionServer

    cfg = MultiverseConfig(
        scene_grid_strides=(2, 4), use_grids=(True, False),
        use_beam_search=not greedy, beam_size=20, diverse_beam=not greedy,
        diverse_gamma=0.01, fix_num_timestep=1,
        compute_dtype="bfloat16").validate()
    # greedy decodes ~13x faster per trajectory, so its saturation
    # batch is larger
    max_batch = MAX_BATCH * 4 if greedy else MAX_BATCH
    params = init_params(jax.random.PRNGKey(0), cfg)
    eng = ServingEngine(params, cfg, max_batch=max_batch,
                        max_delay_ms=MAX_DELAY_MS, T_pred=T_PRED)
    dev = jax.devices()[0]
    print(f"bench_serve: device={dev.platform}:{dev.device_kind} "
          f"warmup {eng.warmup():.1f}s", file=sys.stderr)

    server = PredictionServer(eng, port=0)
    server.start_background()

    n_clients = N_CLIENTS * 2 if greedy else N_CLIENTS
    rng = np.random.RandomState(0)
    obs_all = [np.stack([rng.uniform(0, cfg.video_w, cfg.obs_len),
                         rng.uniform(0, cfg.video_h, cfg.obs_len)], 1)
               for _ in range(n_clients)]
    errors = []

    def worker(k):
        c = PredictionClient(port=server.port, timeout=120)
        for _ in range(REQS_PER_CLIENT):
            try:
                out = c.predict(obs_all[k], pred_len=T_PRED)
                assert out["trajs"].shape == (cfg.beam_size, T_PRED, 2)
            except Exception as exc:  # count, keep hammering
                errors.append(exc)

    threads = [threading.Thread(target=worker, args=(k,))
               for k in range(n_clients)]
    t0 = time.perf_counter()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    dt = time.perf_counter() - t0
    total = n_clients * REQS_PER_CLIENT
    stats = eng.stats.snapshot()
    server.httpd.shutdown()
    server.httpd.server_close()
    eng.close()

    print(json.dumps({
        "metric": ("serving_throughput_greedy" if greedy
                   else "serving_throughput"),
        "value": round(total / dt, 2),
        "unit": "req/s",
        "clients": n_clients,
        "errors": len(errors),
        "mean_batch_occupancy": stats["mean_batch_occupancy"],
        "mean_latency_ms": stats["mean_latency_ms"],
        "max_batch": max_batch,
    }))


if __name__ == "__main__":
    main(greedy="--greedy" in sys.argv)
