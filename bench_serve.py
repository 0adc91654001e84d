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

Measurement design (this host has ONE CPU core shared by clients,
HTTP server, and engine — `len(os.sched_getaffinity(0)) == 1` — so
multi-process load generation cannot add client capacity; the honest
split is):

* default / --greedy: the full HTTP path, with keep-alive connections
  and the binary tensor transport (both cut per-request host CPU; JSON
  float serialization was the dominant cost).  `cpu_frac` ~ 1.0 in the
  output means the single host core is the binding constraint, and
  `value` is then the ceiling of the whole stack on this host, not of
  the engine.
* --direct [--greedy]: closed-loop clients submit to the ServingEngine
  in-process (no HTTP/JSON at all) — this measures the ENGINE's
  capacity: batcher + device decode + on-device reconstruction +
  resolver.  This is the number comparable to the raw batch-decode
  bench.

Prints ONE JSON line:
    {"metric": "serving_throughput[_greedy][_direct]",
     "value": <req/s>, "unit": "req/s", "clients": N, "errors": N,
     "mean_batch_occupancy": N, "mean_latency_ms": N,
     "p50_latency_ms": N, "p99_latency_ms": N, "max_batch": N,
     "cpu_frac": f}
"""

import json
import os
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


def run_aio_load(port, n_clients, reqs_per_client, obs_all, beam_k,
                 t_pred):
    """Closed-loop load from ONE asyncio event loop: n_clients
    coroutines, each holding a persistent connection and requesting the
    binary tensor frame.  No client threads at all — on a small host
    this removes the load generator's GIL/scheduler churn entirely."""
    import asyncio
    import json as _json

    from multiverse_tpu.serving.wire import parse_tensor_frame

    errors = []
    latencies = []

    async def client(k):
        body = _json.dumps({
            "obs_traj": obs_all[k].tolist(),
            "pred_len": t_pred}).encode()
        head = (f"POST /v1/predict HTTP/1.1\r\n"
                f"Host: b\r\nContent-Type: application/json\r\n"
                f"Accept: application/x-mvt-tensor\r\n"
                f"Content-Length: {len(body)}\r\n\r\n"
                ).encode() + body
        try:
            reader, writer = await asyncio.open_connection(
                "127.0.0.1", port)
        except OSError as exc:
            errors.extend([exc] * reqs_per_client)
            return
        try:
            for _ in range(reqs_per_client):
                r0 = time.perf_counter()
                writer.write(head)
                await writer.drain()
                status = await reader.readline()
                length = 0
                while True:
                    line = await reader.readline()
                    if line in (b"\r\n", b""):
                        break
                    if line.lower().startswith(b"content-length:"):
                        length = int(line.split(b":")[1])
                payload = await reader.readexactly(length)
                if b"200" not in status:
                    # error body is JSON, not a tensor frame; and only
                    # SUCCESSFUL responses count as latency samples or
                    # throughput (matching the threaded run_load)
                    errors.append(RuntimeError(status.decode()))
                    continue
                latencies.append(time.perf_counter() - r0)
                out = parse_tensor_frame(payload)
                assert out["trajs"].shape == (beam_k, t_pred, 2)
        except (OSError, asyncio.IncompleteReadError) as exc:
            errors.append(exc)
        finally:
            writer.close()

    async def drive():
        await asyncio.gather(*[client(k) for k in range(n_clients)])

    t0, c0 = time.perf_counter(), time.process_time()
    asyncio.run(drive())
    return (time.perf_counter() - t0, time.process_time() - c0,
            errors, latencies)


def run_load(make_predict, n_clients, reqs_per_client, obs_all):
    """Closed-loop load: n_clients threads, each `reqs_per_client`
    sequential predicts.  Returns (wall_s, cpu_s, errors, latencies)."""
    errors = []
    latencies = []
    start = threading.Barrier(n_clients + 1)

    def worker(k):
        predict = make_predict(k)
        start.wait()
        for _ in range(reqs_per_client):
            r0 = time.perf_counter()
            try:
                predict(obs_all[k])
                latencies.append(time.perf_counter() - r0)
            except Exception as exc:  # count, keep hammering
                errors.append(exc)

    threads = [threading.Thread(target=worker, args=(k,), daemon=True)
               for k in range(n_clients)]
    for t in threads:
        t.start()
    start.wait()
    t0, c0 = time.perf_counter(), time.process_time()
    for t in threads:
        t.join()
    return (time.perf_counter() - t0, time.process_time() - c0,
            errors, latencies)


def main(greedy: bool = False, direct: bool = False, aio: bool = False):
    if direct and aio:
        # one run measures one transport: --direct bypasses HTTP
        # entirely, so "--direct --aio" would run the direct path while
        # the metric name claimed the asyncio front end was measured
        sys.exit("bench_serve: --direct and --aio are mutually exclusive")
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
        compute_dtype="bfloat16",
        # the mvt-serve default tier (int8 gate + attention matmuls;
        # metric-neutral on end metrics at 8 seeds AND the fastest
        # decode tier on chip, STATUS.md §int8a decision)
        decode_quant="int8a").validate()
    # greedy decodes ~13x faster per trajectory, so its saturation
    # batch is larger
    max_batch = MAX_BATCH * 4 if greedy else MAX_BATCH
    # probe the backend in a SUBPROCESS before any in-process jax work:
    # init_params / the engine's device_put initialize the backend, and
    # on a flapping tunneled chip that init can hang unrecoverably — a
    # probe that runs after it is dead weight
    from bench import _wait_for_backend
    dev = _wait_for_backend(
        jax, float(os.environ.get("BENCH_BACKEND_WAIT_S", "900")))
    params = init_params(jax.random.PRNGKey(0), cfg)
    eng = ServingEngine(params, cfg, max_batch=max_batch,
                        max_delay_ms=MAX_DELAY_MS, T_pred=T_PRED,
                        inflight_slots=int(os.environ.get(
                            "BENCH_SERVE_SLOTS", "2")))
    print(f"bench_serve: device={dev.platform}:{dev.device_kind} "
          f"host_cores={len(os.sched_getaffinity(0))} "
          f"warmup {eng.warmup():.1f}s", file=sys.stderr)

    n_clients = int(os.environ.get(
        "BENCH_SERVE_CLIENTS", N_CLIENTS * 2 if greedy else N_CLIENTS))
    rng = np.random.RandomState(0)
    obs_all = [np.stack([rng.uniform(0, cfg.video_w, cfg.obs_len),
                         rng.uniform(0, cfg.video_h, cfg.obs_len)], 1)
               for _ in range(n_clients)]

    if direct:
        def make_predict(k):
            def predict(obs):
                out = eng.predict(obs, pred_len=T_PRED, timeout=300)
                assert out.trajs.shape == (cfg.beam_size, T_PRED, 2)
            return predict

        wall, cpu, errors, lats = run_load(
            make_predict, n_clients, REQS_PER_CLIENT, obs_all)
        stats = eng.stats.snapshot()
        eng.close()
    elif aio:
        from multiverse_tpu.serving.aserver import AsyncPredictionServer

        server = AsyncPredictionServer(eng, port=0)
        server.start_background()
        wall, cpu, errors, lats = run_aio_load(
            server.port, n_clients, REQS_PER_CLIENT, obs_all,
            cfg.beam_size, T_PRED)
        stats = eng.stats.snapshot()
        server.close(close_engine=True)
    else:
        server = PredictionServer(eng, port=0)
        server.start_background()

        def make_predict(k):
            c = PredictionClient(port=server.port, timeout=300,
                                 binary=True)

            def predict(obs):
                out = c.predict(obs, pred_len=T_PRED)
                assert out["trajs"].shape == (cfg.beam_size, T_PRED, 2)
            return predict

        wall, cpu, errors, lats = run_load(
            make_predict, n_clients, REQS_PER_CLIENT, obs_all)
        stats = eng.stats.snapshot()
        server.httpd.shutdown()
        server.httpd.server_close()
        eng.close()

    # throughput counts COMPLETED successful responses (one latency
    # sample each, in both load generators) — a client that aborts
    # mid-run must shrink the numerator, not ride n_clients*REQS
    completed = len(lats)
    metric = "serving_throughput"
    if greedy:
        metric += "_greedy"
    if direct:
        metric += "_direct"
    if aio:
        metric += "_aio"
    print(json.dumps({
        "metric": metric,
        "value": round(completed / wall, 2),
        "unit": "req/s",
        "clients": n_clients,
        "completed": completed,
        "errors": len(errors),
        "mean_batch_occupancy": stats["mean_batch_occupancy"],
        "mean_latency_ms": stats["mean_latency_ms"],
        # client-observed latency (queueing + decode + transport) —
        # closed-loop, so the tail reflects batching waves, not
        # open-loop overload
        "p50_latency_ms": round(
            float(np.percentile(lats, 50)) * 1e3, 1) if lats else None,
        "p99_latency_ms": round(
            float(np.percentile(lats, 99)) * 1e3, 1) if lats else None,
        "max_batch": max_batch,
        # fraction of one host core consumed by the WHOLE stack
        # (clients + server + engine share this process); ~1.0 on this
        # 1-core host means the core, not the device, binds
        "cpu_frac": round(cpu / wall, 3),
    }))


if __name__ == "__main__":
    main(greedy="--greedy" in sys.argv, direct="--direct" in sys.argv,
         aio="--aio" in sys.argv)
