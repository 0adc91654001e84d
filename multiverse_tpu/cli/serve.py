"""Online prediction server (mvt-serve).

A serving layer the reference never had (its inference is the offline
batch script, reference: code/multifuture_inference.py): loads a
checkpoint, compiles ONE static-shape decode graph, and serves HTTP
predictions through a dynamic batcher (see
multiverse_tpu/serving/engine.py for the design).

    mvt-serve outbasepath modelname --port 8500 --beam_size 20

max_batch defaults to the measured latency/throughput knee per tier
(8 for beam, 32 for --greedy; BENCH_SERVE_r05.json).
"""

from __future__ import annotations

import argparse
import signal
import sys
import threading

import jax

from multiverse_tpu.cli.common import add_model_args, config_from_args
from multiverse_tpu.models import init_params
from multiverse_tpu.serving.engine import ServingEngine
from multiverse_tpu.serving.server import PredictionServer
from multiverse_tpu.train.checkpoints import (
    CheckpointManager,
    process_out_dirs,
    restore_params_from,
)


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("outbasepath", type=str)
    parser.add_argument("modelname", type=str)
    parser.add_argument("--runId", type=int, default=0)
    parser.add_argument("--load_best", action="store_true")
    parser.add_argument("--load_from", type=str, default=None)
    parser.add_argument("--random_init", action="store_true",
                        help="serve untrained weights (smoke tests)")
    parser.add_argument("--host", type=str, default="127.0.0.1")
    parser.add_argument("--port", type=int, default=8500)
    # defaults follow the measured latency/throughput curve
    # (BENCH_SERVE_r05.json): the K=20 beam decode saturates the MXU
    # from batch 8 up (beams fold into the batch axis), so a larger
    # max_batch only adds median latency; greedy deployments should
    # pass --max_batch 32 (its measured knee)
    parser.add_argument("--max_batch", type=int, default=None,
                        help="dynamic-batch cap (default: 8 for beam "
                             "— throughput-flat, lowest p50; 32 for "
                             "--greedy — its measured knee; "
                             "BENCH_SERVE_r05.json)")
    parser.add_argument("--max_delay_ms", type=float, default=5.0)
    parser.add_argument("--max_queue", type=int, default=None,
                        help="bound on queued (not yet batched) "
                             "requests; when full, new requests get "
                             "503 + Retry-After instead of unbounded "
                             "queueing latency (default: unbounded)")
    parser.add_argument("--num_devices", type=int, default=1,
                        help="chips to serve across (data-parallel "
                             "batch sharding); 0 = all visible")
    parser.add_argument("--T_pred", type=int, default=None)
    parser.add_argument("--greedy", action="store_true",
                        help="greedy single-future decode instead of "
                             "diverse beam")
    parser.add_argument("--server_backend", default="asyncio",
                        choices=("asyncio", "threads"),
                        help="HTTP front end: one-event-loop asyncio "
                             "(default; no per-connection threads) or "
                             "the classic ThreadingHTTPServer")
    parser.add_argument("--reload_poll_s", type=float, default=0.0,
                        help="poll the run's checkpoint dir every N "
                             "seconds and hot-swap newly saved weights "
                             "into the serving engine without dropping "
                             "traffic (0 = off; needs the checkpoint-"
                             "manager load path, not --load_from/"
                             "--random_init)")
    add_model_args(parser)
    # None-sentinel defaults: argparse itself records whether the user
    # gave these flags (in ANY spelling it accepts, including
    # abbreviated prefixes), so the TPU tier default below never has to
    # re-derive "was this explicit?" from raw argv
    parser.set_defaults(compute_dtype=None, decode_quant=None)
    return parser


def resolve_serving_dtypes(backend: str, compute_dtype, decode_quant):
    """Serving default on TPU: bf16 + int8 gate AND attention matmuls
    ("int8a") — decided on the two-halves rule (STATUS.md §int8a
    decision): END metrics at 8 seeds are tier-neutral vs f32
    (Q8A_METRICS_r04.json: minADE/minFDE/NLL deltas zero-mean and
    inside the f32 seed spread, matching int8's own profile) AND it is
    the fastest tier on chip (106.4 traj/s vs int8 103.7 / bf16 75.3,
    BENCH_r04).

    ``None`` means the flag was not given.  Any explicit flag disables
    the tier default entirely (the un-given one falls back to the
    library default); non-TPU backends keep the exact f32 parity path.

    Returns the final ``(compute_dtype, decode_quant)`` pair."""
    if backend == "tpu" and compute_dtype is None and decode_quant is None:
        return "bfloat16", "int8a"
    return compute_dtype or "float32", decode_quant or "none"


def resolve_max_batch(max_batch, greedy: bool) -> int:
    """Tier default from the measured curve (BENCH_SERVE_r05.json):
    beam throughput is flat across max_batch 8-64 while p50 scales
    with batch, so 8 dominates; greedy's knee is 32."""
    if max_batch is not None:
        return max_batch
    return 32 if greedy else 8


def main(argv=None) -> None:
    args = build_parser().parse_args(argv)
    args.compute_dtype, args.decode_quant = resolve_serving_dtypes(
        jax.default_backend(), args.compute_dtype, args.decode_quant)
    args.max_batch = resolve_max_batch(args.max_batch, args.greedy)
    cfg = config_from_args(args).replace(
        use_beam_search=not args.greedy).validate()

    params = init_params(jax.random.PRNGKey(0), cfg)
    ckpt = served_step = None
    if args.random_init:
        pass
    elif args.load_from is not None:
        params = restore_params_from(args.load_from, params)
    else:
        outpath = process_out_dirs(
            args.outbasepath, args.modelname, args.runId)
        ckpt = CheckpointManager(outpath)
        params = ckpt.restore_params(params, best=args.load_best)
        served_step = ckpt.latest_step(best=args.load_best)
    if args.reload_poll_s > 0 and ckpt is None:
        raise SystemExit("mvt-serve: --reload_poll_s needs the "
                         "checkpoint-manager load path (drop "
                         "--load_from/--random_init)")

    mesh = None
    if args.num_devices != 1:
        from multiverse_tpu.parallel import make_mesh

        mesh = make_mesh(
            n_devices=args.num_devices if args.num_devices else None)
    engine = ServingEngine(
        params, cfg, max_batch=args.max_batch,
        max_delay_ms=args.max_delay_ms, T_pred=args.T_pred, mesh=mesh,
        max_queue=args.max_queue)
    print(f"mvt-serve: compiling (batch={args.max_batch}, "
          f"T={engine.T_pred}, beam={cfg.beam_size}, "
          f"quant={cfg.decode_quant})...", file=sys.stderr)
    dt = engine.warmup()
    print(f"mvt-serve: warm in {dt:.1f}s", file=sys.stderr)

    stop_reload = threading.Event()
    if args.reload_poll_s > 0:
        def _reload_loop():
            nonlocal served_step
            template = init_params(jax.random.PRNGKey(0), cfg)
            while not stop_reload.wait(args.reload_poll_s):
                try:
                    # poll_ re-reads the dir: the new steps come from
                    # the TRAINER process, invisible to orbax's
                    # in-process step cache
                    step = ckpt.poll_latest_step(best=args.load_best)
                    if step is None or step == served_step:
                        continue
                    new = ckpt.restore_params(
                        template, best=args.load_best)
                    engine.update_params(new)
                    served_step = step
                    print(f"mvt-serve: hot-reloaded checkpoint step "
                          f"{step}", file=sys.stderr)
                except Exception as exc:   # keep serving old weights
                    print(f"mvt-serve: reload failed ({exc}); keeping "
                          f"current weights", file=sys.stderr)

        threading.Thread(target=_reload_loop, name="mvt-serve-reload",
                         daemon=True).start()

    if args.server_backend == "asyncio":
        from multiverse_tpu.serving.aserver import AsyncPredictionServer

        server = AsyncPredictionServer(
            engine, host=args.host, port=args.port)
        server.start_background()   # binds + reports the port
    else:
        server = PredictionServer(engine, host=args.host, port=args.port)
    print(f"mvt-serve: listening on http://{args.host}:{server.port} "
          f"({args.server_backend})", file=sys.stderr)

    def _sigterm(*_):
        # containers stop with SIGTERM: drain and close instead of
        # dying mid-batch with waiters stranded
        raise SystemExit(0)

    if threading.current_thread() is threading.main_thread():
        signal.signal(signal.SIGTERM, _sigterm)
    try:
        if args.server_backend == "asyncio":
            server.wait()
        else:
            server.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        stop_reload.set()
        server.close()


if __name__ == "__main__":
    main()
