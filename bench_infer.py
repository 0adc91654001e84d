"""Offline batch-inference throughput: the mvt-multifuture-inference
driver path, measured at STEADY STATE.

Runs `run_multifuture_inference` (host input packing -> depth-2
pipelined device decode -> on-device trajectory reconstruction ->
pickle-format assembly) over >= 10 full batches, after a warmup pass
that absorbs the one-time trace/compile cost — the round-2 ledger
number (12.2 traj/s over 2 batches) was floored by that overhead and
could not catch a regression in per-batch host time.  Each variant's
steady-state rate is the lower-median of several 2-vs-10-batch
difference quotients, sanity-bounded by the same step's sync-per-batch
rate (pipelining can only hide the host/fetch share): the shared chip
flaps hard enough between runs that a single quotient can silently
read 60% high.

Two modes are reported: .traj.p-only (need_prob=False — nothing big
crosses the host link) and with the .prob.p payload (the reference's
full per-cell logit contract, irreducibly transfer-bound on this
~10 MB/s link; reference: code/multifuture_inference.py:475-530).

Prints ONE JSON line:
    {"metric": "offline_inference_throughput", "value": <traj/s>,
     "unit": "traj/s", "with_prob_value": N, "batches": N,
     "batch_size": N}
"""

import json
import os
import sys
import time

import numpy as np

BATCH = 64
N_BATCHES = 10
T_PRED = 25


def main():
    import jax

    from multiverse_tpu.config import MultiverseConfig
    from multiverse_tpu.inference import (
        run_multifuture_inference,
        synthesize_multifuture_inputs,
    )
    from multiverse_tpu.models import init_params

    cfg = MultiverseConfig(
        scene_grid_strides=(2, 4), use_grids=(True, False),
        use_beam_search=True, beam_size=20, diverse_beam=True,
        diverse_gamma=0.01, fix_num_timestep=1,
        compute_dtype="bfloat16").validate()

    from bench import _wait_for_backend
    dev = _wait_for_backend(
        jax, float(os.environ.get("BENCH_BACKEND_WAIT_S", "900")))
    print(f"bench_infer: device={dev.platform}:{dev.device_kind}",
          file=sys.stderr)

    params = jax.device_put(init_params(jax.random.PRNGKey(0), cfg))
    N = BATCH * N_BATCHES
    inputs = synthesize_multifuture_inputs(
        cfg, num_traj=N, max_pred_len=T_PRED)
    # force the static max decode length so every batch reuses one graph
    inputs.pred_lengths[:] = T_PRED

    def subset(n):
        return inputs._replace(
            traj_ids=inputs.traj_ids[:n],
            obs_traj=inputs.obs_traj[:n],
            obs_grid_class=inputs.obs_grid_class[:n],
            obs_grid_target=[t[:n] for t in inputs.obs_grid_target],
            obs_scene=inputs.obs_scene[:n],
            pred_lengths=inputs.pred_lengths[:n])

    # the serving-default int8a tier on the same driver
    # (mvt-multifuture-inference --decode_quant int8a); TPU only —
    # elsewhere the fused kernel is unavailable and the tier is a no-op
    cfg_q = cfg.replace(decode_quant="int8a").validate()

    def run(n, need_prob, prob_fetch_dtype="float32", quant=False):
        t0 = time.perf_counter()
        out, prob = run_multifuture_inference(
            params, subset(n), cfg_q if quant else cfg,
            batch_size=BATCH, T_max=T_PRED,
            need_prob=need_prob, prob_fetch_dtype=prob_fetch_dtype)
        assert len(out) == n
        return time.perf_counter() - t0

    # warmup: compiles the decode graph and traces the host path
    t0 = time.perf_counter()
    run(BATCH * 2, need_prob=False)
    print(f"bench_infer: warmup (compile) {time.perf_counter()-t0:.1f}s",
          file=sys.stderr)

    # steady state by differencing a 2-batch and a 10-batch run: the
    # per-run constant (input subsetting + a step-cache hit — the
    # driver memoizes its jitted step across calls) cancels, leaving
    # the per-batch rate a long real run converges to.  The shared
    # chip FLAPS between runs (identical 20-batch runs measured 26 and
    # 38 s in one probe), so each variant takes the MEDIAN of REPS
    # difference quotients and is then sanity-bounded by physics: with
    # depth-2 pipelining the steady rate can only exceed the same
    # step's sync-per-batch rate by the hidden host/fetch share, so
    # anything above 1.25x the sync rate is a flap artifact (a slow
    # calibration run inflating the quotient), reported null.
    def sync_rate(quant):
        from multiverse_tpu.inference import beam_forward, make_batch
        c = cfg_q if quant else cfg
        b = jax.device_put(make_batch(inputs, np.arange(BATCH), c))
        fn = jax.jit(lambda p, bb: beam_forward(p, bb, c, T_pred=T_PRED))
        fetch = lambda o: float(np.asarray(o[0].logprobs[0, 0]))
        fetch(fn(params, b)); fetch(fn(params, b))
        t0 = time.perf_counter()
        for _ in range(6):
            fetch(fn(params, b))
        return BATCH * 6 / (time.perf_counter() - t0)

    REPS = 3
    rates = {}
    variants = [
        ("traj_only", False, "float32", False),
        ("with_prob", True, "float32", False),
        # opt-in f16 logit transfer (--prob_fetch_dtype float16):
        # halves the ~73 MB/batch .prob.p payload; the wall-clock
        # win is link-dependent (a compressing tunnel sees ~none,
        # an uncompressed PCIe link the full 2x — STATUS.md)
        ("with_prob_f16", True, "float16", False),
    ]
    sync_ceiling = {"traj_only": sync_rate(False) * 1.25}
    if dev.platform == "tpu":
        # .traj.p-only at the int8a serving tier (the fastest decode)
        variants.append(("traj_only_int8a", False, "float32", True))
        sync_ceiling["traj_only_int8a"] = sync_rate(True) * 1.25
    print(f"bench_infer: sync ceilings {sync_ceiling}", file=sys.stderr)
    for tag, need_prob, fetch_dt, quant in variants:
        run(BATCH * 2, need_prob, fetch_dt, quant)  # warm this variant
        estimates = []
        for rep in range(REPS):
            t2 = run(BATCH * 2, need_prob, fetch_dt, quant)
            t10 = run(N, need_prob, fetch_dt, quant)
            est = ((N - BATCH * 2) / (t10 - t2)
                   if t10 > t2 * 1.05 else None)
            ceiling = sync_ceiling.get(tag)
            if est is not None and ceiling is not None and est > ceiling:
                print(f"bench_infer: {tag} rep{rep} {est:.1f} exceeds "
                      f"the sync-rate ceiling {ceiling:.1f} "
                      f"(flap artifact) — dropped", file=sys.stderr)
                est = None
            estimates.append(est)
            print(f"bench_infer: {tag} rep{rep} 2-batch {t2:.1f}s, "
                  f"{N_BATCHES}-batch {t10:.1f}s -> "
                  f"{'%.1f' % est if est else 'INVALID'}",
                  file=sys.stderr)
        valid = sorted(e for e in estimates if e is not None)
        # lower-median: with an even count prefer the conservative side
        rates[tag] = valid[(len(valid) - 1) // 2] if valid else None
        if not valid:
            print(f"bench_infer: {tag} INVALID (all {REPS} reps "
                  f"flap-contaminated)", file=sys.stderr)

    def _r(v):
        return None if v is None else round(v, 2)

    # itemize the transfer-bound .prob.p path (VERDICT r4 #7): one
    # instrumented full run accumulating per-phase host wall time —
    # build (host batch packing + dispatch), fetch (blocking device_get
    # = residual device compute + the wire), pack (upcast + pickle
    # assembly) — so "exactly the link" is a measured claim with the
    # host-side share itemized, not a back-of-envelope
    timings = {}
    t0 = time.perf_counter()
    run_multifuture_inference(
        params, subset(N), cfg, batch_size=BATCH, T_max=T_PRED,
        need_prob=True, timings=timings)
    wall = time.perf_counter() - t0
    nb = max(int(timings.get("batches", 0)), 1)
    fetch_mb = timings["fetch_bytes"] / 1e6
    breakdown = {
        "wall_s": round(wall, 2),
        "traj_s": round(N / wall, 2),
        "batches": nb,
        "build_ms_per_batch": round(timings["build_s"] / nb * 1e3, 1),
        "fetch_ms_per_batch": round(timings["fetch_s"] / nb * 1e3, 1),
        "pack_ms_per_batch": round(timings["pack_s"] / nb * 1e3, 1),
        "fetch_mb_per_batch": round(fetch_mb / nb, 1),
        "effective_fetch_mbps": round(
            fetch_mb / max(timings["fetch_s"], 1e-9), 2),
    }
    print(f"bench_infer: with_prob breakdown {breakdown}",
          file=sys.stderr)

    record = {
        "metric": "offline_inference_throughput",
        "value": _r(rates["traj_only"]),
        "unit": "traj/s",
        "with_prob_value": _r(rates["with_prob"]),
        "with_prob_f16_value": _r(rates["with_prob_f16"]),
        "batches": N_BATCHES,
        "batch_size": BATCH,
        "with_prob_breakdown": breakdown,
    }
    if "traj_only_int8a" in rates:
        record["int8a_value"] = _r(rates["traj_only_int8a"])
    print(json.dumps(record))


if __name__ == "__main__":
    main()
