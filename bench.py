"""Headline benchmark: diverse-beam multi-future decode throughput.

Measures trajectories/second through the full flagship inference path —
scene CNN, ConvLSTM encoders, K=20 diverse beam decode with per-step
GNN, greedy offset decode — at the published Forking Paths
configuration (18×32 grid, hidden 256, T=25 decode steps), batched
across trajectories on one chip.

The headline tier is bf16 + int8 gate AND attention matmuls ("int8a",
the serving default since round 4 — fastest on chip AND metric-neutral
vs f32 at 8 seeds, see STATUS.md §int8a decision); the int8 (gate-only)
and pure-bf16 tiers are reported alongside, bf16 with its achieved
TFLOP/s and fraction of the chip's measured matmul roofline.

The reference decodes one trajectory per sess.run at batch size 1
(reference: code/multifuture_inference.py:460-472) under TF1.
BASELINE.json sets the target at ≥50× the reference's TF1-CPU
throughput, so vs_baseline ≥ 50 means the north-star target is met.
The reference publishes no throughput numbers (SURVEY.md §6) and its
TF1 graph cannot run here, so the denominator is MEASURED by
bench_baseline.py — this repo's own flagship decode at batch 1, f32,
pinned to one CPU core, a strict upper bound on the TF1-CPU figure —
and recorded in BASELINE_MEASURED.json (0.0644 traj/s).

Each tier is timed as best-of-N windows (BENCH_WINDOWS, default 4)
because the shared tunneled chip intermittently degrades 2-20x for
whole windows; the per-window rates are emitted in the artifact so a
flapped run is visible rather than silently recorded.

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": "traj/s", "vs_baseline": N}
"""

import json
import os
import sys
import time

import numpy as np


def _reference_traj_per_sec() -> float:
    """The measured baseline (see module docstring)."""
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "BASELINE_MEASURED.json")
    try:
        with open(path) as f:
            return float(json.load(f)["value"])
    except (OSError, KeyError, ValueError):
        return 0.0644  # last measured value (bench_baseline.py)


REFERENCE_TRAJ_PER_SEC = _reference_traj_per_sec()
BATCH = 64
T_PRED = 25
WARMUP = 2
ITERS = 8
# The tunneled chip is shared and intermittently degrades 2-20x for
# windows of seconds-to-minutes (same binary measured 6x apart across
# windows — STATUS.md measurement note).  A single timing window can
# therefore land entirely inside a flap, so each tier is measured as
# best-of-N windows with short gaps; the per-window rates are emitted
# alongside so a degraded run is visible in the artifact.
WINDOWS = int(os.environ.get("BENCH_WINDOWS", "4"))
WINDOW_GAP_S = float(os.environ.get("BENCH_WINDOW_GAP_S", "1.5"))


def _best_window(run_once, iters=ITERS, windows=WINDOWS):
    """Best-of-N windowed throughput (traj/s) + the per-window rates."""
    rates = []
    for w in range(windows):
        t0 = time.perf_counter()
        for _ in range(iters):
            run_once()
        rates.append(BATCH * iters / (time.perf_counter() - t0))
        if w + 1 < windows:
            time.sleep(WINDOW_GAP_S)
    return max(rates), [round(r, 1) for r in rates]


def _check_diversity_penalty_fusion(jax):
    """Allocation guard for the diversity rank penalty
    (models/beam_search.py add_diversity_penalty): the broadcasted
    [NK, V, V] compares must stay inside a fusion.  XLA-TPU currently
    compiles this to ZERO temp bytes; XLA-CPU materializes ~3.4 GB at
    the same shape, which is what a TPU regression would look like.
    Failing here fails the graded bench loudly instead of silently
    costing N·K·576² per decode step.  Since round 5 the HOT path is
    the two-stage select (beam_select="twostage", no rank pass at
    all); this guard keeps covering the beam_select="dense" fallback
    that engages when K > H*W or diverse_gamma > 1."""
    import jax.numpy as jnp

    from multiverse_tpu.models.beam_search import add_diversity_penalty

    NK, V = BATCH * 20, 18 * 32
    x = jnp.zeros((NK, V), jnp.float32)
    compiled = jax.jit(
        lambda x: add_diversity_penalty(x, 0.01)).lower(x).compile()
    ma = compiled.memory_analysis()
    limit = 64 * 1024 * 1024
    assert ma.temp_size_in_bytes < limit, (
        f"diversity-penalty fusion regressed: temp "
        f"{ma.temp_size_in_bytes} bytes >= {limit} (the [NK,V,V] "
        f"compare is materializing)")
    print(f"bench: diversity-penalty fusion OK "
          f"(temp={ma.temp_size_in_bytes} bytes at [{NK},{V}])",
          file=sys.stderr)


def _measure_matmul_roofline(jax) -> float:
    """Measured bf16 matmul peak of this chip, in TFLOP/s.

    K chained 8192^3 matmuls inside ONE jit (device-side fori_loop, a
    single scalar fetch) so the tunnel's host-sync latency is amortized
    across ~70 TFLOP of work.  This is the denominator of the bench's
    mfu_vs_roofline field — a MEASURED peak, not the datasheet number."""
    import jax.numpy as jnp
    from jax import lax

    M, K_ITERS = 8192, 64
    b = jnp.zeros((M, M), jnp.bfloat16)   # runtime arg: not foldable
    x = jnp.ones((M, M), jnp.bfloat16)

    def chain(x, b):
        out = lax.fori_loop(
            0, K_ITERS,
            lambda _, v: jnp.dot(v, b,
                                 preferred_element_type=jnp.bfloat16),
            x)
        return jnp.sum(out.astype(jnp.float32))

    f = jax.jit(chain)
    float(np.asarray(f(x, b)))            # compile + warm
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        float(np.asarray(f(x, b)))
        best = min(best, time.perf_counter() - t0)
    return 2.0 * M ** 3 * K_ITERS / best / 1e12


def _measure_matmul_roofline_int8(jax) -> float:
    """Measured int8 matmul peak (int8 x int8 -> int32 on the MXU), in
    TOP/s — the denominator for the quant tiers' MFU instead of an
    assumed 2x-bf16 factor.  Same chained-loop protocol as the bf16
    probe."""
    import jax.numpy as jnp
    from jax import lax

    M, K_ITERS = 8192, 64
    b = jnp.ones((M, M), jnp.int8)
    x = jnp.ones((M, M), jnp.int8)

    def chain(x, b):
        def body(_, v):
            out = lax.dot_general(
                v, b, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            # renormalize to int8 for the next iteration (cheap
            # elementwise; keeps the loop int8-in like the kernels)
            return (out & 1).astype(jnp.int8)
        out = lax.fori_loop(0, K_ITERS, body, x)
        return jnp.sum(out.astype(jnp.int32))

    f = jax.jit(chain)
    float(np.asarray(f(x, b)))
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        float(np.asarray(f(x, b)))
        best = min(best, time.perf_counter() - t0)
    return 2.0 * M ** 3 * K_ITERS / best / 1e12


def _wait_for_backend(jax, budget_s: float):
    """Wait for the backend for up to `budget_s`: the shared tunneled
    chip intermittently fails init for minutes at a time — sometimes
    raising UNAVAILABLE, sometimes HANGING — and a crash here costs
    the whole bench artifact.  Because a hung in-process init cannot
    be retried (it wedges the backend lock), readiness is probed in a
    SUBPROCESS until one succeeds; only then does this process
    initialize."""
    import subprocess

    deadline = time.time() + budget_s
    attempt = 0
    while True:
        try:
            probe = subprocess.run(
                [sys.executable, "-c", "import jax; jax.devices()"],
                timeout=120, capture_output=True)
            if probe.returncode == 0:
                return jax.devices()[0]
        except subprocess.TimeoutExpired:
            pass
        attempt += 1
        if time.time() >= deadline:
            raise RuntimeError(
                f"backend not ready after {attempt} probes / "
                f"{budget_s:.0f}s")
        print(f"bench: backend unavailable (probe {attempt}); retrying "
              f"(~{deadline - time.time():.0f}s left)", file=sys.stderr)
        time.sleep(20.0)


def main():
    import jax

    from multiverse_tpu.config import MultiverseConfig
    from multiverse_tpu.flops import beam_decode_flops
    from multiverse_tpu.inference import (
        beam_forward,
        make_batch,
        synthesize_multifuture_inputs,
    )
    from multiverse_tpu.models import init_params

    cfg = MultiverseConfig(
        scene_grid_strides=(2, 4),
        use_grids=(True, False),
        use_beam_search=True,
        beam_size=20,
        diverse_beam=True,
        diverse_gamma=0.01,
        fix_num_timestep=1,
        compute_dtype="bfloat16",
    ).validate()

    try:
        dev = _wait_for_backend(
            jax, float(os.environ.get("BENCH_BACKEND_WAIT_S", "900")))
    except RuntimeError as exc:
        # the shared chip can be down for hours; a crash here loses the
        # whole artifact.  Emit an explicit outage record instead — the
        # value is null (NOT a stale number passed off as a
        # measurement); last on-chip measurements live in STATUS.md
        # §Perf and BENCH_EXTRA_r03.json.
        print(json.dumps({
            "metric": "beam20_decode_throughput",
            "value": None,
            "unit": "traj/s",
            "vs_baseline": None,
            "error": f"TPU backend unreachable: {exc}",
            "note": "chip outage at bench time; last measured headline "
                    "(int8a serving tier, two-stage select) was 106.9 "
                    "traj/s = 1660x the measured baseline "
                    "(BEAMSELECT_r05.json, 2026-08-20)",
        }))
        return
    print(f"bench: device={dev.platform}:{dev.device_kind}",
          file=sys.stderr)

    if dev.platform == "tpu":
        _check_diversity_penalty_fusion(jax)

    params = init_params(jax.random.PRNGKey(0), cfg)
    inputs = synthesize_multifuture_inputs(
        cfg, num_traj=BATCH, max_pred_len=T_PRED)
    batch = make_batch(inputs, np.arange(BATCH), cfg)
    batch = jax.device_put(batch)
    params = jax.device_put(params)

    step = jax.jit(lambda p, b: beam_forward(p, b, cfg, T_pred=T_PRED))

    def sync(out):
        # force a host transfer: on tunneled/remote TPU backends
        # block_until_ready can return before execution finishes
        return float(np.asarray(out[0].logprobs[0, 0]))

    t0 = time.perf_counter()
    sync(step(params, batch))
    print(f"bench: first compile+run {time.perf_counter() - t0:.1f}s",
          file=sys.stderr)
    for _ in range(WARMUP - 1):
        sync(step(params, batch))

    traj_per_sec, bf16_windows = _best_window(
        lambda: sync(step(params, batch)))

    # analytic FLOPs of the decode batch (multiverse_tpu.flops —
    # matmul/conv MACs only, so achieved TFLOP/s is a floor) and the
    # chip's MEASURED matmul roofline, emitted as artifact fields
    # backing the "decode is compute-bound" claim
    step_flops = beam_decode_flops(cfg, BATCH, T_PRED)
    tflops = step_flops * traj_per_sec / BATCH / 1e12
    roofline = (_measure_matmul_roofline(jax)
                if dev.platform == "tpu" else None)

    # int8 decode fast path (cfg.decode_quant="int8"): the gate matmul
    # rides the MXU's int8 mode (2x bf16 peak).  Round 3 settled its
    # fidelity on END metrics (8 seeds x full-size synthetic
    # checkpoints, complete eval stack — minADE20/minFDE20 via
    # eval/multifuture.py + grid NLL via the prob evaluator,
    # STATUS.md §int8 decision): deltas vs f32 are zero-mean and well
    # inside across-seed run noise (dADE mean -0.08 px, |d|<=5 vs seed
    # spread std 10 px; dFDE mean -7.3 px i.e. slightly better; dNLL
    # ~2e-4 vs spread 1.2e-2).  The round-2 beam-id-match proxy (89%
    # vs 95%) was penalizing metric-neutral near-tie beam swaps.  The
    # HEADLINE is therefore the int8 tier — the framework's serving
    # default — with bf16 kept as a field (and as the exact-parity
    # fallback off-TPU).
    int8_traj_per_sec = None
    int8_windows = None
    if dev.platform == "tpu":
        cfg8 = cfg.replace(decode_quant="int8")
        step8 = jax.jit(
            lambda p, b: beam_forward(p, b, cfg8, T_pred=T_PRED))
        sync(step8(params, batch))
        sync(step8(params, batch))
        int8_traj_per_sec, int8_windows = _best_window(
            lambda: sync(step8(params, batch)))

    # int8a tier: int8 gate matmul PLUS int8 GNN-attention matmuls
    # (ops/pallas_decode.py select_quant).  End metrics are neutral
    # (Q8A_METRICS_r04.json); this field is the speed half of the
    # "int8a wins BOTH -> default" decision rule (STATUS.md §int8a)
    int8a_traj_per_sec = None
    int8a_windows = None
    if dev.platform == "tpu":
        cfga = cfg.replace(decode_quant="int8a")
        stepa = jax.jit(
            lambda p, b: beam_forward(p, b, cfga, T_pred=T_PRED))
        sync(stepa(params, batch))
        sync(stepa(params, batch))
        int8a_traj_per_sec, int8a_windows = _best_window(
            lambda: sync(stepa(params, batch)))

    headline = int8a_traj_per_sec or int8_traj_per_sec or traj_per_sec
    record = {
        "metric": "beam20_decode_throughput",
        "value": round(headline, 2),
        "unit": "traj/s",
        "vs_baseline": round(headline / REFERENCE_TRAJ_PER_SEC, 2),
        "decode_quant": ("int8a" if int8a_traj_per_sec else
                         "int8" if int8_traj_per_sec else "none"),
        "bf16_value": round(traj_per_sec, 2),
        "bf16_tflops": round(tflops, 1),
        # best-of-N windows per tier (shared-chip flap guard); the
        # raw per-window rates make a degraded run visible
        "bf16_windows": bf16_windows,
    }
    if int8_traj_per_sec is not None:
        record["int8_value"] = round(int8_traj_per_sec, 2)
        record["int8_windows"] = int8_windows
    if int8a_traj_per_sec is not None:
        record["int8a_value"] = round(int8a_traj_per_sec, 2)
        record["int8a_windows"] = int8a_windows
    if roofline is not None:
        record["roofline_tflops"] = round(roofline, 1)
        record["bf16_mfu_vs_roofline"] = round(tflops / roofline, 3)
    if int8_traj_per_sec is not None:
        int8_tflops = (step_flops * int8_traj_per_sec / BATCH) / 1e12
        record["int8_tflops"] = round(int8_tflops, 1)
        if roofline is not None:
            # only the gate matmul rides the MXU's int8 mode (2x bf16
            # peak); attention + readout stay bf16, so utilization vs
            # the blended peak is a floor
            record["int8_mfu_vs_2x_roofline"] = round(
                int8_tflops / (2.0 * roofline), 3)
    if int8a_traj_per_sec is not None:
        int8a_tflops = (step_flops * int8a_traj_per_sec / BATCH) / 1e12
        record["int8a_tflops"] = round(int8a_tflops, 1)
        if roofline is not None:
            # the headline tier's MFU closure (VERDICT r4 #4): achieved
            # vs the assumed 2x peak, then vs an ANALYTIC matmul
            # ceiling built from the measured int8 + bf16 rooflines and
            # the per-mode FLOP split — the residual between measured
            # step time and that ceiling is the non-MXU share
            # (exp/softmax, top-k, beam select/gathers, scan overhead)
            from multiverse_tpu.flops import beam_decode_flops_split

            record["int8a_mfu_vs_2x_roofline"] = round(
                int8a_tflops / (2.0 * roofline), 3)
            int8_roofline = _measure_matmul_roofline_int8(jax)
            record["int8_roofline_tops"] = round(int8_roofline, 1)
            split = beam_decode_flops_split(cfg, BATCH, T_PRED)
            t_matmul = (
                (split["int8_gate"] + split["int8_attn"])
                / (int8_roofline * 1e12)
                + split["bf16_rest"] / (roofline * 1e12))
            ceiling = BATCH / t_matmul
            t_meas = BATCH / int8a_traj_per_sec
            record["int8a_analytic_matmul_ceiling_traj_s"] = round(
                ceiling, 1)
            record["int8a_pct_of_matmul_ceiling"] = round(
                100.0 * int8a_traj_per_sec / ceiling, 1)
            record["int8a_nonmxu_residual_ms_per_batch"] = round(
                (t_meas - t_matmul) * 1e3, 1)
            # readout quantization: the recorded negative — the class
            # readout is ~0.09% of the step's matmul FLOPs, so an int8
            # readout buys < 0.05% even at a perfect 2x
            record["readout_share_of_flops"] = round(
                split["bf16_readout_class"] / step_flops, 5)
    print(json.dumps(record))


if __name__ == "__main__":
    main()
