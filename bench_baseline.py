"""Measured reference-baseline proxy for bench.py's `vs_baseline`.

The reference decodes one trajectory per sess.run at batch size 1 under
TF1 on CPU/GPU (reference: code/multifuture_inference.py:460-472) and
publishes no throughput numbers (SURVEY.md §6).  The TF1 graph cannot
run here (tf.contrib is gone), so this script measures a *defensible
upper bound* on the TF1-CPU figure: this repo's own flagship beam
decode — batch 1, float32, K=20, T=25 — pinned to ONE CPU core.  The
JAX/XLA CPU path is a vectorized, fused compilation of the same math;
a TF1 feed-dict graph evaluated step-by-step cannot beat it, so
`traj/s` from this script >= the reference's CPU throughput.

Run:  python bench_baseline.py
Prints ONE JSON line:
    {"metric": "cpu1core_batch1_beam20_decode", "value": N,
     "unit": "traj/s", "note": ...}

The measured value is recorded in BASELINE_MEASURED.json and is the
denominator of bench.py's `vs_baseline`.
"""

import json
import os
import shutil
import sys
import time


def _pin_to_one_core():
    """Re-exec under `taskset -c 0` so XLA's CPU thread pool cannot use
    more than one core, then force the CPU platform in-process (the
    env var alone is overridden by the TPU plugin's sitecustomize)."""
    if os.environ.get("_BENCH_BASELINE_PINNED") != "1":
        os.environ["_BENCH_BASELINE_PINNED"] = "1"
        os.environ["JAX_PLATFORMS"] = "cpu"
        if shutil.which("taskset"):
            os.execvp("taskset",
                      ["taskset", "-c", "0", sys.executable] + sys.argv)
        # no taskset: fall through single-process (thread caps below)
    os.environ.setdefault("OMP_NUM_THREADS", "1")
    import jax

    jax.config.update("jax_platforms", "cpu")
    return jax


ITERS = 3
T_PRED = 25


def main():
    jax = _pin_to_one_core()
    import numpy as np

    from multiverse_tpu.config import MultiverseConfig
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
        compute_dtype="float32",  # the reference's precision
    ).validate()

    dev = jax.devices()[0]
    print(f"bench_baseline: device={dev.platform} "
          f"(pinned={os.environ.get('_BENCH_BASELINE_PINNED')})",
          file=sys.stderr)

    params = init_params(jax.random.PRNGKey(0), cfg)
    inputs = synthesize_multifuture_inputs(cfg, num_traj=1,
                                           max_pred_len=T_PRED)
    batch = make_batch(inputs, np.arange(1), cfg)

    step = jax.jit(lambda p, b: beam_forward(p, b, cfg, T_pred=T_PRED))

    def sync(out):
        return float(np.asarray(out[0].logprobs[0, 0]))

    t0 = time.perf_counter()
    sync(step(params, batch))
    print(f"bench_baseline: compile+first run "
          f"{time.perf_counter() - t0:.1f}s", file=sys.stderr)

    t0 = time.perf_counter()
    for _ in range(ITERS):
        sync(step(params, batch))
    dt = time.perf_counter() - t0

    traj_per_sec = ITERS / dt
    print(json.dumps({
        "metric": "cpu1core_batch1_beam20_decode",
        "value": round(traj_per_sec, 4),
        "unit": "traj/s",
        "note": "upper bound on the reference's TF1-CPU batch-1 "
                "decode (same math, XLA-fused, one core)",
    }))


if __name__ == "__main__":
    main()
