"""A/B of the beam successor-selection algorithms on the real chip.

Measures the K=20 diverse beam decode (bench.py's exact workload:
batch 64, T=25, 18x32 grid, D=256) with `beam_select="dense"` (the
rounds-1..4 form: full-row log_softmax + O((H*W)^2) comparison-count
rank penalty + flat top-K over K*H*W) vs the round-5
`beam_select="twostage"` form (per-beam top-K of raw logits + global
top-K over K*K — exact same winners/ties, models/beam_search.py
dominance proof), for the bf16 and int8a tiers.

The dense int8a run doubles as the CANARY: it is HLO-identical to the
pre-change bench.py headline graph, so it must reproduce ~105 traj/s
before the twostage numbers are trusted (CLAUDE.md canary protocol).

Prints ONE JSON line.
"""

import json
import sys
import time

import numpy as np

from bench import BATCH, T_PRED, WARMUP, _best_window, _wait_for_backend


def main():
    import jax

    from multiverse_tpu.config import MultiverseConfig
    from multiverse_tpu.inference import (
        beam_forward,
        make_batch,
        synthesize_multifuture_inputs,
    )
    from multiverse_tpu.models import init_params

    base = MultiverseConfig(
        scene_grid_strides=(2, 4),
        use_grids=(True, False),
        use_beam_search=True,
        beam_size=20,
        diverse_beam=True,
        diverse_gamma=0.01,
        fix_num_timestep=1,
        compute_dtype="bfloat16",
    ).validate()

    dev = _wait_for_backend(jax, 900.0)
    print(f"bench_beamselect: device={dev.platform}:{dev.device_kind}",
          file=sys.stderr)

    params = init_params(jax.random.PRNGKey(0), base)
    inputs = synthesize_multifuture_inputs(
        base, num_traj=BATCH, max_pred_len=T_PRED)
    batch = jax.device_put(make_batch(inputs, np.arange(BATCH), base))
    params = jax.device_put(params)

    def sync(out):
        return float(np.asarray(out[0].logprobs[0, 0]))

    record = {"metric": "beam_select_ab", "unit": "traj/s",
              "batch": BATCH, "beam": 20, "t_pred": T_PRED}
    ids_by_select = {}
    # dense first: those graphs are HLO-identical to the pre-change
    # bench.py tiers (compile-cached + canary comparable)
    for select in ("dense", "twostage"):
        for quant in ("none", "int8a"):
            cfg = base.replace(beam_select=select,
                               decode_quant=quant).validate()
            step = jax.jit(
                lambda p, b, cfg=cfg: beam_forward(p, b, cfg,
                                                   T_pred=T_PRED))
            t0 = time.perf_counter()
            out = step(params, batch)
            sync(out)
            print(f"bench_beamselect: [{select}/{quant}] compile+first "
                  f"{time.perf_counter() - t0:.1f}s", file=sys.stderr)
            ids_by_select.setdefault(quant, {})[select] = np.asarray(
                out[0].ids)
            for _ in range(WARMUP - 1):
                sync(step(params, batch))
            rate, windows = _best_window(
                lambda: sync(step(params, batch)))
            tier = "bf16" if quant == "none" else quant
            record[f"{select}_{tier}"] = round(rate, 2)
            record[f"{select}_{tier}_windows"] = windows
            print(f"bench_beamselect: [{select}/{quant}] "
                  f"{rate:.2f} traj/s", file=sys.stderr)

    # on-chip equivalence: same winners from both selects, per tier
    for quant, by in ids_by_select.items():
        match = float((by["dense"] == by["twostage"]).mean())
        record[f"ids_match_{'bf16' if quant == 'none' else quant}"] = \
            round(match, 4)
    for tier in ("bf16", "int8a"):
        record[f"speedup_{tier}"] = round(
            record[f"twostage_{tier}"] / record[f"dense_{tier}"], 4)
    print(json.dumps(record))


if __name__ == "__main__":
    main()
