"""End-metric harness for the decode quantization tiers.

This is the experiment that decides the default decode tier
(STATUS.md §int8 decision): per seed, a full-size synthetic 400-step
training run (batch 64, bf16), then the COMPLETE eval stack — the
offline inference driver (`run_multifuture_inference`, the same pickle
contracts `mvt-multifuture-inference` writes) followed by the
minADE20/minFDE20 evaluator and the grid-NLL evaluator
(eval/multifuture.py, verbatim-parity-tested against the reference
scripts: code/multifuture_eval_trajs.py:41-85,
code/multifuture_eval_trajs_prob.py:25-43) on a 128-trajectory
3-future synthetic eval set.  The across-seed f32 spread is the noise
floor; a tier is metric-neutral when its per-seed deltas vs f32 are
zero-mean and well inside that spread.

Round 3 ran it for f32/bf16/int8 (Q8_METRICS_r03.json — int8 neutral,
now the default) and again for int8a when the chip returned.  Usage:

    python bench_quant_metrics.py --tiers f32,int8,int8a --seeds 4 \
        --out QUANT_METRICS.json

Writes one JSON artifact with per-run metrics + delta statistics.
"""

import argparse
import json
import sys
import time

import numpy as np


def synth_gt_futures(inputs, rnd, n_futures=3):
    """Synthetic multi-future GT: random-walk continuations from each
    trajectory's last observed point, one entry per future in the GT
    pickle contract ({future_id: {"x_agent_traj": [(frame, pid, x, y),
    ...]}}, reference: code/multifuture_eval_trajs.py:27-38)."""
    gt = {}
    for n, tid in enumerate(inputs.traj_ids):
        start = inputs.obs_traj[n, -1]
        T = int(inputs.pred_lengths[n])
        futures = {}
        for f in range(n_futures):
            steps = rnd.normal(0.0, 25.0, size=(T, 2))
            xy = start[None] + np.cumsum(steps, axis=0)
            futures[str(f)] = {
                "x_agent_traj": [
                    (t, n, float(xy[t, 0]), float(xy[t, 1]))
                    for t in range(T)
                ]
            }
        gt[tid] = futures
    return gt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tiers", default="f32,int8,int8a")
    ap.add_argument("--seeds", type=int, default=4)
    ap.add_argument("--train_steps", type=int, default=400)
    ap.add_argument("--train_batch", type=int, default=64)
    ap.add_argument("--eval_traj", type=int, default=128)
    ap.add_argument("--data_dir", default=None,
                    help="campaign.py work dir: per-seed checkpoints "
                         "train on its REAL fake-CARLA train npz and "
                         "every tier evaluates on its structured "
                         "multifuture eval set (obs TSVs + GT pickles) "
                         "instead of random-walk synthetics — the "
                         "VERDICT r4 #5 rebase")
    ap.add_argument("--out", default="QUANT_METRICS.json")
    args = ap.parse_args()
    tiers = args.tiers.split(",")

    import jax

    from multiverse_tpu.config import MultiverseConfig
    from multiverse_tpu.eval.multifuture import (
        evaluate_multifuture_nll,
        evaluate_multifuture_trajs,
    )
    from multiverse_tpu.inference import (
        run_multifuture_inference,
        synthesize_multifuture_inputs,
    )
    from multiverse_tpu.models import init_params
    from multiverse_tpu.train.trainer import (
        init_train_state,
        make_train_step,
    )

    import os
    sys.path.insert(0, os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "tests"))
    from synthetic import make_batch as make_train_batch

    cfg_train = MultiverseConfig(
        scene_grid_strides=(2, 4),
        use_grids=(True, False),
        use_beam_search=True,
        beam_size=20,
        diverse_beam=True,
        diverse_gamma=0.01,
        fix_num_timestep=1,
        compute_dtype="bfloat16",
        batch_size=args.train_batch,
    ).validate()

    campaign = None
    if args.data_dir:
        import pickle
        from glob import glob

        from multiverse_tpu.data.dataset import read_data
        from multiverse_tpu.inference import load_multifuture_inputs

        with open(os.path.join(args.data_dir, "meta.json")) as f:
            meta = json.load(f)
        # the campaign camera's pixel space (dataset contract); model
        # dims are already the flagship defaults
        cfg_train = cfg_train.replace(video_h=108, video_w=192).validate()
        train_data = read_data(meta["prepro"], "train", cfg_train)
        gt = {}
        for p in glob(os.path.join(meta["mf_out"], "test", "*.p")):
            with open(p, "rb") as f:
                gt[os.path.splitext(os.path.basename(p))[0]] = \
                    pickle.load(f)
        inputs_real = load_multifuture_inputs(
            os.path.join(meta["obs_out"], "traj_2.5fps", "test"),
            os.path.join(meta["mf_out"], "test"),
            meta["mf_scene"], meta["id2name"], cfg_train)
        campaign = {"train_data": train_data, "gt": gt,
                    "inputs": inputs_real, "meta": meta}
        print(f"campaign data: {train_data.num_examples} train ex, "
              f"{len(inputs_real.traj_ids)} eval trajectories",
              file=sys.stderr)

    def tier_cfg(tier):
        if tier == "f32":
            return cfg_train.replace(
                compute_dtype="float32", decode_quant="none")
        if tier == "bf16":
            return cfg_train.replace(decode_quant="none")
        return cfg_train.replace(decode_quant=tier)  # int8 / int8a / …

    per_run = {}
    for seed in range(args.seeds):
        t0 = time.perf_counter()
        rng = np.random.RandomState(1000 + seed)
        params = init_params(jax.random.PRNGKey(seed), cfg_train)
        state, tx = init_train_state(
            params, cfg_train,
            train_num_examples=args.train_batch * args.train_steps)
        step = make_train_step(cfg_train, tx)  # already jitted
        # a fresh synthetic batch is drawn per step from the seeded rnd
        # stream, exactly as in the round-3 int8-decision run (data is
        # synthetic; what matters is a PEAKED trained checkpoint, not
        # the loss value)
        parts = {"total": float("nan")}   # --train_steps 0 guard
        if campaign is not None:
            # real structured data: per-seed variation is the param
            # init (+ the optimizer path it induces); data order is
            # the dataset's own epoch shuffle
            for batch, _ in campaign["train_data"].get_batches(
                    args.train_batch, num_steps=args.train_steps):
                state, parts = step(state, jax.device_put(batch))
        else:
            for i in range(args.train_steps):
                batch, _ = make_train_batch(
                    rng, cfg_train, args.train_batch)
                state, parts = step(state, jax.device_put(batch))
        final_loss = float(np.asarray(parts["total"]))
        print(f"seed {seed}: trained {args.train_steps} steps "
              f"(loss {final_loss:.3f}, "
              f"{time.perf_counter() - t0:.0f}s)", file=sys.stderr)

        if campaign is not None:
            inputs, gt = campaign["inputs"], campaign["gt"]
            t_max = int(inputs.pred_lengths.max())
        else:
            inputs = synthesize_multifuture_inputs(
                cfg_train, num_traj=args.eval_traj, seed=7000 + seed,
                max_pred_len=25)
            # half the eval set gets the top-down camera id so both
            # evaluator groups (45-degree / top-down,
            # code/multifuture_eval_trajs.py:71) carry real numbers
            inputs = inputs._replace(traj_ids=[
                tid if n % 2 else tid.replace("_cam1", "_cam4")
                for n, tid in enumerate(inputs.traj_ids)])
            gt = synth_gt_futures(
                inputs, np.random.RandomState(9000 + seed))
            t_max = 25

        for tier in tiers:
            cfg_t = tier_cfg(tier)
            t1 = time.perf_counter()
            output_data, beam_prob = run_multifuture_inference(
                state.params, inputs, cfg_t,
                batch_size=min(64, len(inputs.traj_ids)),
                T_max=t_max, need_prob=True)
            trajs = evaluate_multifuture_trajs(
                {k: v for k, v in output_data.items()},
                gt_path="", gt_trajs=gt)
            nll = evaluate_multifuture_nll(
                beam_prob, gt_path="", gt_trajs=gt,
                scene_h=cfg_t.scene_grids[cfg_t.active_scales[0]][0],
                scene_w=cfg_t.scene_grids[cfg_t.active_scales[0]][1],
                video_h=cfg_t.video_h, video_w=cfg_t.video_w,
                time_list=(0, 1, 2))
            # evaluator keys are 1-based: time_list=(0,1,2) -> nll_T=1..3
            nll_vals = [nll[f"nll_T={t}"] for t in (1, 2, 3)
                        if nll.get(f"count_T={t}", 0)]
            per_run[f"{tier}_s{seed}"] = {
                "minade": trajs["minade_all"],
                "minfde": trajs["minfde_all"],
                "nll": float(np.mean(nll_vals)),
                "minade_45": trajs["minade_45-degree"],
                "minade_td": trajs["minade_top-down"],
            }
            print(f"seed {seed} {tier}: ade {trajs['minade_all']:.2f} "
                  f"fde {trajs['minfde_all']:.2f} "
                  f"nll {np.mean(nll_vals):.4f} "
                  f"({time.perf_counter() - t1:.0f}s)", file=sys.stderr)

    # delta statistics vs f32 (or vs the first tier listed)
    base = tiers[0]
    stats = {}
    for tier in tiers[1:]:
        for metric in ("minade", "minfde", "nll"):
            d = [per_run[f"{tier}_s{s}"][metric]
                 - per_run[f"{base}_s{s}"][metric]
                 for s in range(args.seeds)]
            stats[f"{tier}_d{metric}"] = {
                "mean": float(np.mean(d)),
                "std": float(np.std(d)),
                "max_abs": float(np.max(np.abs(d))),
            }
    for metric in ("minade", "minfde", "nll"):
        vals = [per_run[f"{base}_s{s}"][metric]
                for s in range(args.seeds)]
        stats[f"{base}_{metric}_seed_std"] = float(np.std(vals))

    artifact = {
        "experiment": "decode-quant tier decision on END metrics",
        "data": ("campaign fake-CARLA structured dataset + multifuture "
                 "eval set" if campaign is not None
                 else "random-walk synthetic"),
        "recipe": (
            f"per seed: {args.train_steps}-step full-size "
            f"{'REAL-data' if campaign is not None else 'synthetic'} "
            f"train (batch {args.train_batch}, bf16) -> "
            f"run_multifuture_inference (batch 64, K=20, T=25) -> "
            f"eval/multifuture.py evaluators on "
            f"{args.eval_traj}-traj 3-future eval set"),
        "tiers": tiers,
        "seeds": args.seeds,
        "per_run": per_run,
        "stats": stats,
    }
    with open(args.out, "w") as f:
        json.dump(artifact, f, indent=1)
    print(json.dumps({"out": args.out, "stats": stats}))


if __name__ == "__main__":
    main()
