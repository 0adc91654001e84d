"""Training driver.

reference: code/train.py — periodic save + val eval, best-model
tracking on grid{val_grid_num}_traj_ade, NaN-loss abort, moving-average
loss displays.  TPU additions: the train step is jitted once over a
device mesh (data parallelism across all visible chips), a --profile
flag captures a jax.profiler trace, and per-step wall-clock prints with
steps/sec.
"""

from __future__ import annotations

import argparse
import json
import math
import os
import time

import jax

from multiverse_tpu.cli.common import (
    LossBuffer,
    add_model_args,
    add_train_args,
    config_from_args,
)
from multiverse_tpu.data.dataset import read_data
from multiverse_tpu.data.prefetch import prefetch
from multiverse_tpu.models import init_params
from multiverse_tpu.parallel import (
    init_sharded_train_state,
    make_mesh_for_batch,
    make_sharded_eval_step,
    make_sharded_train_step,
    shard_batch,
)
from multiverse_tpu.train.checkpoints import (
    CheckpointManager,
    process_out_dirs,
    restore_params_from,
)
from multiverse_tpu.train.evaluate import evaluate
from multiverse_tpu.train.trainer import build_optimizer
from multiverse_tpu.utils import MovingAverage, profile_trace


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("prepropath", type=str)
    parser.add_argument("outbasepath", type=str,
                        help="full path will be outbasepath/modelname/runId")
    parser.add_argument("modelname", type=str)
    parser.add_argument("--runId", type=int, default=0)
    parser.add_argument("--load", action="store_true")
    parser.add_argument("--load_best", action="store_true")
    parser.add_argument("--load_from", type=str, default=None)
    parser.add_argument("--val_grid_num", type=int, default=0,
                        help="which grid scale for the validation metric")
    parser.add_argument("--save_period", type=int, default=300)
    parser.add_argument("--loss_moving_avg_step", default=100, type=int)
    parser.add_argument("--loss_fetch_period", default=20, type=int,
                        help="fetch per-step losses to host every N "
                             "steps (1 = reference semantics: NaN "
                             "abort on the exact step; larger keeps "
                             "the TPU stream unblocked — the NaN "
                             "abort then lags at most N steps)")
    parser.add_argument("--check_model", action="store_true",
                        help="print parameter shapes and exit")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--profile", default=None,
                        help="jax.profiler trace logdir")
    parser.add_argument("--model_parallel", type=int, default=1)
    parser.add_argument("--per_scene_eval", action="store_true")
    add_model_args(parser)
    add_train_args(parser)
    return parser


def main(argv=None) -> None:
    args = build_parser().parse_args(argv)
    cfg = config_from_args(args)

    train_data = read_data(args.prepropath, "train", cfg)
    val_data = read_data(args.prepropath, "val", cfg)

    params = init_params(jax.random.PRNGKey(args.seed), cfg)
    if args.check_model:
        # reference: code/train.py:152-166 `--check_model`
        for path, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
            name = "/".join(str(p)[2:-2] if hasattr(p, "key") else str(p)
                            for p in path)
            print("%s %s" % (name, tuple(leaf.shape)))
        return

    outpath = process_out_dirs(args.outbasepath, args.modelname, args.runId)
    with open(os.path.join(outpath, "config.json"), "w") as f:
        f.write(cfg.to_json())
    ckpt = CheckpointManager(outpath)

    mesh = make_mesh_for_batch(cfg.batch_size,
                               model_parallel=args.model_parallel)
    tx = build_optimizer(cfg, train_data.num_examples)

    if args.load_from is not None:
        params = restore_params_from(args.load_from, params)
    elif args.load or args.load_best:
        params = ckpt.restore_params(params, best=args.load_best)
    state = init_sharded_train_state(params, tx, mesh)
    # new saves continue ABOVE any steps already in this run dir:
    # orbax raises StepAlreadyExistsError on a collision, and numbering
    # below an old run's steps would make the NEXT --load silently
    # restore the stale run (global_step itself restarts at 0 — the
    # reference excludes global_step on restore too, so the LR
    # schedule's restart is reference parity)
    step_offset = ckpt.latest_step() or 0

    train_step = make_sharded_train_step(cfg, tx, mesh)
    eval_step = make_sharded_eval_step(cfg, mesh)

    def eval_fn(batch):
        cl, rg = eval_step(state.params, shard_batch(mesh, batch))
        return jax.device_get(cl), jax.device_get(rg)

    steps_per_epoch = int(
        math.ceil(train_data.num_examples / cfg.batch_size))
    num_steps = steps_per_epoch * cfg.num_epochs
    print("batch_size:%d, epochs:%d, %d steps/epoch, total %d steps, "
          "eval/save every %d steps, mesh=%s" % (
              cfg.batch_size, cfg.num_epochs, steps_per_epoch, num_steps,
              args.save_period, dict(mesh.shape)))

    metric = "grid%d_traj_ade" % args.val_grid_num
    best = {metric: float("inf"), "step": -1}
    loss_ma = MovingAverage(args.loss_moving_avg_step)
    wd_ma = MovingAverage(args.loss_moving_avg_step)
    val_perf = []
    finalperf = None
    global_step = int(jax.device_get(state.step))

    # wd rides the same batched transfer as the total loss, one sample
    # per STEP like the reference's FIFO_ME (reference: code/train.py:265)
    loss_buf = LossBuffer(loss_ma, args.loss_fetch_period,
                          aux_mas={"wd": wd_ma})

    with mesh, profile_trace(args.profile):
        if args.load or args.load_best or args.load_from:
            # reference is_start branch (code/train.py:216-219): record
            # the LOADED model's validation baseline before training,
            # so best-model tracking can never end up worse than the
            # starting checkpoint (no best-save here: the weights
            # already exist on disk)
            evalperf = evaluate(val_data, cfg, eval_fn,
                                per_scene_eval=args.per_scene_eval)
            best[metric] = evalperf[metric]
            best["step"] = step_offset
            val_perf.append((None, evalperf, step_offset, False))
            print("loaded baseline: val %s=%.4f" % (
                metric, evalperf[metric]))

        # steps/s is measured flush-to-flush: the flush's device_get is
        # the only true sync point, so dispatch-side timers would
        # report host enqueue rate, not device throughput
        sync_t, sync_step = time.perf_counter(), 0

        # train-time dropout (--keep_prob < 1): one fresh key per step;
        # at keep_prob == 1 no rng is passed so the step executable is
        # identical to the dropout-free build
        dropout = cfg.keep_prob < 1.0
        rng = jax.random.PRNGKey(args.seed + 1)

        # close() in finally unblocks the producer thread even when a
        # step raises mid-loop (a full queue would otherwise pin it +
        # its buffered batches for the process lifetime)
        with prefetch(train_data.get_batches(
                cfg.batch_size, num_steps=num_steps), depth=2) as batches:
            for batch, _ in batches:
                global_step += 1
                if dropout:
                    rng, step_rng = jax.random.split(rng)
                    state, losses = train_step(
                        state, shard_batch(mesh, batch), step_rng)
                else:
                    state, losses = train_step(
                        state, shard_batch(mesh, batch))
                loss_buf.put(global_step, losses["total"],
                             aux={"wd": losses["wd"]})
                if global_step % args.save_period == 0 \
                        or global_step == num_steps:
                    loss_buf.flush()
                    now = time.perf_counter()
                    steps_per_sec = (global_step - sync_step) / max(
                        now - sync_t, 1e-9)
                    sync_t, sync_step = now, global_step

                    host_params = jax.device_get(state.params)
                    ckpt.save(global_step + step_offset, host_params)
                    evalperf = evaluate(
                        val_data, cfg, eval_fn,
                        per_scene_eval=args.per_scene_eval)
                    print("step %d: loss(ma)=%s wd(ma)=%s %.1f steps/s "
                          "| val: %s (best %s=%.4f @%d)" % (
                              global_step, loss_ma, wd_ma, steps_per_sec,
                              {k: round(v, 4) for k, v in sorted(
                                  evalperf.items()) if "@T" not in k},
                              metric, best[metric], best["step"]))
                    is_best = evalperf[metric] < best[metric]
                    if is_best:
                        best[metric] = evalperf[metric]
                        best["step"] = global_step + step_offset
                        ckpt.save(global_step + step_offset, host_params,
                                  best=True)
                    # EVERY eval point is recorded (not just best
                    # flips) so val_perf.json carries the full
                    # training curve; the reference only appends on
                    # improvement (code/train.py:230-240) but its
                    # stdout carries the rest — here the artifact does
                    val_perf.append((loss_ma.me(), evalperf,
                                     global_step + step_offset, is_best))
                    finalperf = evalperf
        loss_buf.flush()

    with open(os.path.join(outpath, "val_perf.json"), "w") as f:
        # json has no Infinity: a run too short to ever eval leaves the
        # sentinel, stored as null so the file stays parseable
        best_out = dict(best)
        if math.isinf(best_out[metric]):
            best_out[metric] = None
        json.dump({"best": best_out, "val_perf": val_perf}, f, indent=2,
                  default=float)
    if finalperf is not None:
        print("best val %s: %.4f at step %d; final %s=%.4f" % (
            metric, best[metric], best["step"], metric, finalperf[metric]))


if __name__ == "__main__":
    main()
