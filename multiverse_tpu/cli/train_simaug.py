"""SimAug training driver: adversarial-feature / multi-view-mixup
training on simulation data.

reference: SimAug/code/train.py — same CLI shape as the base trainer
plus the `--adv_train / --multiview_train / --use_mixup ...` family
(:109-144).  Validation runs the clean forward pass (the reference
builds a separate frozen-param val model, SimAug/code/train.py:192-194;
here the pure eval function needs no second model).
"""

from __future__ import annotations

import argparse
import json
import math
import os
import time

import jax

from multiverse_tpu.cli.common import add_model_args, add_train_args
from multiverse_tpu.cli import common as cli_common
from multiverse_tpu.data.dataset import read_data
from multiverse_tpu.data.multiview import MultiviewDataset
from multiverse_tpu.models import init_params
from multiverse_tpu.models.simaug import (
    SimAugConfig,
    make_simaug_train_step,
)
from multiverse_tpu.parallel import (
    make_mesh_for_batch,
    make_sharded_eval_step,
    replicate,
    shard_batch,
)
from multiverse_tpu.train.checkpoints import (
    CheckpointManager,
    process_out_dirs,
    restore_params_from,
)
from multiverse_tpu.train.evaluate import evaluate
from multiverse_tpu.train.trainer import init_train_state
from multiverse_tpu.utils import MovingAverage


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("prepropath", type=str)
    parser.add_argument("outbasepath", type=str)
    parser.add_argument("modelname", type=str)
    parser.add_argument("--runId", type=int, default=0)
    parser.add_argument("--load", action="store_true")
    parser.add_argument("--load_best", action="store_true")
    parser.add_argument("--load_from", type=str, default=None)
    parser.add_argument("--val_grid_num", type=int, default=0)
    parser.add_argument("--only_scene", default=None,
                        help="restrict the in-training val eval to one "
                             "scene token (reference: SimAug/code/"
                             "train.py:51, pred_utils.py:501-505)")
    parser.add_argument("--save_period", type=int, default=300)
    parser.add_argument("--loss_moving_avg_step", default=100, type=int)
    parser.add_argument("--loss_fetch_period", default=20, type=int,
                        help="fetch per-step losses every N steps "
                             "(see mvt-train)")
    parser.add_argument("--seed", type=int, default=0)
    add_model_args(parser)
    add_train_args(parser)
    # the SimAug trainer DEFAULTS to recurrent dropout 0.7 — the base
    # trainer defaults to 1.0 (reference: SimAug/code/train.py:159-160
    # vs code/train.py:120); the published SimAug recipes pass no
    # --keep_prob and therefore ran at 0.7
    parser.set_defaults(keep_prob=0.7)
    # SimAug's model always builds the scene-conv pyramid — the fork
    # comments the flag out entirely (reference: SimAug/code/
    # train.py:97); tower_forward needs the scene_conv params, so the
    # flag is forced on here (SimAugConfig.validate rejects it off)
    parser.set_defaults(use_scene_enc=True)
    # SimAug knobs (reference: SimAug/code/train.py:109-144)
    parser.add_argument("--adv_train", action="store_true")
    parser.add_argument("--adv_epsilon", type=float, default=0.1)
    parser.add_argument("--adv_step_size", type=float, default=0.001)
    parser.add_argument("--adv_num_iter", type=int, default=30)
    parser.add_argument("--adv_start_from_clean_prob",
                        default=0.0, type=float)
    parser.add_argument("--adv_use_fgsm", action="store_true")
    parser.add_argument("--standard_aug", action="store_true")
    # --norm_input comes from add_model_args (base-config field: the
    # [-1,1] scaling applies at eval time too)
    parser.add_argument("--norm_feat", action="store_true")
    parser.add_argument("--use_mixup", action="store_true")
    parser.add_argument("--mixup_alpha", type=float, default=1.0)
    parser.add_argument("--mixup_mix_adv", action="store_true")
    parser.add_argument("--multiview_train", action="store_true")
    parser.add_argument("--multiview_max_num", type=int, default=3)
    parser.add_argument("--multiview_exp", default=3, type=int)
    parser.add_argument("--multiview_random", action="store_true")
    parser.add_argument("--multiview_max_weight_for_first",
                        action="store_true")
    parser.add_argument("--multiview_use_adv_for_loss", action="store_true")
    parser.add_argument("--double_weighting", action="store_true")
    parser.add_argument("--fl_gamma", default=1.0, type=float)
    return parser


SIMAUG_FIELDS = (
    "adv_train", "adv_epsilon", "adv_step_size", "adv_num_iter",
    "adv_start_from_clean_prob", "adv_use_fgsm", "standard_aug",
    "norm_feat", "use_mixup", "mixup_alpha",
    "mixup_mix_adv", "multiview_train", "multiview_max_num",
    "multiview_exp", "multiview_random", "multiview_max_weight_for_first",
    "multiview_use_adv_for_loss", "double_weighting", "fl_gamma",
)


def main(argv=None) -> None:
    args = build_parser().parse_args(argv)
    base = cli_common.config_from_args(args)
    import dataclasses

    cfg = SimAugConfig(
        **dataclasses.asdict(base),
        **{k: getattr(args, k) for k in SIMAUG_FIELDS},
    ).validate()

    train_base = read_data(args.prepropath, "train", cfg)
    train_data = MultiviewDataset(
        train_base, cfg, max_views=cfg.multiview_max_num)
    val_data = read_data(args.prepropath, "val", cfg)
    if cfg.multiview_train and train_data.num_views != cfg.multiview_max_num:
        cfg = cfg.replace(
            multiview_max_num=train_data.num_views).validate()
        print("multiview_max_num -> %d (from data)" % train_data.num_views)

    params = init_params(jax.random.PRNGKey(args.seed), cfg)
    outpath = process_out_dirs(args.outbasepath, args.modelname, args.runId)
    with open(os.path.join(outpath, "config.json"), "w") as f:
        f.write(cfg.to_json())
    ckpt = CheckpointManager(outpath)

    if args.load_from is not None:
        params = restore_params_from(args.load_from, params)
    elif args.load or args.load_best:
        params = ckpt.restore_params(params, best=args.load_best)

    # new saves continue ABOVE any steps already in this run dir
    # (orbax raises StepAlreadyExistsError on a collision; see
    # cli/train.py for the full rationale)
    step_offset = ckpt.latest_step() or 0

    # one optimizer: the tx applying updates must be the one whose
    # init produced state.opt_state
    state, tx = init_train_state(params, cfg, train_data.num_examples)
    train_step = make_simaug_train_step(cfg, tx)

    mesh = make_mesh_for_batch(cfg.batch_size)
    eval_step = make_sharded_eval_step(cfg, mesh)

    def make_eval_fn(host_params):
        rep = replicate(mesh, host_params)

        def eval_fn(batch):
            cl, rg = eval_step(rep, shard_batch(mesh, batch))
            return jax.device_get(cl), jax.device_get(rg)

        return eval_fn

    steps_per_epoch = int(
        math.ceil(train_data.num_examples / cfg.batch_size))
    num_steps = steps_per_epoch * cfg.num_epochs
    metric = "grid%d_traj_ade" % args.val_grid_num
    best = {metric: float("inf"), "step": -1}
    loss_ma = MovingAverage(args.loss_moving_avg_step)
    rng = jax.random.PRNGKey(args.seed + 1)
    global_step = 0
    finalperf = None

    print("SimAug training: %d steps, views=%d, mode=%s" % (
        num_steps, train_data.num_views,
        "adv" if cfg.adv_train else
        "multiview" if cfg.multiview_train else
        "standard_aug" if cfg.standard_aug else "clean"))

    from multiverse_tpu.cli.common import LossBuffer
    from multiverse_tpu.data.prefetch import prefetch

    loss_buf = LossBuffer(loss_ma, args.loss_fetch_period)
    # steps/s measured flush-to-flush (the only true sync points —
    # dispatch-side timing reports host enqueue rate, not the device)
    sync_t, sync_step = time.perf_counter(), 0

    # close() in finally (context exit) unblocks the producer thread
    # even when a step raises mid-loop
    with prefetch(train_data.get_batches(
            cfg.batch_size, num_steps=num_steps), depth=2) as batches:
        for batch, _ in batches:
            global_step += 1
            rng, step_rng = jax.random.split(rng)
            state, losses = train_step(state, batch, step_rng)
            loss_buf.put(global_step, losses["total"])

            if (global_step % args.save_period == 0
                    or global_step == num_steps):
                loss_buf.flush()
                now = time.perf_counter()
                steps_per_sec = (global_step - sync_step) / max(
                    now - sync_t, 1e-9)
                sync_t, sync_step = now, global_step
                host_params = jax.device_get(state.params)
                ckpt.save(global_step + step_offset, host_params)
                with mesh:
                    evalperf = evaluate(
                        val_data, cfg, make_eval_fn(host_params),
                        only_scene=args.only_scene)
                print("step %d: loss(ma)=%s %.2f steps/s | val %s=%.4f "
                      "(best %.4f @%d)" % (
                          global_step, loss_ma, steps_per_sec,
                          metric, evalperf[metric],
                          best[metric], best["step"]))
                if evalperf[metric] < best[metric]:
                    best[metric] = evalperf[metric]
                    best["step"] = global_step + step_offset
                    ckpt.save(global_step + step_offset, host_params,
                              best=True)
                finalperf = evalperf

    loss_buf.flush()
    with open(os.path.join(outpath, "val_perf.json"), "w") as f:
        best_out = dict(best)
        if math.isinf(best_out[metric]):
            best_out[metric] = None   # json has no Infinity token
        json.dump({"best": best_out}, f, indent=2, default=float)
    if finalperf is not None:
        print("best val %s: %.4f at step %d" % (
            metric, best[metric], best["step"]))


if __name__ == "__main__":
    main()
