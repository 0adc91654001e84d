"""Single-future evaluation driver.

reference: code/test.py — loads the test split, restores a checkpoint,
runs the full evaluate loop and prints the metric table (:157-182).
"""

from __future__ import annotations

import argparse

import jax

from multiverse_tpu.cli.common import add_model_args, config_from_args
from multiverse_tpu.data.dataset import read_data
from multiverse_tpu.models import init_params
from multiverse_tpu.models.beam_search import BeamOutputs
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


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("prepropath", type=str)
    parser.add_argument("outbasepath", type=str)
    parser.add_argument("modelname", type=str)
    parser.add_argument("--runId", type=int, default=0)
    parser.add_argument("--load_best", action="store_true")
    parser.add_argument("--load_from", type=str, default=None)
    parser.add_argument("--batch_size", type=int, default=64)
    parser.add_argument("--save_output", default=None)
    parser.add_argument("--use_gt_grid", action="store_true")
    parser.add_argument("--per_scene_eval", action="store_true")
    parser.add_argument("--only_scene", default=None,
                        help="restrict evaluation to one scene token "
                             "(e.g. 0400; reference: SimAug/code/"
                             "test.py:50, pred_utils.py:501-505)")
    parser.add_argument("--show_center_only", action="store_true",
                        help="include the grid-center-only ADE/FDE "
                             "ablation in the key-metric summary "
                             "(reference: code/test.py:60,164-166)")
    parser.add_argument("--show_grid_acc_at_T", action="store_true",
                        help="include per-timestep accuracies at "
                             "T=0,4,9,11 in the key-metric summary "
                             "(reference: code/test.py:49,167-170)")
    add_model_args(parser)
    return parser


def main(argv=None) -> None:
    args = build_parser().parse_args(argv)
    cfg = config_from_args(args)   # batch_size copied from args there

    test_data = read_data(args.prepropath, "test", cfg)

    params = init_params(jax.random.PRNGKey(0), cfg)
    if args.load_from is not None:
        params = restore_params_from(args.load_from, params)
    else:
        outpath = process_out_dirs(
            args.outbasepath, args.modelname, args.runId)
        ckpt = CheckpointManager(outpath)
        params = ckpt.restore_params(params, best=args.load_best)

    mesh = make_mesh_for_batch(args.batch_size)
    params = replicate(mesh, params)
    eval_step = make_sharded_eval_step(cfg, mesh)

    # eval_fn and beam_fn receive the SAME batch back-to-back from
    # evaluate(); share one device placement instead of paying the
    # (slow, ~10 MB/s tunneled) host->device transfer twice
    _placed = {"src": None, "dev": None}

    def _sharded(batch):
        if _placed["src"] is not batch:
            _placed["src"] = batch
            _placed["dev"] = shard_batch(mesh, batch)
        return _placed["dev"]

    def eval_fn(batch):
        cl, rg = eval_step(params, _sharded(batch))
        return jax.device_get(cl), jax.device_get(rg)

    beam_fn = None
    if cfg.use_beam_search:
        # the sharded helper keeps the fused Pallas decode kernel on
        # multi-device meshes (shard_map per chip — GSPMD cannot
        # partition pallas_call); at mesh size 1 it is a plain jit
        from multiverse_tpu.parallel import make_sharded_beam_step

        bstep = make_sharded_beam_step(cfg, mesh)

        def beam_fn(batch):
            beam, _ = bstep(params, _sharded(batch))
            return BeamOutputs(*jax.device_get(tuple(beam)))

    with mesh:
        perf = evaluate(
            test_data, cfg, eval_fn,
            batch_size=args.batch_size,
            per_scene_eval=args.per_scene_eval,
            use_gt_grid=args.use_gt_grid,
            save_output=args.save_output,
            beam_step_fn=beam_fn,
            only_scene=args.only_scene,
        )

    # metric table (reference: code/test.py:157-182): every metric on
    # its own "key, value" line, then a two-line KEY-METRIC summary
    # (names, then values) filtered exactly like the reference —
    # per-grid acc/ADE/FDE always, the center-only ablation behind
    # --show_center_only, the T=0/4/9/11 accuracies behind
    # --show_grid_acc_at_T, per-scene ADE/FDE with --per_scene_eval.
    # Full-precision "%s" floats like the reference, so runs can be
    # diffed against recorded baselines without rounding noise.
    print("performance:")
    key_metrics = []
    for i in cfg.active_scales:
        key_metrics += ["grid%d_acc" % i, "grid%d_traj_ade" % i,
                        "grid%d_traj_fde" % i]
        if args.show_center_only:
            # divergence from the reference (intentional): its filter
            # asks for grid%d_centerOnly_traj_* (code/test.py:165-166)
            # but evaluate emits grid%d_traj_centerOnly_*
            # (code/pred_utils.py:564-566), so the reference's flag
            # silently never matches; use the emitted names
            key_metrics += ["grid%d_traj_centerOnly_ade" % i,
                            "grid%d_traj_centerOnly_fde" % i]
        if args.show_grid_acc_at_T:
            # min, max length, then 2 second, 4 second
            # (reference: code/test.py:167-170)
            key_metrics += ["grid%d_acc_@T=%d" % (i, t)
                            for t in (0, 4, 9, 11)]
    if args.per_scene_eval:
        scenes = ["0000", "0002", "0400", "0401", "0500"]
        key_metrics += ["%s_ade" % s for s in scenes]
        key_metrics += ["%s_fde" % s for s in scenes]
    numbers = []
    for k in sorted(perf.keys()):
        print("%s, %s" % (k, perf[k]))
        if k in key_metrics:
            numbers.append(("%s" % perf[k], k))
    print(" ".join(k for _, k in numbers))
    print(" ".join(v for v, _ in numbers))


if __name__ == "__main__":
    main()
