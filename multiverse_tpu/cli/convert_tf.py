"""mvt-convert-tf — convert a released reference TF1 checkpoint into
this framework's orbax run layout so `mvt-test --load` /
`mvt-multifuture-inference` run the published weights directly.

Usage:
    mvt-convert-tf <tf_ckpt_prefix> <outbasepath> <modelname> <runId> \
        [model flags as in mvt-train]

The TF prefix is what `tf.train.latest_checkpoint` returns, e.g.
`.../multiverse_single18.51.../save/model-120000` (reference restore
logic: code/pred_utils.py:149-205).  The variable-name mapping is in
multiverse_tpu/tools/tf_converter.py and is tested offline against the
reference's exact scope names; this CLI is the checkpoint-availability-
gated path (the released checkpoints do not ship in-repo).
"""

from __future__ import annotations

import argparse

from multiverse_tpu.cli import common


def main(argv=None) -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("tf_ckpt", help="TF checkpoint prefix "
                                        "(…/save/model-XXXX)")
    parser.add_argument("outbasepath")
    parser.add_argument("modelname")
    parser.add_argument("runId", type=int)
    parser.add_argument("--non_strict", action="store_true",
                        help="ignore checkpoint variables that don't "
                             "exist under this config")
    common.add_model_args(parser)
    args = parser.parse_args(argv)

    import jax

    from multiverse_tpu.models import init_params
    from multiverse_tpu.tools.tf_converter import convert_tf_checkpoint
    from multiverse_tpu.train.checkpoints import (
        CheckpointManager,
        process_out_dirs,
    )

    cfg = common.config_from_args(args)
    template = init_params(jax.random.PRNGKey(0), cfg)
    params = convert_tf_checkpoint(
        args.tf_ckpt, cfg, template, strict=not args.non_strict)

    outpath = process_out_dirs(args.outbasepath, args.modelname,
                               args.runId)
    manager = CheckpointManager(outpath)
    manager.save(0, params)
    manager.save(0, params, best=True)
    print("converted %s -> %s (step 0, save+best)"
          % (args.tf_ckpt, outpath))


if __name__ == "__main__":
    main()
