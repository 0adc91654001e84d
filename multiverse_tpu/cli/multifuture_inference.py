"""Multi-future inference driver: Forking Paths obs → K trajectories.

reference: code/multifuture_inference.py CLI (same flags, same output
pickle formats), but trajectories decode in device batches instead of
one sess.run per trajectory at batch 1 (:460-472).
"""

from __future__ import annotations

import argparse

import jax

from multiverse_tpu.config import MultiverseConfig
from multiverse_tpu.inference import (
    load_multifuture_inputs,
    run_multifuture_inference,
    save_outputs,
)
from multiverse_tpu.models import init_params
from multiverse_tpu.train.checkpoints import restore_params_from


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("model_path", help="checkpoint directory")
    parser.add_argument("traj_path", help="obs trajectory TSVs")
    parser.add_argument("multifuture_path", help="GT future pickles")
    parser.add_argument("output_file")
    parser.add_argument("--save_prob_file", default=None)
    parser.add_argument(
        "--prob_fetch_dtype", default="float32",
        choices=["float32", "float16"],
        help="device->host dtype for the [N,K,T,HW] .prob.p logit "
             "fetch; float16 halves the payload bytes (win is "
             "link-dependent) at a measured ~1e-5 grid-NLL cost — "
             "the pickle still stores f32")
    parser.add_argument("--obs_length", type=int, default=8)
    parser.add_argument("--num_out", type=int, default=20)
    parser.add_argument("--greedy", action="store_true")
    parser.add_argument("--center_only", action="store_true")
    parser.add_argument("--diverse_beam", action="store_true")
    parser.add_argument("--diverse_gamma", type=float, default=1.0)
    parser.add_argument("--fix_num_timestep", type=int, default=0)
    parser.add_argument("--grid_strides", default="2,4")
    parser.add_argument("--use_grids", default="1,0")
    parser.add_argument("--emb_size", type=int, default=32)
    parser.add_argument("--enc_hidden_size", type=int, default=256)
    parser.add_argument("--dec_hidden_size", type=int, default=256)
    parser.add_argument("--scene_conv_kernel", type=int, default=3)
    parser.add_argument("--scene_conv_dim", type=int, default=64)
    parser.add_argument("--convlstm_kernel", type=int, default=3)
    parser.add_argument("--use_gnn", action="store_true")
    parser.add_argument("--use_scene_enc", action="store_true")
    parser.add_argument("--use_single_decoder", action="store_true")
    parser.add_argument("--use_soft_grid_class", action="store_true")
    parser.add_argument("--norm_input", action="store_true",
                        help="scale scene one-hot maps to [-1,1] before "
                             "the scene CNN — REQUIRED when decoding a "
                             "checkpoint trained with --norm_input "
                             "(reference: SimAug/code/pred_models.py"
                             ":284-286 normalizes train and test alike)")
    parser.add_argument("--scene_feat_path", default=None)
    parser.add_argument("--scene_id2name", default=None)
    parser.add_argument("--scene_h", type=int, default=36)
    parser.add_argument("--scene_w", type=int, default=64)
    parser.add_argument("--scene_class", type=int, default=11)
    parser.add_argument("--video_h", type=int, default=1080)
    parser.add_argument("--video_w", type=int, default=1920)
    parser.add_argument("--batch_size", type=int, default=16)
    parser.add_argument("--compute_dtype", default="bfloat16")
    parser.add_argument(
        "--decode_quant", default="none",
        choices=["none", "int8", "int8a", "int8_dyn"],
        help="int8 MXU mode for the fused decode kernel (TPU only; "
             "ignored elsewhere).  'int8a' is the serving default "
             "tier — metric-neutral vs f32 at 8 seeds on exactly this "
             "eval stack (Q8A_METRICS_r04.json) and the fastest decode "
             "on chip; 'none' keeps the bf16/f32 parity path")
    parser.add_argument(
        "--beam_select", default="twostage",
        choices=["twostage", "dense"],
        help="beam successor selection: 'twostage' (per-beam top-K "
             "then global top-K over K*K — exact same winners/ties as "
             "dense, no O((H*W)^2) rank pass) or 'dense' (the "
             "rounds-1..4 full-row form)")
    return parser


def main(argv=None) -> None:
    args = build_parser().parse_args(argv)
    cfg = MultiverseConfig(
        obs_len=args.obs_length,
        emb_size=args.emb_size,
        enc_hidden_size=args.enc_hidden_size,
        dec_hidden_size=args.dec_hidden_size,
        scene_conv_kernel=args.scene_conv_kernel,
        scene_conv_dim=args.scene_conv_dim,
        convlstm_kernel=args.convlstm_kernel,
        use_gnn=args.use_gnn,
        use_scene_enc=args.use_scene_enc,
        use_single_decoder=args.use_single_decoder,
        use_soft_grid_class=args.use_soft_grid_class,
        norm_input=args.norm_input,
        scene_h=args.scene_h,
        scene_w=args.scene_w,
        scene_class=args.scene_class,
        video_h=args.video_h,
        video_w=args.video_w,
        beam_size=args.num_out,
        use_beam_search=not args.greedy,
        diverse_beam=args.diverse_beam,
        diverse_gamma=args.diverse_gamma,
        fix_num_timestep=args.fix_num_timestep,
        compute_dtype=args.compute_dtype,
        decode_quant=args.decode_quant,
        beam_select=args.beam_select,
        **MultiverseConfig.parse_strides(args.grid_strides, args.use_grids),
    ).validate()

    if args.greedy and args.save_prob_file:
        # fail before hours of decode, not after: greedy has no beams,
        # so the .prob.p contract cannot be produced
        raise SystemExit(
            "mvt-multifuture-inference: --save_prob_file requires "
            "beam search; drop --greedy")

    inputs = load_multifuture_inputs(
        args.traj_path, args.multifuture_path,
        args.scene_feat_path, args.scene_id2name, cfg)
    print("loaded %d trajectories" % len(inputs.traj_ids))

    params = init_params(jax.random.PRNGKey(0), cfg)
    params = restore_params_from(args.model_path, params)

    output_data, beam_prob = run_multifuture_inference(
        params, inputs, cfg,
        batch_size=args.batch_size,
        greedy=args.greedy,
        center_only=args.center_only,
        # the [N,K,T,HW] grid-logit fetch only pays for .prob.p
        need_prob=args.save_prob_file is not None,
        prob_fetch_dtype=args.prob_fetch_dtype,
    )
    save_outputs(output_data, beam_prob,
                 args.output_file, args.save_prob_file)
    print("wrote %s" % args.output_file)


if __name__ == "__main__":
    main()
