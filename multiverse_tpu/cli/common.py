"""Shared argparse → MultiverseConfig plumbing for the CLI drivers.

Flag names match the reference's argparse surface
(reference: code/train.py:25-138, code/test.py:22-134) so the commands
documented in TRAINING.md / TESTING.md carry over; everything lands in
the single dataclass config instead of a mutable namespace
(reference: code/pred_utils.py:70-146 `process_args`).
"""

from __future__ import annotations

import argparse
import math
import sys

from multiverse_tpu.config import MultiverseConfig


class LossBuffer:
    """Device-side per-step loss buffer for the train loops.

    A per-step scalar fetch stalls the TPU stream once per step (the
    dominant cost on remote/tunneled backends); buffering loss scalars
    on device and flushing one batched transfer every
    --loss_fetch_period steps keeps the stream full.  The NaN abort
    (reference: code/train.py:256-259) then fires within one period of
    the bad step.
    """

    def __init__(self, loss_ma, period: int, aux_mas: dict = None):
        self._ma = loss_ma
        self._period = max(1, period)
        # optional named side series (e.g. {"wd": wd_ma}) fed PER STEP
        # through the same batched transfer — the reference averages
        # wd_loss every step too (reference: code/train.py:265)
        self._aux_mas = aux_mas or {}
        self._pending: list = []   # [(step, device scalar, aux dict)]

    def put(self, step: int, loss, aux: dict = None) -> None:
        self._pending.append((step, loss, aux or {}))
        if len(self._pending) >= self._period:
            self.flush()

    def flush(self) -> None:
        if not self._pending:
            return
        import jax

        steps = [s for s, _, _ in self._pending]
        auxes = [a for _, _, a in self._pending]
        values = [float(v) for v in jax.device_get(
            [v for _, v, _ in self._pending])]
        aux_vals = jax.device_get(auxes)
        self._pending.clear()
        for s, v, a in zip(steps, values, aux_vals):
            if math.isnan(v):
                print("nan loss at step %d" % s)
                sys.exit(1)
            self._ma.put(v)
            for k, ma in self._aux_mas.items():
                if k in a:
                    ma.put(float(a[k]))


def add_model_args(parser: argparse.ArgumentParser) -> None:
    parser.add_argument("--obs_len", type=int, default=8)
    parser.add_argument("--pred_len", type=int, default=12)
    parser.add_argument("--emb_size", type=int, default=32)
    parser.add_argument("--enc_hidden_size", type=int, default=256)
    parser.add_argument("--dec_hidden_size", type=int, default=256)
    parser.add_argument("--activation_func", type=str, default="tanh",
                        help="relu/lrelu/tanh")
    parser.add_argument("--scene_conv_kernel", default=3, type=int)
    parser.add_argument("--scene_h", default=36, type=int)
    parser.add_argument("--scene_w", default=64, type=int)
    parser.add_argument("--scene_class", default=11, type=int)
    parser.add_argument("--scene_conv_dim", default=64, type=int)
    parser.add_argument("--convlstm_kernel", default=3, type=int)
    parser.add_argument("--scene_grid_strides", default="2,4")
    parser.add_argument("--use_grids", default="1,0")
    parser.add_argument("--video_h", type=int, default=1080)
    parser.add_argument("--video_w", type=int, default=1920)
    parser.add_argument("--use_gnn", action="store_true")
    parser.add_argument("--use_scene_enc", action="store_true")
    parser.add_argument("--use_single_decoder", action="store_true")
    parser.add_argument("--use_teacher_forcing", action="store_true")
    parser.add_argument("--train_w_onehot", action="store_true")
    parser.add_argument("--use_soft_grid_class", action="store_true")
    parser.add_argument("--soft_grid", default=1, type=int)
    parser.add_argument("--mask_grid_regression", action="store_true")
    parser.add_argument("--use_beam_search", action="store_true")
    parser.add_argument("--diverse_beam", action="store_true")
    parser.add_argument("--diverse_gamma", type=float, default=1.0)
    parser.add_argument("--fix_num_timestep", type=int, default=0)
    parser.add_argument("--beam_size", type=int, default=5)
    parser.add_argument("--norm_input", action="store_true",
                        help="scale scene one-hot maps to [-1,1] before "
                             "the scene CNN (train AND eval — a model "
                             "trained with this must be tested with it)")
    parser.add_argument("--compute_dtype", default="float32",
                        help="float32|bfloat16 conv/matmul compute")
    parser.add_argument("--decode_quant", default="none",
                        help="none|int8|int8a|int8_dyn — int8 MXU mode for "
                             "the fused beam-decode gate matmul "
                             "(inference fast path on bfloat16)")
    parser.add_argument("--beam_select", default="twostage",
                        choices=["twostage", "dense"],
                        help="beam successor selection: 'twostage' "
                             "(per-beam top-K then global top-K over "
                             "K*K — exact same winners/ties as dense, "
                             "no O((H*W)^2) rank pass) or 'dense' (the "
                             "full-row form)")
    parser.add_argument("--remat", action="store_true",
                        help="rematerialize encoder/decoder scan steps "
                             "in the backward (1/3 more FLOPs, O(T) "
                             "less HBM) — enables large-batch training")
    parser.add_argument("--fuse_scan_pairs",
                        action=argparse.BooleanOptionalAction,
                        default=True,
                        help="run the class/reg encoder pair (and the "
                             "decoder pair at train time) as one "
                             "lax.scan — identical math (bit-equality "
                             "tested), +1.9%% full-step training "
                             "(SEGMENTS_r05.json); "
                             "--no-fuse_scan_pairs restores the "
                             "separate scans")


def add_train_args(parser: argparse.ArgumentParser) -> None:
    parser.add_argument("--grid_loss_weight", default=1.0, type=float)
    parser.add_argument("--grid_reg_loss_weight", default=0.1, type=float)
    parser.add_argument("--wd", default=0.0001, type=float)
    parser.add_argument("--clip_gradient_norm", default=10.0, type=float)
    parser.add_argument("--optimizer", default="adadelta")
    parser.add_argument("--use_cosine_lr", action="store_true")
    parser.add_argument("--learning_rate_decay", default=0.95, type=float)
    parser.add_argument("--num_epoch_per_decay", default=2.0, type=float)
    parser.add_argument("--init_lr", default=0.2, type=float)
    parser.add_argument("--emb_lr", type=float, default=1.0)
    parser.add_argument("--batch_size", type=int, default=64)
    parser.add_argument("--num_epochs", type=int, default=100)
    parser.add_argument("--keep_prob", default=1.0, type=float)


def config_from_args(args: argparse.Namespace) -> MultiverseConfig:
    grid_kw = MultiverseConfig.parse_strides(
        args.scene_grid_strides, args.use_grids)
    kw = dict(
        obs_len=args.obs_len,
        pred_len=args.pred_len,
        emb_size=args.emb_size,
        enc_hidden_size=args.enc_hidden_size,
        dec_hidden_size=args.dec_hidden_size,
        activation=args.activation_func,
        scene_conv_kernel=args.scene_conv_kernel,
        scene_h=args.scene_h,
        scene_w=args.scene_w,
        scene_class=args.scene_class,
        scene_conv_dim=args.scene_conv_dim,
        convlstm_kernel=args.convlstm_kernel,
        video_h=args.video_h,
        video_w=args.video_w,
        use_gnn=args.use_gnn,
        use_scene_enc=args.use_scene_enc,
        use_single_decoder=args.use_single_decoder,
        use_teacher_forcing=args.use_teacher_forcing,
        train_w_onehot=args.train_w_onehot,
        use_soft_grid_class=args.use_soft_grid_class,
        soft_grid=args.soft_grid,
        mask_grid_regression=args.mask_grid_regression,
        use_beam_search=args.use_beam_search,
        diverse_beam=args.diverse_beam,
        diverse_gamma=args.diverse_gamma,
        fix_num_timestep=args.fix_num_timestep,
        beam_size=args.beam_size,
        norm_input=args.norm_input,
        compute_dtype=args.compute_dtype,
        decode_quant=getattr(args, "decode_quant", "none"),
        beam_select=getattr(args, "beam_select", "twostage"),
        remat=getattr(args, "remat", False),
        fuse_scan_pairs=getattr(args, "fuse_scan_pairs", True),
        **grid_kw,
    )
    for name in ("grid_loss_weight", "grid_reg_loss_weight", "wd",
                 "clip_gradient_norm", "optimizer", "use_cosine_lr",
                 "learning_rate_decay", "num_epoch_per_decay", "init_lr",
                 "emb_lr", "batch_size", "num_epochs", "keep_prob"):
        if hasattr(args, name):
            kw[name] = getattr(args, name)
    return MultiverseConfig(**kw).validate()
