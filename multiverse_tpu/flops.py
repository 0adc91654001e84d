"""Analytic FLOP accounting for MFU reporting.

The reference publishes no throughput or utilization numbers at all
(SURVEY.md §6); this module exists so the benches can report achieved
TFLOP/s and fraction-of-roofline as artifacts instead of prose claims.

Counts are matmul/conv multiply-adds only (2 FLOPs per MAC) of the
model's OWN mathematics — pointwise ops, softmaxes, losses and
optimizer updates are excluded, so every achieved-TFLOP/s figure
derived from these counts is a floor.  Pallas kernels are opaque to
XLA's cost analysis, which is why the accounting is analytic rather
than read off the compiled executable.

Shapes audited against: ops/convlstm.py (fused [3,3,Cin+D,4D] gate
conv), ops/pallas_decode.py (im2col gate matmul [HW, 9(E+D)]x[9(E+D),
4D], channel-first readout [HW,D]x[D,9]), ops/gnn.py (dense edges
[HW,D+Cs]x[D+Cs,HW], aggregate [HW,HW]x[HW,D]).
"""

from __future__ import annotations

from multiverse_tpu.config import MultiverseConfig


def convlstm_step_flops(h: int, w: int, cin: int, d: int) -> float:
    """One ConvLSTM cell step on one [h, w, cin] input: the fused 3x3
    gate conv over [x ⊕ h_prev] -> 4·d channels."""
    return 2.0 * h * w * 9 * (cin + d) * 4 * d


def gnn_step_flops(h: int, w: int, d: int, scene_dim: int) -> float:
    """One dense 9-neighbor graph-attention step: edge logits
    node@node.T (node = [h ⊕ scene_mean]) + attention aggregate."""
    hw = h * w
    return 2.0 * hw * hw * (d + scene_dim) + 2.0 * hw * hw * d


def readout_step_flops(h: int, w: int, d: int) -> float:
    """Channel-first h→grid-logit readout ([HW, D] x [D, 9])."""
    return 2.0 * h * w * d * 9


def _dims(cfg: MultiverseConfig):
    i = cfg.active_scales[0]
    h, w = cfg.scene_grids[i]
    return h, w, cfg.dec_hidden_size, cfg.emb_size, cfg.scene_conv_dim


def beam_decode_flops(cfg: MultiverseConfig, n_traj: int,
                      t_pred: int) -> float:
    """Total FLOPs of one diverse-beam inference batch: encoders (per
    trajectory), K-wide class decode (per beam — the folded N·K batch
    axis), greedy offset decode (per trajectory)."""
    h, w, d, e, cs = _dims(cfg)
    n_beam = n_traj * cfg.beam_size
    enc_in = cs if cfg.use_scene_enc else e
    enc = cfg.obs_len * (
        convlstm_step_flops(h, w, enc_in, d)       # class encoder
        + convlstm_step_flops(h, w, 2, d))         # offset encoder
    dec_class = convlstm_step_flops(h, w, e, d) + readout_step_flops(
        h, w, d)
    if cfg.use_gnn:
        dec_class += gnn_step_flops(h, w, d, cs if cfg.use_scene_enc
                                    else 0)
    dec_reg = convlstm_step_flops(h, w, 2, d) + readout_step_flops(
        h, w, d)
    return (n_traj * enc
            + n_beam * t_pred * dec_class
            + n_traj * t_pred * dec_reg)


def train_fwd_flops(cfg: MultiverseConfig, batch_size: int) -> float:
    """Forward FLOPs of one training step (greedy decode path: class +
    offset decoders both per example)."""
    h, w, d, e, cs = _dims(cfg)
    enc_in = cs if cfg.use_scene_enc else e
    enc = cfg.obs_len * (convlstm_step_flops(h, w, enc_in, d)
                         + convlstm_step_flops(h, w, 2, d))
    dec_class = convlstm_step_flops(h, w, e, d) + readout_step_flops(
        h, w, d)
    if cfg.use_gnn:
        dec_class += gnn_step_flops(h, w, d, cs if cfg.use_scene_enc
                                    else 0)
    dec_reg = convlstm_step_flops(h, w, 2, d) + readout_step_flops(
        h, w, d)
    return batch_size * (enc + cfg.pred_len * (dec_class + dec_reg))


def train_step_flops(cfg: MultiverseConfig, batch_size: int) -> float:
    """Forward + backward, with the standard 3x-forward convention for
    matmul/conv backward passes (grad wrt inputs + grad wrt weights)."""
    return 3.0 * train_fwd_flops(cfg, batch_size)
