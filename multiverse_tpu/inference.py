"""Multi-future inference: batched diverse-beam decode over Forking
Paths observation trajectories.

Rebuild of reference: code/multifuture_inference.py. The reference runs
one `sess.run` per trajectory at batch size 1 (:460-472); here all
trajectories decode in static-shape batches — beams fold into the batch
axis for every conv (MXU-sized), trajectories shard over the device
mesh, and variable per-trajectory prediction lengths are handled by
decoding to the batch max and freezing finished samples (the per-sample
results are sliced back to each trajectory's own length).

Output files keep the reference pickle contracts so the reference
evaluators run unmodified:
    output_file: {traj_id: [num_out][T][2]}          (:519-526)
    save_prob_file: {traj_id: (beam_logits [1, K, T, H*W],
                               beam_logprobs [1, K])} (:521-523, 528-530)
"""

from __future__ import annotations

import glob
import os
import pickle
import time
from collections import OrderedDict
from typing import Callable, Dict, List, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from multiverse_tpu.config import MultiverseConfig
from multiverse_tpu.data import scene as scene_lib
from multiverse_tpu.geometry import (
    grid_centers,
    one_hot_grid,
    rasterize_traj_np,
)
from multiverse_tpu.models import Batch
from multiverse_tpu.models.beam_search import BeamOutputs, diverse_beam_search
from multiverse_tpu.models.multiverse import (
    greedy_decode,
    scene_encode,
)
from multiverse_tpu.ops import convlstm_scan
from multiverse_tpu.ops.layers import get_activation
from multiverse_tpu.ops import conv2d


# ----------------------------------------------------------- forward


def beam_forward(
    params: dict,
    batch: Batch,
    cfg: MultiverseConfig,
    T_pred: Optional[int] = None,
) -> Tuple[BeamOutputs, jnp.ndarray]:
    """Encoders + diverse beam decode + greedy regression decode.

    The reference builds this graph in `PredictionModelInference`
    (reference: code/multifuture_inference.py:301-385 over
    code/pred_models.py:123-308): the class head decodes K beams; the
    offset head decodes once greedily, and each beam's trajectory is
    reconstructed as center[beam_cell] + reg[t, beam_cell].

    Returns (BeamOutputs, reg_out [N, T, h, w, 2]) for the single
    active scale.
    """
    cfg.validate()
    T = T_pred or cfg.pred_len
    compute_dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else None
    act = get_activation(cfg.activation)
    N, _, T_obs = batch.obs_grid_class.shape
    i = cfg.active_scales[0]
    h, w = cfg.scene_grids[i]
    sp = params["scales"][str(i)]

    scene_convs = []
    if cfg.use_scene_enc:
        scene_convs = scene_encode(
            params, batch.scene_feat, batch.obs_scene, cfg, compute_dtype)

    obs_onehot = one_hot_grid(batch.obs_grid_class[:, i], h, w)
    if cfg.use_scene_enc:
        enc_in = scene_convs[i] * obs_onehot
    else:
        flat = obs_onehot.reshape(N * T_obs, h, w, 1)
        emb = conv2d(sp["enc_grid_emb"], flat, activation=act,
                     compute_dtype=compute_dtype)
        enc_in = emb.reshape(N, T_obs, h, w, -1)

    _, enc_last = convlstm_scan(sp["enc_class"], enc_in,
                                compute_dtype=compute_dtype)

    scene_mean = None
    if cfg.use_scene_enc and cfg.use_gnn:
        scene_mean = jnp.mean(scene_convs[i], axis=1)

    beam = diverse_beam_search(
        sp, cfg,
        first_input=obs_onehot[:, -1],
        init_state=enc_last,
        T_pred=T,
        pred_length=batch.pred_length,
        scene_mean=scene_mean,
        save_states=cfg.use_single_decoder,
        compute_dtype=compute_dtype,
    )

    reg_out = _reg_decode(params, batch, cfg, beam, T, compute_dtype)
    return beam, reg_out


def _reg_decode(params, batch, cfg, beam, T, compute_dtype):
    N = batch.obs_grid_class.shape[0]
    i = cfg.active_scales[0]
    h, w = cfg.scene_grids[i]
    sp = params["scales"][str(i)]
    if cfg.use_single_decoder:
        # regression read out of the gathered best-beam decoder states
        # (reference: code/pred_models.py:296-305)
        D = beam.states.shape[-1]
        best_states = beam.states[:, 0].reshape(N * T, h, w, D)
        reg = conv2d(sp["h2g_single"], best_states,
                     compute_dtype=compute_dtype)
        reg_out = reg.reshape(N, T, h, w, 2)
    else:
        _, enc_reg_last = convlstm_scan(
            sp["enc_reg"], batch.obs_grid_target_all[0],
            compute_dtype=compute_dtype)
        reg_out, _ = greedy_decode(
            sp, cfg,
            first_input=batch.obs_grid_target_all[0][:, -1],
            init_state=enc_reg_last,
            T_pred=T,
            emb_name="dec_reg_emb",
            cell_name="dec_reg",
            h2g_name="h2g_reg",
            use_gnn=False,
            feedback="raw",
            compute_dtype=compute_dtype,
        )
    return reg_out


def greedy_forward(
    params: dict,
    batch: Batch,
    cfg: MultiverseConfig,
    T_pred: Optional[int] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Encoders + greedy class decode + greedy regression decode.

    The `--greedy` inference path (reference:
    code/multifuture_inference.py:483-498 over the grid_decoder at
    code/pred_models.py:311-471). Returns
    (class logits [N, T, h, w, 1], reg [N, T, h, w, 2]).
    """
    cfg = cfg.replace(use_beam_search=False).validate()
    T = T_pred or cfg.pred_len
    compute_dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else None
    act = get_activation(cfg.activation)
    N, _, T_obs = batch.obs_grid_class.shape
    i = cfg.active_scales[0]
    h, w = cfg.scene_grids[i]
    sp = params["scales"][str(i)]

    scene_convs = []
    if cfg.use_scene_enc:
        scene_convs = scene_encode(
            params, batch.scene_feat, batch.obs_scene, cfg, compute_dtype)

    obs_onehot = one_hot_grid(batch.obs_grid_class[:, i], h, w)
    if cfg.use_scene_enc:
        enc_in = scene_convs[i] * obs_onehot
    else:
        flat = obs_onehot.reshape(N * T_obs, h, w, 1)
        emb = conv2d(sp["enc_grid_emb"], flat, activation=act,
                     compute_dtype=compute_dtype)
        enc_in = emb.reshape(N, T_obs, h, w, -1)
    _, enc_last = convlstm_scan(sp["enc_class"], enc_in,
                                compute_dtype=compute_dtype)
    scene_mean = None
    if cfg.use_scene_enc and cfg.use_gnn:
        scene_mean = jnp.mean(scene_convs[i], axis=1)

    logits, states = greedy_decode(
        sp, cfg,
        first_input=obs_onehot[:, -1],
        init_state=enc_last,
        T_pred=T,
        emb_name="dec_class_emb",
        cell_name="dec_class",
        h2g_name="h2g_class",
        use_gnn=cfg.use_gnn,
        scene_mean=scene_mean,
        feedback="onehot",
        compute_dtype=compute_dtype,
        allow_fused=True,  # inference-only path, never under grad
    )
    if cfg.use_single_decoder:
        D = states.shape[-1]
        flat = states.reshape(N * T, h, w, D)
        reg = conv2d(sp["h2g_single"], flat, compute_dtype=compute_dtype)
        reg_out = reg.reshape(N, T, h, w, 2)
    else:
        reg_out = _reg_decode(params, batch, cfg, None, T, compute_dtype)
    return logits, reg_out


# ------------------------------------------------------------- inputs


class MultifutureInputs(NamedTuple):
    """Host-side arrays for one inference run (all trajectories)."""

    traj_ids: List[str]
    obs_traj: np.ndarray          # [N, T_obs, 2] float32
    obs_grid_class: np.ndarray    # [N, S, T_obs] int32
    obs_grid_target: List[np.ndarray]  # per scale [N, T_obs, h, w, 2]
    obs_scene: np.ndarray         # [N, T_obs] int32
    scene_feat: np.ndarray        # [F, SH, SW, C] uint8
    pred_lengths: np.ndarray      # [N] int32 (max over GT futures)


def load_multifuture_inputs(
    traj_path: str,
    multifuture_path: str,
    scene_feat_path: str,
    scene_id2name: str,
    cfg: MultiverseConfig,
) -> MultifutureInputs:
    """Load Forking Paths obs TSVs + per-frame scene seg npys.

    reference: code/multifuture_inference.py:158-272 `get_inputs`
    (rasterization :115-156, scene one-hot :233-260 — here the per-pixel
    loops are one vectorized table lookup).
    """
    oldid2new, num_classes = scene_lib.load_scene_id_map(scene_id2name)
    table = scene_lib.remap_table(oldid2new)

    traj_files = sorted(glob.glob(os.path.join(traj_path, "*.txt")))
    traj_ids, obs_list, cls_list, tgt_list = [], [], [], []
    scene_idx_list, pred_len_list = [], []
    scene_rows: List[np.ndarray] = []

    for traj_file in traj_files:
        traj_id = os.path.splitext(os.path.basename(traj_file))[0]
        _, _, x_agent_pid, _ = traj_id.split("_")
        data = np.loadtxt(traj_file, delimiter="\t", dtype=np.float32)
        frame_idxs = np.unique(data[:, 0])
        obs = data[data[:, 1] == float(int(x_agent_pid)), 2:]
        if len(obs) != cfg.obs_len:
            raise ValueError(
                f"{traj_id}: obs length {len(obs)} != {cfg.obs_len}")

        cls, tgt = rasterize_traj_np(
            obs, cfg.video_h, cfg.video_w, cfg.scene_grids)

        idxs = np.zeros(cfg.obs_len, np.int32)
        for t, fidx in enumerate(frame_idxs[:cfg.obs_len]):
            npy = os.path.join(
                scene_feat_path, traj_id,
                "%s_F_%08d.npy" % (traj_id, int(fidx)))
            idxs[t] = len(scene_rows)
            scene_rows.append(np.load(npy))

        with open(os.path.join(
                multifuture_path, "%s.p" % traj_id), "rb") as f:
            gt = pickle.load(f)
        pred_len = max(
            len(gt[fid]["x_agent_traj"]) for fid in gt)

        traj_ids.append(traj_id)
        obs_list.append(obs)
        cls_list.append(cls)
        tgt_list.append(tgt)
        scene_idx_list.append(idxs)
        pred_len_list.append(pred_len)

    class_maps = np.stack(scene_rows)  # [F, SH, SW]
    scene_feat = scene_lib.scene_class_map_to_onehot(
        class_maps, table, num_classes)

    num_scales = cfg.num_scales
    return MultifutureInputs(
        traj_ids=traj_ids,
        obs_traj=np.stack(obs_list),
        obs_grid_class=np.stack(cls_list),
        obs_grid_target=[
            np.stack([t[i] for t in tgt_list]) for i in range(num_scales)],
        obs_scene=np.stack(scene_idx_list),
        scene_feat=scene_feat,
        pred_lengths=np.asarray(pred_len_list, np.int32),
    )


def synthesize_multifuture_inputs(
    cfg: MultiverseConfig,
    num_traj: int,
    seed: int = 0,
    max_pred_len: int = 25,
) -> MultifutureInputs:
    """Random-walk inputs with the exact shapes of a real run — used by
    tests and by bench.py (no dataset ships with either repo)."""
    rnd = np.random.RandomState(seed)
    start = rnd.uniform(
        [cfg.video_w * 0.2, cfg.video_h * 0.2],
        [cfg.video_w * 0.8, cfg.video_h * 0.8],
        size=(num_traj, 1, 2))
    steps = rnd.normal(0.0, 25.0, size=(num_traj, cfg.obs_len, 2))
    obs = (start + np.cumsum(steps, axis=1)).astype(np.float32)
    obs[..., 0] = np.clip(obs[..., 0], 1.0, cfg.video_w - 1.0)
    obs[..., 1] = np.clip(obs[..., 1], 1.0, cfg.video_h - 1.0)

    cls = np.zeros((num_traj, cfg.num_scales, cfg.obs_len), np.int32)
    tgts = [
        np.zeros((num_traj, cfg.obs_len, h, w, 2), np.float32)
        for (h, w) in cfg.scene_grids
    ]
    for n in range(num_traj):
        c, t = rasterize_traj_np(
            obs[n], cfg.video_h, cfg.video_w, cfg.scene_grids)
        cls[n] = c
        for i in range(cfg.num_scales):
            tgts[i][n] = t[i]

    F = max(1, num_traj // 2)
    scene_feat = np.zeros(
        (F, cfg.scene_h, cfg.scene_w, cfg.scene_class), np.uint8)
    labels = rnd.randint(0, cfg.scene_class,
                         size=(F, cfg.scene_h, cfg.scene_w))
    scene_feat[
        np.arange(F)[:, None, None],
        np.arange(cfg.scene_h)[None, :, None],
        np.arange(cfg.scene_w)[None, None, :],
        labels] = 1
    obs_scene = rnd.randint(
        0, F, size=(num_traj, cfg.obs_len)).astype(np.int32)
    pred_lengths = rnd.randint(
        cfg.pred_len, max_pred_len + 1, size=num_traj).astype(np.int32)
    return MultifutureInputs(
        traj_ids=["scene_%04d_%d_cam1" % (n, n) for n in range(num_traj)],
        obs_traj=obs,
        obs_grid_class=cls,
        obs_grid_target=tgts,
        obs_scene=obs_scene,
        scene_feat=scene_feat,
        pred_lengths=pred_lengths,
    )


# --------------------------------------------------------------- driver


def make_batch(
    inputs: MultifutureInputs,
    idxs: np.ndarray,
    cfg: MultiverseConfig,
) -> Batch:
    """Slice a static-shape Batch for the given trajectory indices.

    The scene table is gathered per batch: only the ≤ n·T_obs rows the
    batch references ship to the device (a full Forking Paths run's
    table is ~150 MB of per-trajectory frames — re-feeding all of it
    each step would dominate wall-clock on the slow host→device link),
    remapped to first-seen order by the native packer and zero-padded
    to a FIXED n·T_obs rows so the jitted step compiles once."""
    from multiverse_tpu import native

    scale0 = cfg.active_scales[0]
    obs_scene_old = inputs.obs_scene[idxs]
    cap = int(obs_scene_old.size)
    new_idx, old_rows, _ = native.remap_first_seen(
        obs_scene_old.astype(np.int32), cap,
        max_id=len(inputs.scene_feat) - 1)
    table = native.gather_rows(inputs.scene_feat, old_rows, cap)
    return Batch(
        obs_grid_class=inputs.obs_grid_class[idxs],
        obs_grid_target_all=(inputs.obs_grid_target[scale0][idxs],),
        obs_scene=new_idx,
        scene_feat=table,
        pred_length=inputs.pred_lengths[idxs],
    )


def reconstruct_beam_trajs(
    beam_ids: jnp.ndarray,      # [N, K, T] int32 grid cells
    reg_out: jnp.ndarray,       # [N, T, h, w, 2] offset maps
    centers: jnp.ndarray,       # [h*w, 2]
    center_only: bool = False,
) -> jnp.ndarray:
    """Beam cells + offset maps → [N, K, T, 2] absolute points, ON
    DEVICE (center[beam_cell] + reg[t, beam_cell], reference:
    code/multifuture_inference.py:499-517).  Shared by the serving
    engine and the batch driver: fetching points (~320 KB at full
    size) instead of the offset maps (~7 MB) plus a host gather loop
    keeps the slow host link off the critical path."""
    N, K, T = beam_ids.shape
    HW = reg_out.shape[2] * reg_out.shape[3]
    pts = jnp.asarray(centers)[beam_ids]             # [N, K, T, 2]
    if center_only:
        return pts.astype(jnp.float32)
    reg = reg_out.reshape(N, T, HW, 2)
    idx = jnp.moveaxis(beam_ids, 1, 2)               # [N, T, K]
    off = jnp.take_along_axis(reg, idx[..., None], axis=2)
    return (pts + jnp.moveaxis(off, 1, 2)).astype(jnp.float32)


def reconstruct_greedy_trajs(
    class_logits: jnp.ndarray,  # [N, T, h, w, 1]
    reg_out: jnp.ndarray,       # [N, T, h, w, 2]
    centers: jnp.ndarray,
    center_only: bool = False,
) -> jnp.ndarray:
    """Argmax cells + offsets → [N, T, 2] absolute points, on device."""
    N, T = class_logits.shape[:2]
    HW = class_logits.shape[2] * class_logits.shape[3]
    sel = jnp.argmax(class_logits.reshape(N, T, HW), axis=-1)
    pts = jnp.asarray(centers)[sel]                  # [N, T, 2]
    if center_only:
        return pts.astype(jnp.float32)
    reg = reg_out.reshape(N, T, HW, 2)
    off = jnp.take_along_axis(reg, sel[..., None, None], axis=2)[:, :, 0]
    return (pts + off).astype(jnp.float32)


# jitted-step cache: a fresh jax.jit closure per call would re-trace
# the decode graph on EVERY run_multifuture_inference call (~seconds
# of host work, plus a remote executable-cache round-trip on tunneled
# backends — measured ~10 s per call on the axon link even with the
# HLO compile itself cached).  Production callers invoke the driver
# repeatedly (periodic re-evals, rolling inference jobs), so the traced
# executable is memoized on everything the closure bakes in: the full
# config (repr — a dataclass repr covers every field incl. grid/video
# dims that shape centers_j), decode length, and the output gating.
# Params/batches stay per-call ARGUMENTS, so weight updates never need
# a cache entry.  Bounded FIFO (tests sweep many tiny configs).
_STEP_CACHE: "OrderedDict[tuple, Callable]" = OrderedDict()
_STEP_CACHE_MAX = 8


def _cached_step(key: tuple, build: Callable[[], Callable]) -> Callable:
    fn = _STEP_CACHE.get(key)
    if fn is None:
        fn = build()
        _STEP_CACHE[key] = fn
        while len(_STEP_CACHE) > _STEP_CACHE_MAX:
            _STEP_CACHE.popitem(last=False)
    else:
        _STEP_CACHE.move_to_end(key)
    return fn


def run_multifuture_inference(
    params: dict,
    inputs: MultifutureInputs,
    cfg: MultiverseConfig,
    batch_size: int = 16,
    T_max: Optional[int] = None,
    greedy: bool = False,
    center_only: bool = False,
    need_prob: bool = True,
    prob_fetch_dtype: str = "float32",
    timings: Optional[dict] = None,
) -> Tuple[Dict[str, list], Dict[str, tuple]]:
    """Decode every trajectory; return (output_data, beam_prob) in the
    reference pickle formats (reference:
    code/multifuture_inference.py:475-530).

    The host link is kept off the critical path: trajectories
    reconstruct ON DEVICE (:func:`reconstruct_beam_trajs` — points are
    ~320 KB/batch vs ~7 MB of offset maps plus a host gather loop),
    and need_prob=False additionally skips COMPUTING and fetching the
    [N, K, T, H·W] beam-logit tensor (the .prob.p payload, ~73 MB per
    batch at full size; gating it out of the jitted step also lets XLA
    drop the scan's logit accumulation entirely) — pass False unless a
    --save_prob_file output is requested (beam_prob then returns
    empty, as it always does under greedy=True, which has no beams).

    prob_fetch_dtype="float16" casts the beam-logit tensor on device
    before the fetch and back to f32 on the host, halving the .prob.p
    payload's bytes (the path is transfer-bound; the win is
    link-dependent — a compressing tunnel sees little, an uncompressed
    PCIe link the full 2x — STATUS.md §f16 prob fetch); the pickle
    contract stays f32.  The logits are
    bounded class scores (|logit|max ~21 on a trained checkpoint, f16
    rounding error <= 7.8e-3), so the round-trip perturbs the
    evaluator's grid NLL by ~1e-5 (measured on a full-size synthetic
    checkpoint, STATUS.md §f16 prob fetch) — opt-in because the stored
    values are no longer bit-identical to the on-device f32 path.

    timings: optional dict the driver accumulates its per-phase wall
    time into — "build_s" (host batch packing + async dispatch),
    "fetch_s" (the blocking device_get: residual device compute + the
    wire), "fetch_bytes" (raw bytes crossing the link), "pack_s" (host
    upcast + pickle-format assembly), "batches".  Used by
    bench_infer.py to itemize the transfer-bound .prob.p path.
    """
    if prob_fetch_dtype not in ("float32", "float16"):
        raise ValueError(
            f"prob_fetch_dtype must be float32|float16, got "
            f"{prob_fetch_dtype!r}")
    cfg = cfg.replace(use_beam_search=not greedy).validate()
    i = cfg.active_scales[0]
    h, w = cfg.scene_grids[i]
    centers = grid_centers(cfg.video_h, cfg.video_w, h, w).reshape(-1, 2)
    N = len(inputs.traj_ids)
    T = T_max or int(inputs.pred_lengths.max())
    K = cfg.beam_size

    centers_j = jnp.asarray(centers, jnp.float32)
    if greedy:
        def _greedy_step(p, b):
            logits, reg_out = greedy_forward(p, b, cfg, T_pred=T)
            return reconstruct_greedy_trajs(
                logits, reg_out, centers_j, center_only)

        step_fn = _cached_step(
            (repr(cfg), T, "greedy", center_only),
            lambda: jax.jit(_greedy_step))
    else:
        # float16 casts on device (halves the wire bytes); float32
        # fetches the logits in their NATIVE dtype — on the bf16 fast
        # path that is bf16, upcast exactly to f32 on the host, so the
        # default fetch never pays a device-side upcast's 2x bytes
        fetch_dt = jnp.float16 if prob_fetch_dtype == "float16" else None

        def _beam_step(p, b):
            beam, reg_out = beam_forward(p, b, cfg, T_pred=T)
            trajs = reconstruct_beam_trajs(
                beam.ids, reg_out, centers_j, center_only)
            if not need_prob:
                # gated OUT of the jitted graph: XLA then drops the
                # scan's [B, K, T, HW] logit accumulation instead of
                # materializing ~73 MB/batch nobody fetches
                return trajs, beam.logprobs, None
            lg = beam.logits if fetch_dt is None \
                else beam.logits.astype(fetch_dt)
            return trajs, beam.logprobs, lg

        step_fn = _cached_step(
            (repr(cfg), T, "beam", center_only, need_prob,
             prob_fetch_dtype),
            lambda: jax.jit(_beam_step))

    output_data: Dict[str, list] = {}
    beam_prob: Dict[str, tuple] = {}
    if timings is not None:
        for k in ("build_s", "fetch_s", "fetch_bytes", "pack_s",
                  "batches"):
            timings.setdefault(k, 0.0)

    def resolve(idxs, out):
        """Fetch one dispatched batch and write its trajectories."""
        t0 = time.perf_counter()
        if greedy:
            trajs = np.asarray(jax.device_get(out))   # [B, T, 2]
            logprobs = logits = None
        else:
            trajs, logprobs, logits = out
            if need_prob:
                trajs, logprobs, logits = jax.device_get(
                    (trajs, logprobs, logits))
                if timings is not None:
                    timings["fetch_s"] += time.perf_counter() - t0
                    timings["fetch_bytes"] += (
                        trajs.nbytes + logprobs.nbytes + logits.nbytes)
                    t0 = time.perf_counter()
                # contract stays f32 regardless of the fetch dtype
                # (bf16/f16 -> f32 upcast on the host)
                logits = np.asarray(logits, np.float32)
            else:
                trajs, logprobs = jax.device_get((trajs, logprobs))
                logits = None              # never computed (see step)
            trajs = np.asarray(trajs)                 # [B, K, T, 2]
        if timings is not None and (greedy or not need_prob):
            timings["fetch_s"] += time.perf_counter() - t0
            timings["fetch_bytes"] += trajs.nbytes + (
                logprobs.nbytes if logprobs is not None else 0)
            t0 = time.perf_counter()

        for a, n in enumerate(idxs):
            traj_id = inputs.traj_ids[n]
            # a caller-supplied T_max below the longest GT future
            # truncates those trajectories instead of mis-reshaping
            pred_len = min(int(inputs.pred_lengths[n]), T)
            if greedy:
                pts = trajs[a, :pred_len]
                out_trajs = [list(pts) for _ in range(K)]
            else:
                out_trajs = [list(trajs[a, j, :pred_len])
                             for j in range(K)]
            output_data[traj_id] = out_trajs
            if logits is not None:
                beam_prob[traj_id] = (
                    np.asarray(logits)[a:a + 1, :, :pred_len],
                    np.asarray(logprobs)[a:a + 1],
                )
        if timings is not None:
            timings["pack_s"] += time.perf_counter() - t0
            timings["batches"] += 1

    # pipeline depth 2 with a dedicated resolver thread (the offline
    # analog of the serving engine's batcher/resolver split): the main
    # thread builds + async-dispatches device batches while the worker
    # blocks on device_get and packs — the fetch is socket IO and the
    # packing numpy copies, both of which release the GIL, so on a
    # one-core host the build no longer serializes behind the ~7 s
    # .prob.p wire fetch (this was the round-4 "~27% below the link
    # bound" gap: host per batch was build + fetch + pack in sequence)
    from concurrent.futures import ThreadPoolExecutor

    futures: list = []
    with ThreadPoolExecutor(max_workers=1) as pool:
        for lo in range(0, N, batch_size):
            t0 = time.perf_counter()
            idxs = np.arange(lo, min(lo + batch_size, N))
            pad = batch_size - len(idxs)
            padded = np.concatenate([idxs, np.full(pad, idxs[-1])]) \
                if pad else idxs
            batch = make_batch(inputs, padded, cfg)
            futures.append(pool.submit(resolve, idxs,
                                       step_fn(params, batch)))
            if timings is not None:
                timings["build_s"] += time.perf_counter() - t0
            # bound in-flight device batches (and their host buffers)
            # at 2, like the round-2 inline pipeline
            if len(futures) >= 2:
                futures.pop(0).result()
        for f in futures:
            f.result()
    return output_data, beam_prob


def save_outputs(
    output_data: Dict[str, list],
    beam_prob: Dict[str, tuple],
    output_file: str,
    save_prob_file: Optional[str] = None,
) -> None:
    if save_prob_file is not None and not beam_prob:
        # a silently empty .prob.p (greedy decode, or need_prob=False)
        # would only fail downstream in the NLL evaluator, hours after
        # the run — refuse up front instead (the reference errors out
        # in this combination too, reference:
        # code/multifuture_inference.py:475-530 beam-only prob writes)
        raise ValueError(
            "save_prob_file requested but beam_prob is empty — the "
            ".prob.p contract needs beam search (not greedy) and "
            "need_prob=True")
    os.makedirs(os.path.dirname(os.path.abspath(output_file)), exist_ok=True)
    with open(output_file, "wb") as f:
        pickle.dump(output_data, f)
    if save_prob_file is not None:
        os.makedirs(os.path.dirname(os.path.abspath(save_prob_file)),
                    exist_ok=True)
        with open(save_prob_file, "wb") as f:
            pickle.dump(beam_prob, f)
