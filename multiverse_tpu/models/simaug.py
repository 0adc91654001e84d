"""SimAug (ECCV'20): adversarial-feature + multi-view-mixup training so
a model trained only on simulation transfers to real cameras.

TPU-first rebuild of the SimAug training machinery
(reference: SimAug/code/pred_models.py):

* the white-box FGSM/PGD attack on the scene-semantic input is one
  `jax.grad` w.r.t. the input (the reference re-enters its TF1 graph
  under AUTO_REUSE and runs a `tf.while_loop` attack,
  reference: :60-172);
* the M-view fan-out folds views into the batch axis — the attack
  forward runs all N·M views in one MXU-sized pass
  (reference: :346-470 builds an N·M tower);
* per-view losses, top-k view ranking, Beta mixup, and the focal
  weight are a few lines of pure jnp (reference: :456-540);
* everything is a pure function of (params, batch, rng) — no
  stop_gradient bookkeeping is needed beyond the attack's own
  `lax.stop_gradient`.

The published algorithm (`--multiview_exp 3`, SimAug/TRAINING.md):
attack the current view's scene features toward each of the M other
views' trajectories, take the adversarial features of the hardest view,
mix them Beta(α,α) with the *clean* features of a selected view, mix
the grid one-hot labels with the same weight (encoder input and CE
targets), and optionally focal-weight the loss by attack difficulty.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from multiverse_tpu.config import MultiverseConfig
from multiverse_tpu.geometry import one_hot_grid
from multiverse_tpu.models.multiverse import greedy_decode
from multiverse_tpu.ops import conv2d, convlstm_scan
from multiverse_tpu.ops.layers import get_activation, l2_weight_decay
import optax


@dataclasses.dataclass(frozen=True)
class SimAugConfig(MultiverseConfig):
    """MultiverseConfig + SimAug training knobs
    (reference: SimAug/code/train.py:109-144)."""

    adv_train: bool = False
    adv_epsilon: float = 0.1
    adv_step_size: float = 0.001
    adv_num_iter: int = 30
    adv_start_from_clean_prob: float = 0.0
    adv_use_fgsm: bool = False
    # norm_input lives on the BASE MultiverseConfig (the [-1,1] scene
    # scaling applies at eval/inference time too — see config.py)
    norm_feat: bool = False
    standard_aug: bool = False
    use_mixup: bool = False
    mixup_alpha: float = 1.0
    mixup_mix_adv: bool = False
    multiview_train: bool = False
    multiview_max_num: int = 3
    multiview_exp: int = 3
    multiview_random: bool = False
    multiview_max_weight_for_first: bool = False
    multiview_use_adv_for_loss: bool = False
    double_weighting: bool = False
    fl_gamma: float = 1.0

    def validate(self) -> "SimAugConfig":
        super().validate()
        if (self.adv_train or self.multiview_train) \
                and sum(self.use_grids) != 1:
            raise ValueError("adv/multiview training needs exactly one "
                             "active grid scale")
        if not self.use_scene_enc:
            # tower_forward convolves the raw scene features
            # unconditionally — SimAug's model has no scene-enc-off
            # mode (the reference fork comments the flag out,
            # reference: SimAug/code/train.py:97) and init_params only
            # creates the scene_conv pyramid when use_scene_enc is set
            raise ValueError(
                "SimAug training requires use_scene_enc=True "
                "(the SimAug tower always convolves the scene input)")
        return self


class MultiviewBatch(NamedTuple):
    """Training batch with the M extra camera views of each agent.

    Built by :func:`multiverse_tpu.data.multiview.attach_multiview`.
    (The reference attaches a dict-of-lists "extra" per example,
    reference: SimAug/code/pred_utils.py:330-361 — note its view
    indexing bug `data[...][j]` where `j` enumerates 0..M-1 instead of
    the agent's actual view indices; this rebuild implements the
    intended grouping.)
    """

    obs_grid_class: jnp.ndarray        # [N, S, T_obs] int32
    obs_grid_target: jnp.ndarray       # [N, T_obs, h, w, 2] active scale
    obs_scene: jnp.ndarray             # [N, T_obs] int32
    scene_feat: jnp.ndarray            # [F, SH, SW, C]
    pred_grid_class: jnp.ndarray       # [N, S, T_pred] int32
    pred_grid_target: jnp.ndarray      # [N, T_pred, h, w, 2]
    obs_grid_class_extra: Optional[jnp.ndarray] = None   # [N, M, T_obs]
    pred_grid_class_extra: Optional[jnp.ndarray] = None  # [N, M, T_pred]
    obs_scene_extra: Optional[jnp.ndarray] = None        # [N, M, T_obs]


class MixInfo(NamedTuple):
    beta_weight: jnp.ndarray       # [] mixup weight for the adv feature
    selected_idx: jnp.ndarray      # [N] which extra view was mixed in
    focal_weight: jnp.ndarray      # [N] (1 - exp(-hardest loss))^γ


# ------------------------------------------------------------ forward


def tower_forward(
    params: dict,
    scene_input: jnp.ndarray,      # [N, T_obs, SH, SW, C] float
    obs_onehot: jnp.ndarray,       # [N, T_obs, h, w, 1] (may be mixed)
    obs_reg: jnp.ndarray,          # [N, T_obs, h, w, 2]
    cfg: SimAugConfig,
    T_pred: Optional[int] = None,
    dropout_rng: Optional[jax.Array] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Forward pass from raw scene features (single active scale).

    Equivalent of the reference's re-enterable `build_tower`
    (reference: SimAug/code/pred_models.py:544-720): scene conv
    pyramid → scene⊙one-hot masked encoder → GNN-attended greedy class
    decode + offset decode.  Taking `scene_input` as an explicit arg is
    what makes the attack a plain `jax.grad`.

    ``dropout_rng`` enables the train-time ConvLSTM input dropout when
    ``cfg.keep_prob < 1`` (the SimAug towers wrap all four cells in
    DropoutWrapper, reference: SimAug/code/pred_models.py:555-664 —
    dropout is live inside the attack towers too, reproduced by
    threading a key through every tower pass at train time).
    """
    T = T_pred or cfg.pred_len
    compute_dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else None
    act = get_activation(cfg.activation)
    N, T_obs = scene_input.shape[:2]
    i = cfg.active_scales[0]
    h, w = cfg.scene_grids[i]
    sp = params["scales"][str(i)]

    if cfg.keep_prob >= 1.0:
        dropout_rng = None

    def site_rng(site: int):
        if dropout_rng is None:
            return None
        return jax.random.fold_in(dropout_rng, site)

    feats = scene_input.reshape((N * T_obs,) + scene_input.shape[2:])
    scene_convs = []
    for k in range(cfg.num_scales):
        feats = conv2d(params[f"scene_conv{k + 1}"], feats, stride=2,
                       activation=act, compute_dtype=compute_dtype)
        hh, ww = cfg.scene_grids[k]
        scene_convs.append(
            feats.reshape(N, T_obs, hh, ww, cfg.scene_conv_dim))

    enc_in = scene_convs[i] * obs_onehot
    _, enc_last = convlstm_scan(sp["enc_class"], enc_in,
                                compute_dtype=compute_dtype,
                                remat=cfg.remat,
                                keep_prob=cfg.keep_prob,
                                dropout_rng=site_rng(0))
    _, enc_reg_last = convlstm_scan(sp["enc_reg"], obs_reg,
                                    compute_dtype=compute_dtype,
                                    remat=cfg.remat,
                                    keep_prob=cfg.keep_prob,
                                    dropout_rng=site_rng(1))

    scene_mean = jnp.mean(scene_convs[i], axis=1) if cfg.use_gnn else None

    logits, _ = greedy_decode(
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
        keep_prob=cfg.keep_prob,
        dropout_rng=site_rng(2),
    )
    reg, _ = greedy_decode(
        sp, cfg,
        first_input=obs_reg[:, -1],
        init_state=enc_reg_last,
        T_pred=T,
        emb_name="dec_reg_emb",
        cell_name="dec_reg",
        h2g_name="h2g_reg",
        use_gnn=False,
        feedback="raw",
        compute_dtype=compute_dtype,
        keep_prob=cfg.keep_prob,
        dropout_rng=site_rng(3),
    )
    return logits, reg


def _per_example_ce(
    params: dict,
    scene_input: jnp.ndarray,
    obs_onehot: jnp.ndarray,
    obs_reg: jnp.ndarray,
    labels: jnp.ndarray,           # [N, T_pred] int32
    cfg: SimAugConfig,
    dropout_rng: Optional[jax.Array] = None,
) -> jnp.ndarray:
    """Mean-over-time CE of the class head per example, [N]."""
    i = cfg.active_scales[0]
    h, w = cfg.scene_grids[i]
    logits, _ = tower_forward(
        params, scene_input, obs_onehot, obs_reg, cfg,
        T_pred=labels.shape[1], dropout_rng=dropout_rng)
    logits = logits.reshape(labels.shape[0], labels.shape[1], h * w)
    ce = optax.softmax_cross_entropy_with_integer_labels(logits, labels)
    return ce.mean(axis=1)


# -------------------------------------------------------------- attack


def _start_adv(rng: jax.Array, feature: jnp.ndarray,
               cfg: SimAugConfig) -> jnp.ndarray:
    """Random-init attack start (reference:
    SimAug/code/pred_models.py:76-89): uniform ±ε noise, kept with
    probability (1 - adv_start_from_clean_prob)."""
    if cfg.adv_start_from_clean_prob >= 1.0:
        return feature
    k1, k2 = jax.random.split(rng)
    noise = jax.random.uniform(
        k1, feature.shape, feature.dtype,
        -cfg.adv_epsilon, cfg.adv_epsilon)
    if cfg.adv_start_from_clean_prob > 0:
        keep = (jax.random.uniform(k2, ()) >
                cfg.adv_start_from_clean_prob).astype(feature.dtype)
        noise = noise * keep
    return feature + noise


def _attack_step(params, adv, obs_onehot, obs_reg, target, cfg,
                 step_size, lower, upper, dropout_rng=None):
    """One signed-gradient step toward `target` + ε-ball/value clip
    (reference: SimAug/code/pred_models.py:91-130 `one_step_attack`)."""
    return _attack_step_with_loss(
        params, adv, obs_onehot, obs_reg, target, cfg,
        step_size, lower, upper, dropout_rng)[0]


def _attack_step_with_loss(params, adv, obs_onehot, obs_reg, target,
                           cfg, step_size, lower, upper,
                           dropout_rng=None):
    """One signed-gradient step PLUS the per-example CE at `adv`, both
    from a single forward+backward (the reference derives its view-
    ranking loss and the attack gradient from the same tower pass; a
    separate loss forward would cost ~1.5x for identical numbers)."""
    def f(s):
        ce = _per_example_ce(params, s, obs_onehot, obs_reg, target,
                             cfg, dropout_rng)
        return ce.sum(), ce

    grad, ce = jax.grad(f, has_aux=True)(adv)
    return jnp.clip(adv - step_size * jnp.sign(grad), lower, upper), ce


def white_box_attack(
    params: dict,
    rng: jax.Array,
    scene_input: jnp.ndarray,      # [N, T_obs, SH, SW, C]
    labels: jnp.ndarray,           # [N, T_pred] GT grid cells
    obs_onehot: jnp.ndarray,
    obs_reg: jnp.ndarray,
    cfg: SimAugConfig,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Targeted FGSM / PGD on the scene features (`--adv_train`).

    reference: SimAug/code/pred_models.py:60-172 — random wrong target
    labels, random-init start, one FGSM step or `adv_num_iter` PGD
    steps, optional Beta mixup back toward the clean (or a second
    adversarial) feature.  Returns (adv features, target labels).
    """
    # adversarial examples are DATA: the attack's outputs are
    # stop_gradient'ed below, so the outer training grad never flows
    # through the generation subgraph — stopping params HERE makes
    # that structural, so jax.value_and_grad(simaug_loss) never has to
    # linearize the inner jax.grad (the Pallas GNN custom_vjp has no
    # forward-mode rule; without this the first on-chip step dies with
    # "Linearization failed").  Matches the reference: its tf.gradients
    # attack graph feeds tf.stop_gradient'ed features into the loss.
    params = jax.lax.stop_gradient(params)
    i = cfg.active_scales[0]
    h, w = cfg.scene_grids[i]
    k_t, k_s, k_m, k_s2, k_drop = jax.random.split(rng, 5)

    # random target != true label (reference :68-74)
    offset = jax.random.randint(k_t, labels.shape, 1, h * w)
    target = jnp.mod(labels + offset, h * w)

    lower = jnp.clip(scene_input - cfg.adv_epsilon, -1.0, 1.0)
    upper = jnp.clip(scene_input + cfg.adv_epsilon, -1.0, 1.0)
    start = _start_adv(k_s, scene_input, cfg)
    if cfg.norm_feat:
        start = jax.nn.softmax(start, axis=-1)

    def step(adv, size, it):
        # fresh dropout masks per attack tower pass (keep_prob < 1:
        # the reference's dropout ops re-sample inside the attack
        # while_loop too)
        return _attack_step(params, adv, obs_onehot, obs_reg, target,
                            cfg, size, lower, upper,
                            jax.random.fold_in(k_drop, it))

    if cfg.adv_use_fgsm:
        adv = step(start, cfg.adv_epsilon, 0)
    else:
        adv = jax.lax.fori_loop(
            0, cfg.adv_num_iter,
            lambda it, a: step(a, cfg.adv_step_size, it), start)

    if cfg.use_mixup:
        weight = jax.random.beta(k_m, cfg.mixup_alpha, cfg.mixup_alpha)
        if cfg.mixup_mix_adv:
            adv2 = step(_start_adv(k_s2, scene_input, cfg),
                        cfg.adv_epsilon, cfg.adv_num_iter + 1)
            adv = adv2 * weight + adv * (1.0 - weight)
        else:
            adv = scene_input * weight + adv * (1.0 - weight)
    return jax.lax.stop_gradient(adv), target


# ----------------------------------------------------------- multiview


def multiview_augmentation(
    params: dict,
    rng: jax.Array,
    batch: MultiviewBatch,
    scene_input: jnp.ndarray,      # [N, T_obs, SH, SW, C] current view
    cfg: SimAugConfig,
) -> Tuple[jnp.ndarray, MixInfo]:
    """The SimAug multi-view augmentation (`--multiview_train`).

    reference: SimAug/code/pred_models.py:346-541. Views fold into the
    batch axis for the attack forward; `multiview_exp` selects which
    pair of features is mixed (3 = paper default: adversarial feature
    of the hardest view + clean feature of the selected view).
    Returns (augmented scene features, MixInfo for label mixing).
    """
    # see white_box_attack: the attack/ranking subgraph is primal-only
    # (its outputs — adv_final, focal — are stop_gradient'ed, and the
    # view ORDER is integer), so params are stopped at entry to keep
    # the outer training grad from linearizing the inner jax.grad
    # through the Pallas custom_vjp
    params = jax.lax.stop_gradient(params)
    i = cfg.active_scales[0]
    h, w = cfg.scene_grids[i]
    N, T_obs = scene_input.shape[:2]
    M = cfg.multiview_max_num
    T_pred = batch.pred_grid_class_extra.shape[-1]
    k_a, k_a2, k_sel, k_m, k_drop = jax.random.split(rng, 5)

    # tile the current view's inputs across M (reference :420-446)
    def tile(x):
        return jnp.broadcast_to(
            x[:, None], (N, M) + x.shape[1:]
        ).reshape((N * M,) + x.shape[1:])

    scene_tiled = tile(scene_input)
    obs_onehot = one_hot_grid(batch.obs_grid_class[:, i], h, w)
    onehot_tiled = tile(obs_onehot)
    reg_tiled = tile(batch.obs_grid_target)
    # attack toward each extra view's pred labels
    target = batch.pred_grid_class_extra.reshape(N * M, T_pred)

    start = _start_adv(k_a, scene_tiled, cfg)
    # the MULTIVIEW one_step_attack rebinds its input to the noised
    # start before computing the clip bounds (reference :370-410) —
    # unlike the single-view attack (:132-136) whose ball centers on
    # the clean feature; both are reproduced faithfully
    lower = jnp.clip(start - cfg.adv_epsilon, -1.0, 1.0)
    upper = jnp.clip(start + cfg.adv_epsilon, -1.0, 1.0)
    # ranking loss is measured at the attack start (reference
    # :374-398) and shares the attack's forward+backward
    adv_out, view_loss = _attack_step_with_loss(
        params, start, onehot_tiled, reg_tiled, target, cfg,
        cfg.adv_epsilon, lower, upper,
        jax.random.fold_in(k_drop, 0))

    if cfg.multiview_exp == 3 and cfg.multiview_use_adv_for_loss:
        start2 = _start_adv(k_a2, adv_out, cfg)
        view_loss = _per_example_ce(
            params, start2, onehot_tiled, reg_tiled, target, cfg,
            jax.random.fold_in(k_drop, 1))

    view_loss = view_loss.reshape(N, M)
    adv_out = adv_out.reshape((N, M) + scene_tiled.shape[1:])
    order = jnp.argsort(-view_loss, axis=1)  # descending, [N, M]
    loss_sorted = jnp.take_along_axis(view_loss, order, axis=1)

    def pick(x, idx):
        """x: [N, M, ...]; idx: [N] → x[n, idx[n]]."""
        return jnp.take_along_axis(
            x, idx.reshape((N,) + (1,) * (x.ndim - 1)), axis=1)[:, 0]

    selected = order[:, 0]
    focal = jnp.ones((N,), jnp.float32)

    if cfg.multiview_exp == 1:
        feat1, feat2 = pick(adv_out, order[:, 0]), pick(adv_out, order[:, 1])
    elif cfg.multiview_exp == 4:
        feat1 = pick(adv_out, order[:, M - 1])
        feat2 = pick(adv_out, order[:, M - 2])
    elif cfg.multiview_exp == 2:
        r1 = jax.random.randint(k_sel, (N,), 0, M)
        r2 = jnp.mod(r1 + jax.random.randint(k_a2, (N,), 1, M), M)
        feat1, feat2 = pick(adv_out, r1), pick(adv_out, r2)
        selected = r2
    elif cfg.multiview_exp == 3:
        focal = (1.0 - jnp.exp(-loss_sorted[:, 0])) ** cfg.fl_gamma
        feat1 = pick(adv_out, order[:, 0])
        selected = order[:, 0]
        if cfg.multiview_random:
            selected = jax.random.randint(k_sel, (N,), 0, M)
        # clean features of the selected extra view (reference :508-517)
        extra_scene = batch.scene_feat[
            batch.obs_scene_extra.reshape(-1)
        ].reshape((N, M, T_obs) + batch.scene_feat.shape[1:])
        extra_scene = extra_scene.astype(scene_input.dtype)
        # NOTE: under norm_input the reference mixes the extra view's
        # RAW [0,1] one-hot features against the own view's [-1,1]
        # ones (reference :508-520 embedding_lookup with no rescale) —
        # that asymmetry is part of the published algorithm and is
        # reproduced, not "fixed"
        feat2 = pick(extra_scene, selected)
    else:
        raise ValueError("multiview_exp must be 1..4")

    weight = jax.random.beta(k_m, cfg.mixup_alpha, cfg.mixup_alpha)
    if cfg.multiview_max_weight_for_first:
        weight = jnp.maximum(weight, 1.0 - weight)
    adv_final = feat1 * weight + feat2 * (1.0 - weight)

    info = MixInfo(
        beta_weight=weight,
        selected_idx=selected,
        focal_weight=jax.lax.stop_gradient(focal),
    )
    return jax.lax.stop_gradient(adv_final), info


# ------------------------------------------------------------ training


def simaug_loss(
    params: dict,
    batch: MultiviewBatch,
    cfg: SimAugConfig,
    rng: jax.Array,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Full SimAug training loss: augmentation branch + CE (mixup
    labels under multiview) + Huber offsets + weight decay.

    reference: SimAug/code/pred_models.py:271-336 (branch selection),
    :616-636 (mixed encoder input), :1370-1412 (mixed-label CE +
    double weighting).
    """
    cfg.validate()
    i = cfg.active_scales[0]
    h, w = cfg.scene_grids[i]
    N = batch.obs_grid_class.shape[0]
    T_pred = cfg.pred_len
    k_aug, k_jit, k_drop = jax.random.split(rng, 3)

    scene_input = batch.scene_feat[
        batch.obs_scene.reshape(-1)
    ].reshape((N,) + (batch.obs_scene.shape[1],)
              + batch.scene_feat.shape[1:]).astype(jnp.float32)
    if cfg.norm_input:
        # [-1, 1] scaling for adversarial learning (reference :283-286)
        scene_input = scene_input * 2.0 - 1.0

    obs_onehot = one_hot_grid(batch.obs_grid_class[:, i], h, w)
    labels = batch.pred_grid_class[:, i]
    mix: Optional[MixInfo] = None

    if cfg.adv_train:
        scene_input, _ = white_box_attack(
            params, k_aug, scene_input, labels,
            obs_onehot, batch.obs_grid_target, cfg)
    elif cfg.multiview_train:
        scene_input, mix = multiview_augmentation(
            params, k_aug, batch, scene_input, cfg)
        if cfg.multiview_exp == 3:
            # mix encoder one-hot input with the selected view's
            extra_oh = one_hot_grid(
                jnp.take_along_axis(
                    batch.obs_grid_class_extra,
                    mix.selected_idx[:, None, None], axis=1)[:, 0], h, w)
            obs_onehot = (mix.beta_weight * obs_onehot
                          + (1.0 - mix.beta_weight) * extra_oh)
    if cfg.standard_aug:
        # pixel jitter baseline (reference :310-325)
        scene_input = scene_input + jax.random.uniform(
            k_jit, scene_input.shape, scene_input.dtype,
            -cfg.adv_epsilon, cfg.adv_epsilon)
        scene_input = jax.lax.stop_gradient(scene_input)

    logits, reg = tower_forward(
        params, scene_input, obs_onehot, batch.obs_grid_target, cfg,
        T_pred=T_pred, dropout_rng=k_drop)
    logits2 = logits.reshape(N, T_pred, h * w)

    if mix is not None and cfg.multiview_exp == 3:
        extra_labels = jnp.take_along_axis(
            batch.pred_grid_class_extra,
            mix.selected_idx[:, None, None], axis=1)[:, 0]  # [N, T_pred]
        mixup = (mix.beta_weight * jax.nn.one_hot(labels, h * w)
                 + (1.0 - mix.beta_weight)
                 * jax.nn.one_hot(extra_labels, h * w))
        mixup = jax.lax.stop_gradient(mixup)
        ce = optax.softmax_cross_entropy(logits2, mixup)  # [N, T]
        if cfg.double_weighting:
            ce = ce * mix.focal_weight[:, None]
    else:
        ce = optax.softmax_cross_entropy_with_integer_labels(
            logits2, labels)
    ce = ce.mean() * cfg.grid_loss_weight

    if cfg.mask_grid_regression:
        m = one_hot_grid(labels, h, w)  # [N, T, h, w, 1]
        hub = optax.huber_loss(reg, batch.pred_grid_target, delta=1.0)
        reg_loss = jnp.sum(hub * m) / jnp.maximum(jnp.sum(m) * 2.0, 1.0)
    else:
        reg_loss = jnp.mean(
            optax.huber_loss(reg, batch.pred_grid_target, delta=1.0))
    reg_loss = reg_loss * cfg.grid_reg_loss_weight

    wd = l2_weight_decay(params, cfg.wd)
    total = ce + reg_loss + wd
    parts = {"grid%d_class" % i: ce, "grid%d_reg" % i: reg_loss,
             "wd": wd, "total": total}
    return total, parts


def make_simaug_train_step(cfg: SimAugConfig, tx):
    """Jitted SimAug SGD step (params/opt donated), rng threaded."""
    from multiverse_tpu.train.trainer import TrainState

    def step(state: TrainState, batch: MultiviewBatch, rng: jax.Array):
        (total, parts), grads = jax.value_and_grad(
            simaug_loss, has_aux=True)(state.params, batch, cfg, rng)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        return TrainState(state.step + 1, new_params, new_opt), parts

    return jax.jit(step, donate_argnums=(0,), static_argnums=())
