"""Optimizer, LR schedules, and the jitted train/eval steps.

reference: code/pred_models.py:1636-1742 `Trainer` —
AdaDelta (default) / momentum / adam / rmsprop with exponential or
cosine LR decay and clip-by-value gradients. Optimizer hyperparameters
match the TF1 defaults the reference relies on.

TPU design: one jitted step does forward + loss + grad + update with
donated params/opt_state; data parallelism is layered on top by pjit
(see multiverse_tpu.parallel.mesh) — the step function itself is
sharding-agnostic.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import optax

from multiverse_tpu.config import MultiverseConfig
from multiverse_tpu.models import Batch, compute_loss, model_forward


class TrainState(NamedTuple):
    step: jnp.ndarray
    params: dict
    opt_state: optax.OptState


def build_schedule(cfg: MultiverseConfig,
                   train_num_examples: int) -> optax.Schedule:
    """Exponential staircase / cosine decay
    (reference: code/pred_models.py:1645-1665)."""
    base = cfg.init_lr * cfg.emb_lr
    if cfg.use_cosine_lr:
        max_steps = max(
            1, int(train_num_examples / cfg.batch_size * cfg.num_epochs))
        return optax.cosine_decay_schedule(base, max_steps, alpha=0.0)
    if cfg.learning_rate_decay is not None:
        decay_steps = max(1, int(
            train_num_examples / cfg.batch_size * cfg.num_epoch_per_decay))
        return optax.exponential_decay(
            base, decay_steps, cfg.learning_rate_decay, staircase=True)
    return optax.constant_schedule(base)


def build_optimizer(
    cfg: MultiverseConfig, train_num_examples: int
) -> optax.GradientTransformation:
    schedule = build_schedule(cfg, train_num_examples)
    name = cfg.optimizer
    if name == "adadelta":
        # TF1 AdadeltaOptimizer defaults: rho=0.95, eps=1e-8
        opt = optax.adadelta(schedule, rho=0.95, eps=1e-8)
    elif name == "momentum":
        opt = optax.sgd(schedule, momentum=0.9)
    elif name == "adam":
        opt = optax.adam(schedule, b1=0.9, b2=0.999, eps=1e-8)
    elif name == "rmsprop":
        # TF1 RMSPropOptimizer defaults: decay=0.9, eps=1e-10, and the
        # mean-square slot starts at ONES (optax defaults it to zeros,
        # which would make the first updates ~lr in magnitude instead
        # of the reference's damped start)
        opt = optax.rmsprop(schedule, decay=0.9, eps=1e-10,
                            initial_scale=1.0)
    else:
        raise ValueError("unknown optimizer %s" % name)

    chain = []
    if cfg.clip_gradient_norm is not None:
        # clip-by-VALUE, not by norm, despite the reference flag's name
        # (reference: code/pred_models.py:1700-1705 tf.clip_by_value)
        chain.append(optax.clip(cfg.clip_gradient_norm))
    chain.append(opt)
    return optax.chain(*chain)


def init_train_state(
    params: dict, cfg: MultiverseConfig, train_num_examples: int
) -> Tuple[TrainState, optax.GradientTransformation]:
    tx = build_optimizer(cfg, train_num_examples)
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        opt_state=tx.init(params),
    ), tx


def make_train_step(
    cfg: MultiverseConfig,
    tx: optax.GradientTransformation,
) -> Callable[[TrainState, Batch], Tuple[TrainState, dict]]:
    """One jitted SGD step. Returns (new_state, loss dict).

    The optional third ``rng`` argument drives train-time input dropout
    on the ConvLSTM cells; required when ``cfg.keep_prob < 1``
    (model_forward raises otherwise), ignored at keep_prob == 1.
    """

    def loss_fn(params, batch, rng):
        out = model_forward(params, batch, cfg, is_train=True, rng=rng)
        total, parts = compute_loss(params, batch, out, cfg)
        return total, parts

    def step(state: TrainState, batch: Batch, rng=None):
        (total, parts), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params, batch, rng)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        parts = dict(parts)
        parts["total"] = total
        return TrainState(state.step + 1, new_params, new_opt), parts

    return jax.jit(step, donate_argnums=(0,))


def make_eval_step(cfg: MultiverseConfig):
    """Jitted inference step: returns per-scale (class logits, reg)."""

    def step(params, batch: Batch):
        out = model_forward(params, batch, cfg, is_train=False)
        return out.class_logits, out.reg_out

    return jax.jit(step)
