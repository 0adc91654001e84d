"""Device mesh + sharding: the framework's parallelism layer.

The reference has **no distributed execution of any kind** — every entry
point pins one GPU (reference: code/train.py:35-36 "Now only one gpu is
used", code/pred_models.py:28 `tf.device("/gpu:%d")`; SURVEY.md §2.9).
This module is therefore a new, TPU-first component, not a port:

* a `jax.sharding.Mesh` over ICI with axes ``("data", "model")``;
* **data parallelism** (the strategy that pays at ~10M params): the
  batch axis of every array in a :class:`~multiverse_tpu.models.Batch`
  is sharded over ``"data"``; parameters are replicated; XLA/GSPMD
  inserts the gradient ``psum`` automatically from the sharding
  annotations — no hand-written collectives;
* optional **tensor parallelism** over ``"model"``: every conv kernel's
  output-channel axis (the ConvLSTM's fused 4·D gate dim, the scene
  CNN's feature dim) is sharded; GSPMD places the all-gather of the
  recurrent ``h`` feedback on ICI.  At the published model size this is
  bandwidth-bound and off by default (``model_parallel=1``), but it is
  a real, exercised code path (tests/test_parallel.py) so the framework
  scales past HBM if the model grows;
* beam decode shards the *trajectory* axis over ``"data"`` — beams stay
  local to a chip (the per-step top-k over K·H·W is tiny and must not
  cross ICI).

Pipeline / sequence / expert / context parallelism are deliberately not
implemented: sequences are ≤26 steps, there are no experts, and the
model is two ConvLSTM stacks — there is nothing to pipeline (SURVEY.md
§2.9, §5.7).  This is a documented design decision, not a gap.
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from multiverse_tpu.config import MultiverseConfig
from multiverse_tpu.models import Batch, compute_loss, model_forward
from multiverse_tpu.train.trainer import TrainState


# ----------------------------------------------------------------- mesh


def make_mesh(
    n_devices: Optional[int] = None,
    model_parallel: int = 1,
    devices=None,
) -> Mesh:
    """Build a ``("data", "model")`` mesh over the available chips.

    ``model_parallel`` chips per model-parallel group ride the fastest
    ICI dimension (JAX device order is ICI-contiguous for slices).
    """
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            if len(devices) < n_devices:
                raise ValueError(
                    f"expected {n_devices} devices, found {len(devices)} "
                    f"(platform={devices[0].platform}); for a virtual CPU "
                    f"mesh force JAX_PLATFORMS=cpu + "
                    f"--xla_force_host_platform_device_count before backend "
                    f"init (see tests/conftest.py)")
            devices = devices[:n_devices]
    n = len(devices)
    if n % model_parallel != 0:
        raise ValueError(
            f"{n} devices not divisible by model_parallel={model_parallel}")
    arr = np.asarray(devices).reshape(n // model_parallel, model_parallel)
    return Mesh(arr, axis_names=("data", "model"))


def make_mesh_for_batch(batch_size: int, model_parallel: int = 1) -> Mesh:
    """Mesh whose "data" axis is the largest divisor of `batch_size`
    that fits the available chips — small (debug) batches then simply
    use fewer chips instead of erroring on divisibility."""
    avail = len(jax.devices()) // model_parallel
    dp = max(d for d in range(1, avail + 1) if batch_size % d == 0)
    return make_mesh(n_devices=dp * model_parallel,
                     model_parallel=model_parallel)


# ------------------------------------------------------------ shardings


def batch_pspec(batch: Batch) -> Batch:
    """PartitionSpec tree for a Batch: leading axis over "data", except
    the scene-feature table which is shared by all examples and
    replicated (each example indexes into it)."""

    def spec_for(name: str):
        if name == "scene_feat":
            return P()
        return P("data")

    return Batch(
        obs_grid_class=spec_for("obs_grid_class"),
        obs_grid_target_all=tuple(
            spec_for("t") for _ in batch.obs_grid_target_all),
        obs_scene=spec_for("obs_scene"),
        scene_feat=spec_for("scene_feat"),
        pred_grid_class=(None if batch.pred_grid_class is None
                         else spec_for("pred_grid_class")),
        pred_grid_target_all=(
            None if batch.pred_grid_target_all is None else tuple(
                spec_for("t") for _ in batch.pred_grid_target_all)),
        pred_length=(None if batch.pred_length is None
                     else spec_for("pred_length")),
    )


def _leaf_pspec(leaf, mp: int):
    """Shape-based sharding rule shared by params and their optimizer
    accumulators: output-channel (last) axis over "model" when
    divisible; otherwise the input-channel axis (a readout conv like
    h2g's [3, 3, D, 1] keeps its weight where its TP-sharded input
    lives — also what GSPMD picks when left unconstrained, so the
    train-step executable is reused across calls); replicated as the
    fallback."""
    if mp == 1:
        return P()
    if leaf.ndim >= 1 and leaf.shape[-1] % mp == 0:
        return P(*((None,) * (leaf.ndim - 1) + ("model",)))
    if leaf.ndim >= 2 and leaf.shape[-2] % mp == 0:
        # no trailing None: P(..., 'model') and P(..., 'model', None)
        # are equivalent but hash differently, and jit caches by hash
        return P(*((None,) * (leaf.ndim - 2) + ("model",)))
    return P()


def param_pspecs(params: dict, mesh: Mesh) -> dict:
    """PartitionSpec tree for the parameter pytree.

    With a trivial "model" axis everything is replicated (pure DP).
    Otherwise conv kernels shard their output-channel (last) axis and
    biases their only axis over "model" when divisible — the ConvLSTM's
    fused [k, k, Cin+D, 4D] kernel becomes 4D/mp per chip.
    """
    mp = mesh.shape["model"]
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: _leaf_pspec(leaf, mp), params)


def shard_batch(mesh: Mesh, batch: Batch) -> Batch:
    """Place a host Batch onto the mesh with DP sharding."""
    specs = batch_pspec(batch)

    def put(x, s):
        if x is None:
            return None
        return jax.device_put(jnp.asarray(x), NamedSharding(mesh, s))

    return jax.tree_util.tree_map(
        put, batch, specs,
        is_leaf=lambda x: x is None,
    )


def replicate(mesh: Mesh, tree):
    """Place a pytree fully replicated over the mesh."""
    return jax.device_put(tree, NamedSharding(mesh, P()))


_replicate = replicate


# -------------------------------------------------------------- steps


def _no_pallas_if_multidevice(
    cfg: MultiverseConfig, mesh: Mesh
) -> MultiverseConfig:
    """Pallas kernels lower to opaque custom calls with no GSPMD
    partitioning rule — inside a multi-device GSPMD-sharded jit they
    would be replicated with all-gathers (or fail to lower) instead of
    running data-parallel.  The TRAIN step stays on GSPMD (its gradient
    all-reduce comes free from the sharding annotations) and clears
    cfg.allow_pallas; the inference steps instead go through
    :func:`shard_map_infer`, which keeps the kernels."""
    if mesh.size > 1 and cfg.allow_pallas:
        return cfg.replace(allow_pallas=False)
    return cfg


def make_sharded_train_step(
    cfg: MultiverseConfig,
    tx: optax.GradientTransformation,
    mesh: Mesh,
) -> Callable[[TrainState, Batch], Tuple[TrainState, dict]]:
    """DP(+optional TP) training step jitted over the mesh.

    Pure-DP multi-device meshes run as explicit SPMD via
    :func:`shard_map` (see :func:`_make_shardmap_train_step`) so the
    pallas GNN kernel + its custom-VJP backward ride along per chip —
    including under ``mask_grid_regression``, whose global mask-count
    normalizer :func:`compute_loss` psums over "data" when given the
    axis name.  TP meshes use the GSPMD path: shardings propagate from
    the argument placement (:func:`init_sharded_train_state` /
    :func:`shard_batch`) and the per-example loss mean makes XLA emit
    the gradient all-reduce over "data" on its own — no hand-written
    collectives.
    """
    if (mesh.size > 1 and mesh.shape["model"] == 1
            and cfg.allow_pallas):
        return _make_shardmap_train_step(cfg, tx, mesh)

    # the GSPMD step IS the single-device step — shardings propagate
    # from the argument placement and XLA inserts the gradient
    # all-reduce on its own, so reuse the one implementation
    from multiverse_tpu.train.trainer import make_train_step

    return make_train_step(_no_pallas_if_multidevice(cfg, mesh), tx)


def compat_shard_map(fn, mesh, in_specs, out_specs, check=False):
    """jax.shard_map across jax versions: the varying-axis checker
    kwarg is ``check_vma`` on jax>=0.8 (``jax.shard_map``) and
    ``check_rep`` on the older experimental API.  Every shard_map in
    the framework goes through here so the version shim lives in ONE
    place."""
    try:                                 # jax >= 0.8
        from jax import shard_map
        return shard_map(fn, mesh=mesh, in_specs=in_specs,
                         out_specs=out_specs, check_vma=check)
    except ImportError:                  # older jax
        from jax.experimental.shard_map import shard_map
        return shard_map(fn, mesh=mesh, in_specs=in_specs,
                         out_specs=out_specs, check_rep=check)


def shard_map_infer(fn: Callable, mesh: Mesh, batch: Batch):
    """Wrap an inference function (params, Batch) -> pytree in
    jax.shard_map over the "data" axis: every chip runs the FULL local
    computation on its batch slice with replicated params — the
    SPMD-manual pattern Pallas supports, so multi-device inference
    keeps the fused kernels that GSPMD's auto-partitioner cannot
    partition (pallas_call is an opaque custom call to it).  The scene
    table stays replicated (examples index into it globally); every
    output leaf has the batch axis leading."""
    # checker off: replicated params feed scans whose carries become
    # device-varying (zero init states) — the varying-axis checker
    # rejects that mix even though the math is batch-local and correct
    return compat_shard_map(
        fn, mesh=mesh,
        in_specs=(P(), batch_pspec(batch)),
        out_specs=P("data"),
        check=False)


def _make_shardmap_train_step(
    cfg: MultiverseConfig,
    tx: optax.GradientTransformation,
    mesh: Mesh,
) -> Callable[[TrainState, Batch], Tuple[TrainState, dict]]:
    """Pure-DP train step as explicit SPMD (shard_map + psum).

    Each chip computes gradients on its batch shard with the FULL
    kernel path — on TPU the GNN attention runs its fused pallas
    forward/backward per chip, which GSPMD's auto-partitioner cannot
    do (pallas_call is opaque to it).  Gradients and loss parts are
    pmean-averaged over "data" (exact: every plain-mean term because
    shards are equal-sized by construction, and the masked-regression
    term because compute_loss psums its mask-count normalizer over
    "data" and scales by the axis size — reference semantics:
    code/pred_models.py:999-1018), then the optimizer update runs
    identically on every chip, keeping state replicated.
    """
    def loss_fn(params, batch, rng):
        out = model_forward(params, batch, cfg, is_train=True, rng=rng)
        total, parts = compute_loss(params, batch, out, cfg,
                                    axis_name="data")
        return total, parts

    def local_step(state: TrainState, batch: Batch, rng=None):
        if rng is not None:
            # decorrelate dropout masks across the data shards (the
            # replicated rng would otherwise draw identical masks for
            # every chip's local examples)
            rng = jax.random.fold_in(rng, jax.lax.axis_index("data"))
        (total, parts), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params, batch, rng)
        grads = jax.lax.pmean(grads, "data")
        parts = jax.lax.pmean(dict(parts, total=total), "data")
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        return TrainState(state.step + 1, new_params, new_opt), parts

    def step(state: TrainState, batch: Batch, rng=None):
        if rng is None:
            fn = compat_shard_map(
                local_step, mesh=mesh,
                in_specs=(P(), batch_pspec(batch)),
                out_specs=(P(), P()),
                check=False)
            return fn(state, batch)
        fn = compat_shard_map(
            local_step, mesh=mesh,
            in_specs=(P(), batch_pspec(batch), P()),
            out_specs=(P(), P()),
            check=False)
        return fn(state, batch, rng)

    return jax.jit(step, donate_argnums=(0,))


def make_sharded_eval_step(cfg: MultiverseConfig, mesh: Mesh):
    """Greedy-decode inference step, batch sharded over "data" —
    via :func:`shard_map_infer` on multi-device meshes so the fused
    decode kernel rides along per chip."""

    def local(params, batch: Batch):
        out = model_forward(params, batch, cfg, is_train=False)
        return out.class_logits, out.reg_out

    if mesh.size == 1:
        return jax.jit(local)

    def step(params, batch: Batch):
        return shard_map_infer(local, mesh, batch)(params, batch)

    return jax.jit(step)


def make_sharded_beam_step(
    cfg: MultiverseConfig,
    mesh: Mesh,
    T_pred: Optional[int] = None,
):
    """Diverse-beam decode with the trajectory axis sharded over "data".

    The reference decodes one trajectory per sess.run at batch size 1
    (reference: code/multifuture_inference.py:460-472); here N
    trajectories decode at once across the mesh and K beams stay
    chip-local inside the folded batch axis.  Multi-device meshes run
    through :func:`shard_map_infer`, so each chip executes the fused
    Pallas decode kernel on its slice.
    """
    T = T_pred or cfg.pred_len

    def local(params, batch: Batch):
        from multiverse_tpu.inference import beam_forward
        return beam_forward(params, batch, cfg, T_pred=T)

    if mesh.size == 1:
        return jax.jit(local)

    def step(params, batch: Batch):
        return shard_map_infer(local, mesh, batch)(params, batch)

    return jax.jit(step)


def init_sharded_train_state(
    params: dict,
    tx: optax.GradientTransformation,
    mesh: Mesh,
) -> TrainState:
    """Place params per :func:`param_pspecs` and init the optimizer
    *on device* so its accumulators inherit the same shardings."""
    pspecs = param_pspecs(params, mesh)
    placed = jax.tree.map(
        lambda x, s: jax.device_put(jnp.asarray(x), NamedSharding(mesh, s)),
        params, pspecs)
    opt_state = jax.jit(tx.init)(placed)
    # optimizer accumulators are value-independent constants inside
    # tx.init (zeros_like), so XLA gives them default single-device
    # shardings — feeding those into the first train step and getting
    # NamedSharding-placed ones back would recompile the entire step on
    # call #2.  Re-place them under the same shape-based rule as the
    # params so every call shares one executable.
    mp = mesh.shape["model"]
    opt_state = jax.tree.map(
        lambda x: jax.device_put(
            x, NamedSharding(mesh, _leaf_pspec(x, mp))),
        opt_state)
    return TrainState(
        step=_replicate(mesh, jnp.zeros((), jnp.int32)),
        params=placed,
        opt_state=opt_state,
    )
