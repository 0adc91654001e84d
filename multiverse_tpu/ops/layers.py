"""Core layer library: conv2d / linear with reference-matching inits.

Design notes (TPU):
* NHWC layout throughout — XLA:TPU's native conv layout; channel dims are
  sized so the MXU tiles cleanly (256/64 channels).
* Weights named ``w`` correspond to the reference's ``.*/W`` variables and
  are the only params subject to L2 weight decay
  (reference: code/pred_models.py:1253-1275 `wd_cost` regex ".*/W";
  ConvLSTM kernels are named "kernel" there and are NOT decayed).
* conv2d init: variance_scaling(scale=2.0, fan_in, truncated_normal)
  (reference: code/pred_models.py:1358-1359).
* linear init: truncated_normal(stddev=0.1)
  (reference: code/pred_models.py:1422-1428).
"""

from __future__ import annotations

from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
from jax import lax

Params = Dict[str, jnp.ndarray]

_CONV_INIT = jax.nn.initializers.variance_scaling(
    2.0, "fan_in", "truncated_normal"
)


def get_activation(name: str) -> Callable[[jnp.ndarray], jnp.ndarray]:
    """reference: code/pred_utils.py:86-94."""
    if name == "relu":
        return jax.nn.relu
    if name == "lrelu":
        return jax.nn.leaky_relu
    if name == "tanh":
        return jnp.tanh
    if name in ("identity", "linear", "none"):
        return lambda x: x
    return jax.nn.relu


def init_conv(
    key: jax.Array,
    in_ch: int,
    out_ch: int,
    kernel: int = 3,
    add_bias: bool = True,
) -> Params:
    """Conv2d params. Weight shape [kh, kw, in, out] (HWIO)."""
    p: Params = {"w": _CONV_INIT(key, (kernel, kernel, in_ch, out_ch))}
    if add_bias:
        p["b"] = jnp.zeros((out_ch,), dtype=jnp.float32)
    return p


def conv2d(
    params: Params,
    x: jnp.ndarray,
    stride: int = 1,
    activation: Optional[Callable] = None,
    compute_dtype: Optional[jnp.dtype] = None,
) -> jnp.ndarray:
    """SAME-padded NHWC conv (reference: code/pred_models.py:1333-1373).

    ``compute_dtype=bfloat16`` casts inputs+weights for the MXU and
    accumulates in float32 (preferred_element_type).
    """
    w = params["w"]
    # f32 path: force full-precision accumulation (XLA's DEFAULT uses
    # reduced-precision passes on both TPU and CPU). bf16 path: cast and
    # let the MXU run natively (f32 accumulation inside the MXU); the
    # output is stored in the compute dtype — an f32-preferred output
    # from bf16 operands has no valid transpose rule under jax.grad —
    # and upcast for the f32 consumers (losses, log_softmax).
    precision = lax.Precision.HIGHEST
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
        w = w.astype(compute_dtype)
        precision = lax.Precision.DEFAULT
    out = lax.conv_general_dilated(
        x,
        w,
        window_strides=(stride, stride),
        padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=compute_dtype or jnp.float32,
        precision=precision,
    )
    if "b" in params:
        out = out + params["b"].astype(out.dtype)
    if activation is not None:
        out = activation(out)
    return out.astype(jnp.float32)


def init_linear(
    key: jax.Array, in_dim: int, out_dim: int, add_bias: bool = False
) -> Params:
    p: Params = {
        "w": jax.random.truncated_normal(
            key, -2.0, 2.0, (in_dim, out_dim), dtype=jnp.float32
        )
        * 0.1
    }
    if add_bias:
        p["b"] = jnp.zeros((out_dim,), dtype=jnp.float32)
    return p


def linear(
    params: Params,
    x: jnp.ndarray,
    activation: Optional[Callable] = None,
) -> jnp.ndarray:
    """Fully connected over the last axis (reference: pred_models.py:1404-1447)."""
    out = jnp.einsum(
        "...i,io->...o", x, params["w"], precision=lax.Precision.HIGHEST
    )
    if "b" in params:
        out = out + params["b"]
    if activation is not None:
        out = activation(out)
    return out


def exp_mask(val: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Additive −1e30 masking (reference: code/pred_models.py:1399-1401)."""
    return val + (1.0 - mask.astype(val.dtype)) * -1e30


def softsel(target: jnp.ndarray, logits: jnp.ndarray,
            use_sigmoid: bool = False) -> jnp.ndarray:
    """Soft selection: weight `target`'s second-to-last axis by
    softmax/sigmoid of `logits` and sum it out
    (reference: code/pred_models.py:1376-1396).

    target: [..., M, d]; logits: [..., M] → [..., d]."""
    weights = (jax.nn.sigmoid(logits) if use_sigmoid
               else jax.nn.softmax(logits, axis=-1))
    return jnp.sum(target * weights[..., None], axis=-2)


def focal_attention(query: jnp.ndarray, context: jnp.ndarray,
                    use_sigmoid: bool = False) -> jnp.ndarray:
    """Two-level focal attention (Liang et al., CVPR'19).

    Cosine-similarity variant of reference:
    code/pred_models.py:1451-1497 (dead code in the reference model but
    part of its layer inventory): per-channel per-timestep similarity
    to the query, attend over time within each channel, then over
    channels by each channel's max similarity.

    query: [N, d]; context: [N, K, T, d] → [N, d]."""

    def l2n(x):
        s = jnp.sum(jnp.square(x), axis=-1, keepdims=True)
        return x * jax.lax.rsqrt(jnp.maximum(s, 1e-12))

    sim = jnp.sum(
        l2n(query)[:, None, None, :] * l2n(context), axis=-1)  # [N,K,T]
    sim_max = jnp.max(sim, axis=2)                             # [N,K]
    per_channel = softsel(context, sim, use_sigmoid)           # [N,K,d]
    return softsel(per_channel, sim_max, use_sigmoid)          # [N,d]


def group_norm(x: jnp.ndarray, scale: jnp.ndarray, bias: jnp.ndarray,
               num_groups: int = 32, eps: float = 1e-5) -> jnp.ndarray:
    """GroupNorm over NHWC (reference: code/pred_models.py:1511-1633
    keeps GN'd ResNet helpers from the author's detection repo; only
    the normalization itself is a live concept here — the `--use_gn`
    flag)."""
    n, h, w, c = x.shape
    g = min(num_groups, c)
    xg = x.reshape(n, h, w, g, c // g)
    mean = xg.mean(axis=(1, 2, 4), keepdims=True)
    var = xg.var(axis=(1, 2, 4), keepdims=True)
    xg = (xg - mean) * jax.lax.rsqrt(var + eps)
    return xg.reshape(n, h, w, c) * scale + bias


def l2_weight_decay(params, wd: float) -> jnp.ndarray:
    """0.5 * wd * Σ‖w‖² over every leaf named ``w``.

    Matches tf.nn.l2_loss (sum/2) applied to the ``.*/W`` regex selection
    (reference: code/pred_models.py:1253-1275). ConvLSTM kernels are
    named ``kernel`` and excluded, as in the reference.
    """
    total = jnp.asarray(0.0, dtype=jnp.float32)
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    for path, leaf in flat:
        names = [getattr(k, "key", getattr(k, "idx", None)) for k in path]
        if names and names[-1] == "w":
            total = total + 0.5 * jnp.sum(
                jnp.square(leaf.astype(jnp.float32))
            )
    return total * wd
