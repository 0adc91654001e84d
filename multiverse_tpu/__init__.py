"""multiverse_tpu — a TPU-native (JAX/XLA/Pallas) multi-future trajectory
prediction framework.

A from-scratch rebuild of the capabilities of JunweiLiang/Multiverse
(CVPR'20 "The Garden of Forking Paths" + ECCV'20 SimAug), designed
TPU-first:

* pure-function models with explicit parameter pytrees,
* ``lax.scan`` over time instead of TF1 ``raw_rnn`` loops,
* beams folded into the batch axis so ConvLSTM convs stay MXU-shaped,
* ``jax.sharding.Mesh`` + NamedSharding data parallelism,
* Pallas kernels for the fused decode-step hot path.

Layout:
    config.py      — single dataclass config (replaces per-script argparse)
    geometry.py    — grid geometry + trajectory rasterization
    ops/           — layer library: conv, linear, ConvLSTM, GNN, pallas kernels
    models/        — Multiverse model, diverse beam search, SimAug training modes
    data/          — preprocessing (npz schema-compatible), batching
    train/         — optax trainer, orbax checkpoints, evaluation metrics
    parallel/      — device mesh + sharding helpers
    cli/           — CLI drivers mirroring the reference entry points
"""

__version__ = "0.1.0"

from multiverse_tpu.config import MultiverseConfig  # noqa: F401
