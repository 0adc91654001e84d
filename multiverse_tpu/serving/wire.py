"""Binary tensor-frame wire format for prediction responses.

One frame = one JSON header line (tensor shapes + pred_len) followed by
raw little-endian float32 ``trajs`` bytes then ``logprobs`` bytes.
JSON-serializing the K×T×2 trajectory tensor costs ~10× the host CPU
and ~2.5× the wire bytes of ``ndarray.tobytes()`` (measured,
STATUS.md §Serving) — at four-digit req/s the host core is the scarce
resource, so both HTTP front ends speak this frame when the client
sends ``Accept: application/x-mvt-tensor``.

This module is the single owner of the format: both producers
(:mod:`.server`, :mod:`.aserver`) and every consumer
(:mod:`.client`, the load generators) build/parse through it, so a
format change cannot desync the transports.

The reference has no serving subsystem (its driver is the offline
batch script, reference: code/multifuture_inference.py) — this is part
of the new TPU-first serving layer.
"""

from __future__ import annotations

import json

import numpy as np

TENSOR_CONTENT_TYPE = "application/x-mvt-tensor"


def build_tensor_frame(result) -> bytes:
    """Encode a :class:`~.engine.PredictionResult` as one binary frame."""
    trajs = np.ascontiguousarray(result.trajs, np.float32)
    logprobs = np.ascontiguousarray(result.logprobs, np.float32)
    header = json.dumps({
        "trajs_shape": list(trajs.shape),
        "logprobs_shape": list(logprobs.shape),
        "pred_len": result.pred_len,
    }).encode() + b"\n"
    return header + trajs.tobytes() + logprobs.tobytes()


def parse_tensor_frame(data: bytes) -> dict:
    """Decode one frame.

    Returns ``{"trajs": [K,T,2] f32, "logprobs": [K] f32,
    "pred_len": int}`` — the same dict shape as the JSON response path.
    """
    nl = data.index(b"\n")
    head = json.loads(data[:nl])
    ts = tuple(head["trajs_shape"])
    n_traj = int(np.prod(ts))
    # copy out of the response buffer: np.frombuffer over (immutable)
    # bytes yields read-only views, but the JSON path returns writable
    # arrays and callers may mutate results in place — the K×T×2 copy
    # is a few KB
    trajs = np.frombuffer(
        data, np.float32, count=n_traj,
        offset=nl + 1).reshape(ts).copy()
    ls = tuple(head["logprobs_shape"])
    logprobs = np.frombuffer(
        data, np.float32, count=int(np.prod(ls)),
        offset=nl + 1 + n_traj * 4).reshape(ls).copy()
    return {"trajs": trajs, "logprobs": logprobs,
            "pred_len": head["pred_len"]}
