"""Minimal stdlib client for the prediction server."""

from __future__ import annotations

import json
import urllib.request
from typing import Optional

import numpy as np


class PredictionClient:
    def __init__(self, host: str = "127.0.0.1", port: int = 8500,
                 timeout: float = 30.0):
        self.base = f"http://{host}:{port}"
        self.timeout = timeout

    def _get(self, path: str) -> dict:
        with urllib.request.urlopen(
                self.base + path, timeout=self.timeout) as r:
            return json.loads(r.read())

    def healthy(self) -> bool:
        try:
            return bool(self._get("/healthz").get("ok"))
        except OSError:
            return False

    def stats(self) -> dict:
        return self._get("/stats")

    def predict(
        self,
        obs_traj,
        scene_class_map=None,
        pred_len: Optional[int] = None,
    ) -> dict:
        """Returns {"trajs": [K][T][2], "logprobs": [K], "pred_len": T}
        with numpy arrays for the array fields."""
        payload = {"obs_traj": np.asarray(obs_traj).tolist()}
        if scene_class_map is not None:
            payload["scene_class_map"] = np.asarray(
                scene_class_map).tolist()
        if pred_len is not None:
            payload["pred_len"] = int(pred_len)
        req = urllib.request.Request(
            self.base + "/v1/predict",
            data=json.dumps(payload).encode(),
            headers={"Content-Type": "application/json"},
            method="POST")
        with urllib.request.urlopen(req, timeout=self.timeout) as r:
            out = json.loads(r.read())
        out["trajs"] = np.asarray(out["trajs"], np.float32)
        out["logprobs"] = np.asarray(out["logprobs"], np.float32)
        return out
