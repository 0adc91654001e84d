"""In-memory dataset + batching for training/eval.

Replaces the reference's Dataset/get_batches generator
(reference: code/pred_utils.py:208-300 `read_data`, :589-706) with
batch assembly that produces static-shape device Batches:

* the per-batch scene-feature table is padded to a fixed row count so
  every step compiles once (the reference re-shapes it per batch);
* scene features travel as uint8 and are cast on device (11× less
  host→device traffic than the reference's float32 feed);
* the final short batch is padded by repeating the last example, with
  `original_batch_size` reported, exactly like the reference.
"""

from __future__ import annotations

import math
import os
import random
from typing import Dict, Iterator, List, Optional, Tuple

import numpy as np

from multiverse_tpu.config import MultiverseConfig
from multiverse_tpu.models import Batch

SHARED_KEYS = (
    "scene_feat", "video_wh", "scene_grid_strides", "vid2name",
    "person_boxkey2id", "person_boxid2key",
)
EXCLUDED_KEYS = (
    "seq_start_end", "obs_kp_rel", "obs_kp", "cur_activity", "obs_box",
    "future_activity", "pred_kp", "obs_other_box", "person_boxid2key",
    "obs_other_box_class", "pred_scene", "pred_frameidx",
)


class TrajectoryDataset:
    """Holds one split in memory; yields static-shape batches."""

    def __init__(self, data: Dict[str, np.ndarray], shared: dict,
                 cfg: MultiverseConfig, split: str):
        self.data = data
        self.shared = shared
        self.cfg = cfg
        self.split = split
        self.num_examples = len(data["obs_traj"])
        # stable shuffle order: one permutation reused across epochs
        # (reference: code/pred_utils.py:638-648), keyed by seed so a
        # caller passing a DIFFERENT seed actually gets a new shuffle
        self._order: Optional[List[int]] = None
        self._order_seed: Optional[int] = None
        # persistent remap scratch (native.remap_first_seen restores
        # it to -1 on return): a dataset feeds ONE thread at a time,
        # and reallocating O(len(scene_feat)) per batch would scale
        # host cost with the dataset, not the batch
        self._remap_scratch: Optional[np.ndarray] = None

    # ---------------------------------------------------------------- info
    @property
    def grid_centers(self) -> List[np.ndarray]:
        return [
            self.shared["grid_center_%d" % i]
            for i in range(self.cfg.num_scales)
        ]

    def num_batches(self, batch_size: int) -> int:
        return int(math.ceil(self.num_examples / batch_size))

    # ------------------------------------------------------------- batching
    def _scene_cap(self, batch_size: int) -> int:
        # worst case: every (example, timestep) references a distinct frame
        return min(
            batch_size * self.cfg.obs_len,
            max(len(self.shared.get("scene_feat", [1])), 1),
        )

    def make_batch(self, idxs: List[int],
                   original_batch_size: Optional[int] = None
                   ) -> Tuple[Batch, dict]:
        """Assemble a Batch from example indices.

        Returns (Batch, extras) where extras carries eval-side numpy
        data (gt trajectories, keys) that never goes to device.
        """
        cfg = self.cfg
        d = self.data
        n = len(idxs)
        idxs = np.asarray(idxs)

        obs_grid_class = d["obs_grid_class"][idxs].astype(np.int32)
        pred_grid_class = d["pred_grid_class"][idxs].astype(np.int32)

        obs_tgt, pred_tgt = [], []
        for i in cfg.active_scales:
            obs_tgt.append(
                d["obs_grid_target_all_%d" % i][idxs].astype(np.float32))
            pred_tgt.append(
                d["pred_grid_target_all_%d" % i][idxs].astype(np.float32))

        # ---- per-batch scene table with old→new remap + fixed-size pad
        # (reference: code/pred_utils.py:680-704); the remap + row
        # gather run in the native packer (multiverse_tpu.native) so
        # the host feed thread stays off the interpreter
        from multiverse_tpu import native

        cap = self._scene_cap(len(idxs))
        scene_rows = self.shared["scene_feat"]
        obs_scene_old = d["obs_scene"][idxs][..., 0]  # [n, T]
        if (self._remap_scratch is None
                or len(self._remap_scratch) < len(scene_rows)):
            self._remap_scratch = np.full(
                max(len(scene_rows), 1), -1, np.int32)
        new_idx, old_rows, _ = native.remap_first_seen(
            obs_scene_old.astype(np.int32), cap,
            max_id=len(scene_rows) - 1,
            scratch=self._remap_scratch)
        table = native.gather_rows(scene_rows, old_rows, cap)

        batch = Batch(
            obs_grid_class=obs_grid_class,
            obs_grid_target_all=tuple(obs_tgt),
            obs_scene=new_idx,
            scene_feat=table,
            pred_grid_class=pred_grid_class,
            pred_grid_target_all=tuple(pred_tgt),
        )
        extras = {
            "original_batch_size": original_batch_size or n,
            "obs_traj": d["obs_traj"][idxs],
            "pred_traj": d["pred_traj"][idxs],
            "pred_grid_class": pred_grid_class,
            "traj_key": [d["traj_key"][j] for j in idxs]
            if "traj_key" in d else ["seq_%d" % j for j in idxs],
        }
        return batch, extras

    def get_batches(
        self,
        batch_size: int,
        num_steps: int = 0,
        shuffle: bool = True,
        full: bool = False,
        seed: int = 123,
    ) -> Iterator[Tuple[Batch, dict]]:
        """Batch generator. `full` = exactly one epoch in order.

        reference: code/pred_utils.py:609-706.
        """
        n_per_epoch = self.num_batches(batch_size)
        if full:
            num_steps = n_per_epoch
        if self.num_examples == 0 and num_steps > 0:
            # n_per_epoch == 0 would otherwise spin the while-loop
            # below forever (and hang a prefetch consumer silently)
            raise ValueError(
                "dataset %r is empty — check the prepropath" % self.split)

        if shuffle:
            if self._order is None or self._order_seed != seed:
                rnd = random.Random(seed)
                self._order = list(range(self.num_examples))
                rnd.shuffle(self._order)
                self._order_seed = seed
            order = self._order
        else:
            order = list(range(self.num_examples))

        step = 0
        while step < num_steps:
            for b in range(n_per_epoch):
                if step >= num_steps:
                    return
                idxs = order[b * batch_size:(b + 1) * batch_size]
                original = len(idxs)
                if len(idxs) < batch_size:
                    idxs = idxs + [idxs[-1]] * (batch_size - len(idxs))
                yield self.make_batch(idxs, original)
                step += 1


def read_data(prepropath: str, split: str,
              cfg: MultiverseConfig) -> TrajectoryDataset:
    """Load data_{split}.npz (reference: code/pred_utils.py:208-300)."""
    path = os.path.join(prepropath, "data_%s.npz" % split)
    raw = dict(np.load(path, allow_pickle=True))

    shared: dict = {}
    share_keys = list(SHARED_KEYS) + [
        "grid_center_%d" % i for i in range(cfg.num_scales)
    ]
    for key in share_keys:
        if key in raw:
            val = raw.pop(key)
            shared[key] = val.item() if val.shape == () else val

    num_examples = len(raw["obs_traj"])
    data: Dict[str, np.ndarray] = {}
    for key, val in raw.items():
        if key in EXCLUDED_KEYS:
            continue
        if len(val) != num_examples:
            continue
        data[key] = val

    if "person_boxid2key" in shared and "obs_boxid" in data:
        boxid2key = shared["person_boxid2key"]
        data["traj_key"] = [
            boxid2key[int(data["obs_boxid"][i][0])]
            for i in range(num_examples)
        ]
    else:
        # videoname_frameidx_personid-style key from what we have
        vid2name = shared.get("vid2name", {})
        data["traj_key"] = [
            "%s_%d_%d" % (
                vid2name.get(int(raw["obs_vid"][i]), raw["obs_vid"][i])
                if "obs_vid" in raw else "video",
                raw["obs_frameidx"][i][0] if "obs_frameidx" in raw else i,
                i,
            )
            for i in range(num_examples)
        ]

    print("loaded %d examples for %s" % (num_examples, split))
    return TrajectoryDataset(data, shared, cfg, split)
