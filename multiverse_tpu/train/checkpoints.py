"""Checkpointing with the reference's {save, best} twin layout.

reference: code/pred_utils.py:98-107 (layout outbase/model/runId/{save,
best}), code/train.py:170-171 (twin savers, max_to_keep=5),
code/pred_utils.py:149-205 (restore excluding optimizer slots).

Uses orbax's PyTree checkpointing; restore can load params-only (the
reference's optimizer-slot exclusion) or the full train state.
"""

from __future__ import annotations

import os
from typing import Optional

import orbax.checkpoint as ocp


class CheckpointManager:
    def __init__(self, outpath: str, max_to_keep: int = 5):
        self.save_dir = os.path.join(outpath, "save")
        self.best_dir = os.path.join(outpath, "best")
        opts = ocp.CheckpointManagerOptions(
            max_to_keep=max_to_keep, create=True)
        self._save = ocp.CheckpointManager(
            os.path.abspath(self.save_dir), options=opts)
        self._best = ocp.CheckpointManager(
            os.path.abspath(self.best_dir), options=opts)

    # ------------------------------------------------------------- save
    def save(self, step: int, params: dict, opt_state=None,
             best: bool = False) -> None:
        mgr = self._best if best else self._save
        payload = {"params": params}
        if opt_state is not None:
            payload["opt_state"] = opt_state
        mgr.save(step, args=ocp.args.StandardSave(payload))
        mgr.wait_until_finished()

    # ---------------------------------------------------------- restore
    def _latest(self, best: bool) -> Optional[int]:
        mgr = self._best if best else self._save
        return mgr.latest_step()

    def restore_params(self, template: dict, best: bool = False,
                       path: Optional[str] = None) -> dict:
        """Load params only (optimizer slots excluded, like the
        reference's var filtering)."""
        if path is not None:
            mgr = ocp.CheckpointManager(os.path.abspath(path))
            step = mgr.latest_step()
        else:
            mgr = self._best if best else self._save
            step = self._latest(best)
        if step is None:
            raise FileNotFoundError("no checkpoint found")
        return _restore_params_subset(mgr, step, template)

    def restore_train_state(self, params_template: dict,
                            opt_state_template, best: bool = False):
        mgr = self._best if best else self._save
        step = self._latest(best)
        if step is None:
            raise FileNotFoundError("no checkpoint found")
        restored = mgr.restore(
            step,
            args=ocp.args.StandardRestore(
                {"params": params_template,
                 "opt_state": opt_state_template}),
        )
        return step, restored["params"], restored["opt_state"]

    def latest_step(self, best: bool = False) -> Optional[int]:
        return self._latest(best)

    def poll_latest_step(self, best: bool = False) -> Optional[int]:
        """Like :meth:`latest_step`, but re-reads the directory first:
        orbax caches its step list in-process, so steps written by
        ANOTHER process (a trainer feeding a hot-reloading server) are
        invisible to the plain call."""
        mgr = self._best if best else self._save
        mgr.reload()
        return mgr.latest_step()


def _prune_to_template(saved, template, path="params"):
    """Keep only the template's keys from a restored pytree — the
    orbax analog of the reference's scope-filtered var loading: a
    model trained with --use_grids 1,1 is tested/decoded with 1,0
    (reference TESTING.md trains both scales, every test/inference
    command activates scale 0 only), so the checkpoint may carry MORE
    scales than the consumer's template."""
    if isinstance(template, dict):
        if not isinstance(saved, dict):
            raise ValueError(f"{path}: checkpoint leaf where the "
                             f"template has a subtree")
        out = {}
        for k, sub in template.items():
            if k not in saved:
                raise KeyError(
                    f"{path}.{k}: required by the model config but "
                    f"missing from the checkpoint")
            out[k] = _prune_to_template(saved[k], sub, f"{path}.{k}")
        return out
    if tuple(getattr(saved, "shape", ())) != tuple(template.shape):
        raise ValueError(
            f"{path}: checkpoint shape {getattr(saved, 'shape', None)} "
            f"!= model shape {template.shape}")
    return saved


def _tree_has_extra_keys(saved, template) -> bool:
    """True iff the saved tree carries dict keys the template lacks
    anywhere (the extra-grid-scales superset case)."""
    if isinstance(template, dict):
        if not isinstance(saved, dict):
            return False
        if set(saved) - set(template):
            return True
        return any(_tree_has_extra_keys(saved[k], template[k])
                   for k in template if k in saved)
    return False


def _restore_params_subset(mgr, step: int, template: dict) -> dict:
    """Restore against the template, tolerating checkpoints that hold a
    SUPERSET of it (extra grid scales — the reference's published flow
    trains --use_grids 1,1 and tests with scale 0 only).

    The path is decided from the checkpoint's tree METADATA (cheap, no
    tensor I/O): only a genuine key superset restores as-saved + prune;
    everything else goes through StandardRestore so corrupt checkpoints
    and same-scale shape mismatches surface orbax's own diagnostic
    instead of a prune-phase error after a second full read."""
    saved_meta = None
    try:
        # a freshly-opened CheckpointManager returns None from
        # item_metadata (its handler registry is lazily built), so read
        # the tree metadata straight off the step directory instead
        # (the layout <dir>/<step>/default is this module's own save
        # format above)
        meta = ocp.StandardCheckpointer().metadata(
            mgr.directory / str(step) / "default")
        saved_meta = meta.item_metadata["params"]
    except Exception:
        pass  # metadata unavailable: let StandardRestore decide
    if saved_meta is not None and _tree_has_extra_keys(saved_meta,
                                                       template):
        restored = mgr.restore(step)
        return _prune_to_template(restored["params"], template)
    restored = mgr.restore(
        step, args=ocp.args.StandardRestore({"params": template}))
    return restored["params"]


def restore_params_from(path: str, template: dict) -> dict:
    """Standalone restore for inference (reference:
    code/multifuture_inference.py:275-299 scope-filtered load)."""
    mgr = ocp.CheckpointManager(os.path.abspath(path))
    step = mgr.latest_step()
    if step is None:
        raise FileNotFoundError("no checkpoint in %s" % path)
    return _restore_params_subset(mgr, step, template)


def process_out_dirs(outbasepath: str, modelname: str, run_id: int) -> str:
    """outbase/model/runId layout (reference: pred_utils.py:98-107)."""
    outpath = os.path.join(outbasepath, modelname, str(run_id).zfill(2))
    os.makedirs(outpath, exist_ok=True)
    return outpath
