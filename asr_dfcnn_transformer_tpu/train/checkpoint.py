"""Orbax checkpointing with metric-gated "best" saves and auto-resume.

Replaces the reference's two mechanisms (SURVEY.md §5): TF1
``tf.train.Saver(max_to_keep=5)`` per-epoch checkpoints named by metrics +
a metric-gated ``final_model.ckpt`` (``train.py:38, 91-96``), and Keras
.hdf5 weight files. Orbax gives atomic async-capable saves and a
retention policy; the "best" copy lives in its own subdirectory.
"""

from __future__ import annotations

import json
import os
from typing import Any, Optional

import orbax.checkpoint as ocp


class CheckpointManager:
    def __init__(self, directory: str, max_to_keep: int = 5):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep,
                                                 create=True))
        self._best_dir = os.path.join(self.directory, "best")
        self._best_ckpt = ocp.PyTreeCheckpointer()

    def save(self, step: int, state: Any) -> None:
        self._mgr.save(step, args=ocp.args.StandardSave(state))
        self._mgr.wait_until_finished()

    def restore_latest(self, template: Any) -> Optional[Any]:
        step = self._mgr.latest_step()
        if step is None:
            return None
        return self._mgr.restore(step,
                                 args=ocp.args.StandardRestore(template))

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def save_best(self, state: Any, metric: Optional[float] = None) -> None:
        """Overwrite the metric-gated best checkpoint
        (final_model.ckpt semantics, train.py:94-96).

        Crash-safe rotation: ``force=True`` deletes the target before the
        tmp-rename finalize, so saving straight over ``state`` would lose
        the only best copy if the process dies mid-save (OOM, SIGKILL,
        tunnel-outage watchdog). Instead the new state is written to
        ``state.next`` and swapped in with directory renames; a previous
        copy survives as ``state.old`` until the swap completes, and
        :meth:`_best_path` falls back to the survivors.

        ``metric`` (optional) persists the gating metric value next to the
        checkpoint so a RESUMED run's gate starts from the historical best
        instead of clobbering it with its first dev sweep (the reference
        resets its in-process ``old_wer``/``old_acc`` on every launch,
        train.py:45-50 + :94-96 — a resumed reference run overwrites
        final_model.ckpt unconditionally). Written atomically AFTER the
        state swap: a crash in between leaves the previous (worse) metric
        on disk, which can only make the gate more permissive — never
        blocks a real improvement."""
        import shutil
        final = os.path.join(self._best_dir, "state")
        nxt, old = final + ".next", final + ".old"
        self._best_ckpt.save(nxt, state, force=True)
        shutil.rmtree(old, ignore_errors=True)
        if os.path.exists(final):
            os.rename(final, old)
        os.rename(nxt, final)
        shutil.rmtree(old, ignore_errors=True)
        if metric is not None:
            path = self._best_metric_path()
            tmp = path + ".tmp"
            with open(tmp, "w") as f:
                json.dump({"metric": float(metric)}, f)
            os.replace(tmp, path)

    def _best_metric_path(self) -> str:
        return os.path.join(self._best_dir, "metric.json")

    def best_metric(self) -> Optional[float]:
        """The persisted gating metric of the best checkpoint, or None
        when absent (pre-metric checkpoints, or no best saved yet). Only
        meaningful while a best state survives on disk."""
        path = self._best_metric_path()
        if self._best_path() is None or not os.path.exists(path):
            return None
        with open(path) as f:
            return float(json.load(f)["metric"])

    def _best_path(self) -> Optional[str]:
        """The best checkpoint, surviving a crash at any point of
        :meth:`save_best`: prefer the finalized swap, then a completed
        ``state.next`` (crashed between renames), then ``state.old``."""
        final = os.path.join(self._best_dir, "state")
        for p in (final, final + ".next", final + ".old"):
            if os.path.exists(p):
                return p
        return None

    def restore_best(self, template: Any) -> Optional[Any]:
        path = self._best_path()
        if path is None:
            return None
        return self._best_ckpt.restore(path, item=template)

    # ---- template-free (raw-tree) restores for params-only loading ------

    def restore_raw_latest(self) -> Optional[Any]:
        """Restore the latest checkpoint as a raw nested dict — no state
        template, no optimizer-state allocation. For inference/serving."""
        step = self._mgr.latest_step()
        if step is None:
            return None
        return self._mgr.restore(step, args=ocp.args.StandardRestore())

    def restore_raw_best(self) -> Optional[Any]:
        path = self._best_path()
        if path is None:
            return None
        return self._best_ckpt.restore(path)
