"""Orbax checkpointing with metric-gated "best" saves and auto-resume.

Replaces the reference's two mechanisms (SURVEY.md §5): TF1
``tf.train.Saver(max_to_keep=5)`` per-epoch checkpoints named by metrics +
a metric-gated ``final_model.ckpt`` (``train.py:38, 91-96``), and Keras
.hdf5 weight files. Orbax gives atomic async-capable saves and a
retention policy; the "best" copy lives in its own subdirectory.
"""

from __future__ import annotations

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

    def save_best(self, state: Any) -> None:
        """Overwrite the metric-gated best checkpoint
        (final_model.ckpt semantics, train.py:94-96).

        Crash-safe rotation: ``force=True`` deletes the target before the
        tmp-rename finalize, so saving straight over ``state`` would lose
        the only best copy if the process dies mid-save (OOM, SIGKILL,
        tunnel-outage watchdog). Instead the new state is written to
        ``state.next`` and swapped in with directory renames; a previous
        copy survives as ``state.old`` until the swap completes, and
        :meth:`_best_path` falls back to the survivors."""
        import shutil
        final = os.path.join(self._best_dir, "state")
        nxt, old = final + ".next", final + ".old"
        self._best_ckpt.save(nxt, state, force=True)
        shutil.rmtree(old, ignore_errors=True)
        if os.path.exists(final):
            os.rename(final, old)
        os.rename(nxt, final)
        shutil.rmtree(old, ignore_errors=True)

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
