"""Crash-safety of the metric-gated best checkpoint (train/checkpoint.py).

``save_best`` must never leave a state where no best copy is restorable:
the rotation writes state.next, swaps directories, and the restore path
falls back to whichever survivor a mid-save crash left behind.
"""

import os
import shutil

import numpy as np

from asr_dfcnn_transformer_tpu.train.checkpoint import CheckpointManager


def _state(v):
    return {"w": np.full((2, 2), float(v), np.float32)}


def _best(mgr, tmpl):
    out = mgr.restore_best(tmpl)
    assert out is not None
    return float(out["w"][0, 0])


def test_save_best_overwrites_and_cleans(tmp_path):
    mgr = CheckpointManager(str(tmp_path / "w"))
    mgr.save_best(_state(1))
    assert _best(mgr, _state(0)) == 1.0
    mgr.save_best(_state(2))
    assert _best(mgr, _state(0)) == 2.0
    best_dir = os.path.join(mgr.directory, "best")
    assert sorted(os.listdir(best_dir)) == ["state"]   # no leftovers


def test_restore_survives_crash_between_renames(tmp_path):
    """Crash after old->state.old but before state.next->state: both the
    new (preferred) and old copies exist under side names."""
    mgr = CheckpointManager(str(tmp_path / "w"))
    mgr.save_best(_state(1))
    best = os.path.join(mgr.directory, "best", "state")
    # reconstruct the mid-swap disk state of save_best(_state(2))
    mgr._best_ckpt.save(best + ".next", _state(2), force=True)
    os.rename(best, best + ".old")
    assert _best(mgr, _state(0)) == 2.0                # prefers .next
    assert float(mgr.restore_raw_best()["w"][0, 0]) == 2.0
    # ...and a crash before state.next finished leaves only .old
    shutil.rmtree(best + ".next")
    assert _best(mgr, _state(0)) == 1.0


def test_next_save_recovers_from_crash_debris(tmp_path):
    mgr = CheckpointManager(str(tmp_path / "w"))
    mgr.save_best(_state(1))
    best = os.path.join(mgr.directory, "best", "state")
    os.rename(best, best + ".old")                     # crashed mid-swap
    mgr.save_best(_state(3))
    assert _best(mgr, _state(0)) == 3.0
    assert sorted(os.listdir(os.path.dirname(best))) == ["state"]


def test_best_metric_persists_and_gates_resume(tmp_path):
    """A resumed run's best gate must start from the historical best,
    not clobber it with its first dev sweep (trainer._best_gate)."""
    from asr_dfcnn_transformer_tpu.train.trainer import _TrainerBase

    mgr = CheckpointManager(str(tmp_path / "w"))
    assert mgr.best_metric() is None                   # nothing saved yet
    mgr.save_best(_state(1), metric=0.25)
    assert mgr.best_metric() == 0.25
    mgr.save_best(_state(2), metric=0.10)
    assert mgr.best_metric() == 0.10

    # a fresh manager over the same directory (process restart) sees it
    mgr2 = CheckpointManager(str(tmp_path / "w"))
    assert mgr2.best_metric() == 0.10

    # the trainer gate uses the persisted value...
    t = _TrainerBase.__new__(_TrainerBase)
    t.ckpt = mgr2
    assert t._best_gate("min") == 0.10
    # ...and falls back to the mode's identity when nothing is stored
    t.ckpt = CheckpointManager(str(tmp_path / "empty"))
    assert t._best_gate("min") == float("inf")
    assert t._best_gate("max") == -float("inf")


def test_best_metric_none_without_state(tmp_path):
    """A stale metric file with no restorable state must not gate."""
    mgr = CheckpointManager(str(tmp_path / "w"))
    mgr.save_best(_state(1), metric=0.5)
    shutil.rmtree(os.path.join(mgr.directory, "best", "state"))
    assert mgr.best_metric() is None


def test_save_best_without_metric_keeps_old_behavior(tmp_path):
    mgr = CheckpointManager(str(tmp_path / "w"))
    mgr.save_best(_state(1))
    assert mgr.best_metric() is None
    assert _best(mgr, _state(0)) == 1.0
