"""Checkpoint model-identity stamps: fail loudly on silent wrong-function
restores (VERDICT r4 weak-4).

Two real hazards this closes:

1. A ``SpeechTransformer`` checkpoint trained at ``prenet_heads=4``
   restores CLEANLY under a ``prenet_heads=1`` default — the param tree is
   head-count-invariant by design (heads only reshape the einsum) — and
   silently computes a different function.
2. ``eval --model`` must match what ``am`` trained by operator discipline
   only; restoring an SE-DFCNN checkpoint into a same-shaped but different
   architecture produces plausible garbage accuracy.

The reference fails both silently too (``test.py:121-136`` rebuilds
whatever model the flags say and restores into it); we stamp instead of
staying faithful. Every trainer writes ``identity.json`` next to its
checkpoints (Flax modules are dataclasses — the stamp is the full
constructor field set), and every restore path compares stamps:

- STRUCTURAL field mismatches (vocab sizes, depths, head counts, parity
  flags, ...) raise :class:`ModelIdentityError` unless overridden
  (``--force-model-mismatch`` in the CLI).
- ADVISORY fields — performance/numerics knobs that do not change the
  computed function's structure (kernel selection, matmul precision,
  dtype, dropout rate, remat) — only warn: evaluating a bf16-trained model
  in f32, or with a different fused-kernel policy, is legitimate.

Checkpoints that predate stamping restore without a check (and are
stamped on their next restore, so the protection ratchets on).
"""

from __future__ import annotations

import json
import os
import sys
from typing import Any, Dict, Optional

import numpy as np

IDENTITY_FILE = "identity.json"

#: Fields whose mismatch does NOT change the computed function's
#: structure — kernel/back-end selection, precision and regularisation
#: knobs. Mismatches warn instead of raising.
ADVISORY_FIELDS = frozenset({
    "dtype", "dropout_rate", "logits_matmul", "remat_stages",
    "fused_attention", "fused_ffn", "prenet_fused", "prenet_conv1_layout",
})


class ModelIdentityError(RuntimeError):
    """A checkpoint's stamped architecture differs structurally from the
    model it is being restored into."""


def _jsonable(v: Any) -> Any:
    if v is None or isinstance(v, (bool, int, float, str)):
        return v
    if isinstance(v, (tuple, list)):
        return [_jsonable(x) for x in v]
    if isinstance(v, dict):
        return {str(k): _jsonable(x) for k, x in v.items()}
    try:  # jnp.bfloat16 & friends are types accepted by np.dtype
        return f"dtype:{np.dtype(v).name}"
    except Exception:  # noqa: BLE001 — not a dtype
        pass
    name = getattr(v, "__name__", None)
    if name is not None:
        return f"callable:{name}"
    return f"type:{type(v).__name__}"


def model_identity(model) -> Dict[str, Any]:
    """The architecture stamp of a Flax module: class name + every
    constructor (dataclass) field, JSON-encoded."""
    fields = {
        f: _jsonable(getattr(model, f))
        for f in getattr(model, "__dataclass_fields__", {})
        if f not in ("parent", "name")
    }
    return {"class": type(model).__name__, "fields": fields}


def identity_path(ckpt_dir: str) -> str:
    return os.path.join(ckpt_dir, IDENTITY_FILE)


def write_identity(ckpt_dir: str, model) -> None:
    """Atomically stamp ``ckpt_dir`` with ``model``'s identity."""
    os.makedirs(ckpt_dir, exist_ok=True)
    path = identity_path(ckpt_dir)
    tmp = path + ".tmp"
    with open(tmp, "w", encoding="utf-8") as f:
        json.dump(model_identity(model), f, indent=1, sort_keys=True)
    os.replace(tmp, path)


def read_identity(ckpt_dir: str) -> Optional[Dict[str, Any]]:
    path = identity_path(ckpt_dir)
    if not os.path.exists(path):
        return None
    with open(path, encoding="utf-8") as f:
        return json.load(f)


def diff_identity(stamped: Dict[str, Any],
                  model) -> Dict[str, Any]:
    """{"structural": {field: (stamped, current)}, "advisory": {...}}
    differences between a stamp and a live model (class name counts as
    structural)."""
    current = model_identity(model)
    structural: Dict[str, Any] = {}
    advisory: Dict[str, Any] = {}
    if stamped.get("class") != current["class"]:
        structural["class"] = (stamped.get("class"), current["class"])
    sf, cf = stamped.get("fields", {}), current["fields"]
    for key in sorted(set(sf) | set(cf)):
        a, b = sf.get(key, "<absent>"), cf.get(key, "<absent>")
        if a != b:
            (advisory if key in ADVISORY_FIELDS else structural)[key] = (a, b)
    return {"structural": structural, "advisory": advisory}


def check_identity(ckpt_dir: str, model, override: bool = False) -> None:
    """Verify ``model`` against the stamp in ``ckpt_dir`` before using its
    checkpoints. Structural mismatch raises :class:`ModelIdentityError`
    (listing every differing field) unless ``override``; advisory
    mismatches, and overridden structural ones, warn on stderr. A missing
    stamp (pre-stamp checkpoint) passes silently."""
    stamped = read_identity(ckpt_dir)
    if stamped is None:
        return
    d = diff_identity(stamped, model)
    if d["advisory"]:
        fields = ", ".join(f"{k}: {a!r} -> {b!r}"
                           for k, (a, b) in d["advisory"].items())
        print(f"# identity: advisory field change vs checkpoint stamp "
              f"({fields})", file=sys.stderr)
    if not d["structural"]:
        return
    fields = "; ".join(f"{k}: checkpoint={a!r}, model={b!r}"
                       for k, (a, b) in d["structural"].items())
    if override:
        print(f"# identity: STRUCTURAL mismatch overridden "
              f"(--force-model-mismatch): {fields}", file=sys.stderr)
        return
    raise ModelIdentityError(
        f"checkpoint under {ckpt_dir!r} was trained with a structurally "
        f"different architecture ({fields}). Restoring would silently "
        f"compute a different function. Rebuild the matching model "
        f"(check <workdir>/config.json and the stamp in "
        f"{identity_path(ckpt_dir)!r}), or pass --force-model-mismatch / "
        f"override=True to proceed anyway.")
