"""Shared setup for the measurement tools (measure_autos,
measure_flash_attn, profile_am_fwd, profile_lm_fwd).

One place for the three environment rituals every on-hardware tool needs
(previously copy-pasted into each ``main()`` — ADVICE: probe fixes must
not be applied in five places):

- optional CPU pin (``--cpu`` — harness smoke-testing only),
- the persistent XLA compile cache (reruns after a crash or tunnel drop
  must not repay minutes of compiles),
- a SUBPROCESS tunnel probe before dispatching — an in-process backend
  init against a dead tunnel hangs indefinitely (CLAUDE.md "probe
  before long TPU jobs").

bench.py keeps its own richer variant (deadline-window re-probing,
signal-safe partial emit) — this helper is for the one-shot tools.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
from pathlib import Path


def setup_device(cpu: bool, *, probe_timeout: float = 180.0) -> None:
    """Pin/probe/cache, then print the device line. Exits(1) with a JSON
    error line when the tunnel is unreachable (and ``cpu`` is False)."""
    import jax

    if cpu:
        jax.config.update("jax_platforms", "cpu")
    try:
        jax.config.update(
            "jax_compilation_cache_dir",
            os.environ.get("ASR_TPU_COMPILE_CACHE", str(
                Path(__file__).resolve().parent.parent / ".jax_cache")))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    if not cpu:
        code = ("import jax, jax.numpy as jnp;"
                "print('PROBE', float(jnp.sum(jnp.ones((128, 128)))))")
        try:
            r = subprocess.run([sys.executable, "-c", code],
                               timeout=probe_timeout,
                               capture_output=True, text=True)
            ok = "PROBE 16384.0" in (r.stdout or "")
        except Exception:  # noqa: BLE001 — timeout or spawn failure
            ok = False
        if not ok:
            print(json.dumps({"error": "TPU tunnel unreachable; "
                              "not dispatching"}))
            sys.exit(1)
    print(json.dumps({"device": jax.devices()[0].device_kind}), flush=True)
