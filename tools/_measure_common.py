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
import time
from pathlib import Path
from typing import Optional


# module-level timing indirection: tests patch THESE instead of the
# shared stdlib time module (a global time.monotonic patch leaks into
# any concurrent code — ADVICE r4)
_monotonic = time.monotonic
_sleep = time.sleep


def _probe_once(probe_timeout: float) -> bool:
    code = ("import jax, jax.numpy as jnp;"
            "print('PROBE', float(jnp.sum(jnp.ones((128, 128)))))")
    try:
        r = subprocess.run([sys.executable, "-c", code],
                           timeout=probe_timeout,
                           capture_output=True, text=True)
        return "PROBE 16384.0" in (r.stdout or "")
    except Exception:  # noqa: BLE001 — timeout or spawn failure
        return False


def setup_device(cpu: bool, *, probe_timeout: float = 180.0,
                 probe_wait: Optional[float] = None) -> None:
    """Pin/probe/cache, then print the device line. Exits(1) with a JSON
    error line when the tunnel is unreachable (and ``cpu`` is False).

    ``probe_wait`` (or env ``ASR_TPU_PROBE_WAIT``, seconds) keeps
    re-probing a dead tunnel until the deadline instead of failing on
    the first miss — the tunnel's observed outages flap on a scale of
    minutes-to-hours, so a tool launched during one can arm itself and
    measure the moment the backend returns (bench.py's model)."""
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
        if probe_wait is None:
            raw = os.environ.get("ASR_TPU_PROBE_WAIT", "0")
            try:
                probe_wait = float(raw)
            except ValueError:
                # a malformed value (e.g. '30m') must not break the
                # exit-with-JSON-error-line contract with a traceback
                print(f"# ignoring malformed ASR_TPU_PROBE_WAIT={raw!r}; "
                      f"using 0", file=sys.stderr, flush=True)
                probe_wait = 0.0
        deadline = _monotonic() + max(probe_wait, 0.0)
        while not _probe_once(probe_timeout):
            if _monotonic() >= deadline:
                print(json.dumps({"error": "TPU tunnel unreachable; "
                                  "not dispatching"}))
                sys.exit(1)
            print(json.dumps({"probe": "tunnel down; retrying"}),
                  file=sys.stderr, flush=True)
            _sleep(30.0)
    print(json.dumps({"device": jax.devices()[0].device_kind}), flush=True)
