"""Test config: run everything on a virtual 8-device CPU mesh.

The TPU analog of a fake backend for multi-chip sharding tests
(SURVEY.md §4). Note: this image pre-imports jax via a sitecustomize on
PYTHONPATH, so setting JAX_PLATFORMS in os.environ here is too late —
``jax.config.update`` after import is the reliable override; the XLA flag
still works because the CPU backend has not been instantiated yet.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
