"""Test harness: force a virtual 8-device CPU platform before jax imports.

Correctness CI never needs a real TPU (SURVEY section 4): the whole pipeline
jits on the CPU backend, and multi-chip sharding is exercised on a virtual
8-device host mesh.
"""

import os

os.environ.setdefault("NUMPY_MADVISE_HUGEPAGE", "0")  # see package __init__
os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# Persistent compilation cache: the suite compiles many (shape, flag)
# variants; cache them across runs.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")

# This environment's sitecustomize force-registers the axon TPU platform and
# overrides jax_platforms programmatically, so the env var alone is not
# enough: re-pin to CPU after import (safe - tests never want the TPU).
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
