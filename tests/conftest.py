"""Test harness: force a virtual 8-device CPU platform before jax imports.

Correctness CI never needs a real TPU (SURVEY section 4): the whole pipeline
jits on the CPU backend, and multi-chip sharding is exercised on a virtual
8-device host mesh.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
