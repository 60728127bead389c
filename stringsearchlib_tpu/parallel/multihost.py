"""Multi-host (multi-process) distributed search.

The reference is a single-process Windows DLL; its only concurrency is two
std::async threads (nGramSearch.hpp:379-389).  This module provides the
SURVEY section 5 distributed-backend story: ``jax.distributed.initialize``
bring-up, a global device mesh spanning every process (ICI within a slice,
DCN across hosts - the mesh axis order makes XLA route the all_gather /
pmax merges over the fastest links first), and a ShardedEngine variant
whose leaves are GLOBAL arrays assembled from process-local shards, so no
host ever materializes another host's chunk.

Deployment model (stateless recovery, SURVEY section 5 failure handling):
every process builds (or loads) the same HostIndex from source data,
shards it identically, and keeps only its addressable shards on its
devices.  A failed host is recovered by restarting the pair-up:
re-initialize jax.distributed, re-shard from the host arrays, re-run -
the index build is deterministic, so results are bit-identical
(tests/test_multihost.py kills a worker mid-batch and asserts exactly
that).
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from .dist import AXIS, ShardedEngine, ShardedIndex


def init_distributed(
    coordinator_address: str,
    num_processes: int,
    process_id: int,
    local_cpu_devices: Optional[int] = None,
) -> tuple[int, int]:
    """Bring up the JAX distributed runtime for this process.

    ``local_cpu_devices`` forces the CPU platform with N virtual devices
    per process (multi-process CPU testing without TPU hardware); on a real
    pod slice leave it None and let the TPU runtime enumerate chips.
    Returns (process_count, global_device_count)."""
    import jax

    if local_cpu_devices is not None:
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_num_cpu_devices", int(local_cpu_devices))
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    return jax.process_count(), jax.device_count()


def global_mesh(axis_name: str = AXIS):
    """1-D mesh over every device of every process, process-major: devices
    of one host are adjacent, so shard traffic prefers intra-host links."""
    import jax
    from jax.sharding import Mesh

    return Mesh(np.array(jax.devices()), (axis_name,))


class MultiHostShardedEngine(ShardedEngine):
    """ShardedEngine over a multi-process mesh.

    Identical query semantics; placement differs: every leaf becomes a
    global jax.Array via ``make_array_from_callback``, which materializes
    only this process's addressable shards (P(AXIS) leaves) or a local
    replica (P() leaves).  Step outputs are forced replicated
    (ShardedEngine._out_shardings), so every process fetches identical
    results - the multi-host contract is that all processes call the same
    search methods in the same order (SPMD host program)."""

    def _place(self, arr: np.ndarray, spec):
        import jax
        from jax.sharding import NamedSharding

        sharding = NamedSharding(self.mesh, spec)
        return jax.make_array_from_callback(
            arr.shape, sharding, lambda idx: arr[idx]
        )
