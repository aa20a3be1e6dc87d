"""Multi-host bring-up helpers.

Reference analogue: Flight's location/endpoint topology (flight/types.h:366)
— but TPU pods coordinate through jax.distributed + the mesh, not through
a service registry. On a pod slice:

    initialize()                 # once per host process
    mesh = global_mesh()         # all chips across all hosts, axis "x"

Per-host data loading composes with mesh.shard_batch: each host ingests
its own fragment set (dataset.py scanner), places rows on its local
devices, and the distributed operators' all_to_all collectives ride ICI
within the slice (DCN between slices is XLA's concern via the same API).

Single-host validation strategy (SURVEY.md §4.6): the same code paths run
on a virtual many-device CPU mesh (tests/conftest.py) and in
__graft_entry__.dryrun_multichip.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh

__all__ = ["initialize", "global_mesh", "process_info", "local_row_range"]


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """jax.distributed.initialize with env-var fallback
    (COORDINATOR_ADDRESS / NUM_PROCESSES / PROCESS_ID); no-op when
    single-process."""
    addr = coordinator_address or os.environ.get("COORDINATOR_ADDRESS")
    if addr is None:
        return  # single-process
    jax.distributed.initialize(
        coordinator_address=addr,
        num_processes=num_processes or int(os.environ["NUM_PROCESSES"]),
        process_id=process_id or int(os.environ["PROCESS_ID"]),
    )


def global_mesh(axis: str = "x") -> Mesh:
    """One data axis over every chip in the slice (all hosts)."""
    return Mesh(np.array(jax.devices()), (axis,))


def process_info():
    return {"process_index": jax.process_index(),
            "process_count": jax.process_count(),
            "local_devices": len(jax.local_devices()),
            "global_devices": len(jax.devices())}


def local_row_range(total_rows: int) -> range:
    """The row range this host should ingest for an evenly sharded table
    (range partitioning by host — hash affinity comes from the shuffle)."""
    p, n = jax.process_index(), jax.process_count()
    per = (total_rows + n - 1) // n
    start = p * per
    return range(start, min(start + per, total_rows))
