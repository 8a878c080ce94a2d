"""Multi-host entry point (SURVEY.md §2 parallelism table, §5 comm-backend
row): `jax.distributed.initialize` + a global mesh helper.

The reference is single-process (no NCCL/MPI anywhere — SURVEY.md §5); the
TPU-native framework reaches multi-host scale through JAX's distributed
runtime: every process calls :func:`initialize` (coordinator TCP service,
standard JAX multi-host bootstrap), after which `jax.devices()` spans all
hosts and the existing `shard_map`/psum code paths (parallel/frontend.py,
slam/ba.py) run over ICI within a slice and DCN across slices unchanged.

Env-driven like production launchers: COORDINATOR_ADDRESS / NUM_PROCESSES /
PROCESS_ID (or explicit args).  Single-process callers get a no-op, so the
same program runs 1-host and N-host.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import jax

from .mesh import make_mesh


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    local_device_ids: Optional[Sequence[int]] = None,
) -> bool:
    """Bootstrap the JAX distributed runtime for multi-host execution.

    Args default from the COORDINATOR_ADDRESS / NUM_PROCESSES / PROCESS_ID
    environment (the plain-TCP analogue of TPU pod metadata).  Returns True
    when the distributed service was initialized, False for the
    single-process no-op.
    """
    coordinator_address = coordinator_address or os.environ.get("COORDINATOR_ADDRESS")
    if num_processes is None:
        num_processes = int(os.environ.get("NUM_PROCESSES", "1"))
    if process_id is None:
        process_id = int(os.environ.get("PROCESS_ID", "0"))
    if num_processes <= 1 or coordinator_address is None:
        return False
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
        local_device_ids=local_device_ids,
    )
    return True


def global_data_mesh(axis: str = "data"):
    """1-D mesh over every device of every participating process."""
    return make_mesh((jax.device_count(),), (axis,))


def process_info() -> dict:
    """Health/observability snapshot for the launcher (A3/A5 rows)."""
    return {
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "local_devices": len(jax.local_devices()),
        "global_devices": jax.device_count(),
    }
