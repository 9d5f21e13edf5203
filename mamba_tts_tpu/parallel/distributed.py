"""Multi-host initialization (SURVEY §2.3: "jax.distributed.initialize for
multi-host; no custom transport needed").

On TPU pods the coordinator/process env is auto-detected; explicit arguments
cover GPU-style or manual launches.  Collectives then ride ICI within a
slice and DCN across slices via the ordinary Mesh machinery — no NCCL/MPI
equivalent is ever touched by framework code.
"""
from __future__ import annotations

import os
from typing import Optional

import jax


def initialize_multihost(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> dict:
    """Initialize jax.distributed when running multi-host; no-op otherwise.

    Returns a summary dict (process_index, process_count, device counts).
    """
    explicit = coordinator_address is not None
    env_driven = any(
        k in os.environ
        for k in ("COORDINATOR_ADDRESS", "MEGASCALE_COORDINATOR_ADDRESS", "TPU_WORKER_ID")
    )
    if explicit or env_driven:
        try:
            jax.distributed.initialize(
                coordinator_address=coordinator_address,
                num_processes=num_processes,
                process_id=process_id,
            )
        except RuntimeError:
            pass  # already initialized
    return {
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "local_devices": jax.local_device_count(),
        "global_devices": jax.device_count(),
    }
