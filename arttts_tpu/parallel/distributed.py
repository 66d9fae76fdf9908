"""Multi-host (multi-slice) initialization glue.

The reference's multi-node path is rank arithmetic + NCCL rendezvous env
vars (`/root/reference/src/train_v1_1_dist.py:70-80,507-519`). TPU-native,
multi-host SPMD needs only `jax.distributed.initialize()` (DCN rendezvous is
handled by the TPU runtime) plus per-host data sharding — the jitted step is
already a global SPMD program over the full mesh.

Usage in a launcher:

    host = init_distributed()              # no-op on single host
    mesh = make_mesh()                     # global device mesh
    loader = DataLoader(..., host_id=host.process_index,
                        num_hosts=host.process_count)
"""

from __future__ import annotations

import dataclasses
import logging
from typing import Optional

import jax

log = logging.getLogger("arttts_tpu.distributed")


@dataclasses.dataclass(frozen=True)
class HostInfo:
    process_index: int
    process_count: int
    local_devices: int
    global_devices: int


def init_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> HostInfo:
    """Initialize cross-host JAX if running under a multi-host launcher.

    With no arguments the TPU runtime's own environment discovery is used;
    on a single host this is a no-op. Returns host/process topology for
    per-host data sharding.
    """
    multi = num_processes is not None and num_processes > 1
    try:
        if multi or coordinator_address is not None:
            jax.distributed.initialize(
                coordinator_address=coordinator_address,
                num_processes=num_processes,
                process_id=process_id,
            )
    except RuntimeError as e:  # already initialized
        log.warning("jax.distributed.initialize: %s", e)
    info = HostInfo(
        process_index=jax.process_index(),
        process_count=jax.process_count(),
        local_devices=jax.local_device_count(),
        global_devices=jax.device_count(),
    )
    log.info(
        "host %d/%d: %d local of %d global devices",
        info.process_index, info.process_count,
        info.local_devices, info.global_devices,
    )
    return info
