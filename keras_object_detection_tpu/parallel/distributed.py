"""Multi-host (DCN) bootstrap helper (net-new; SURVEY.md §2.2/§5 — the
reference has no distributed backend at all).

Usage on a multi-host TPU slice (GKE / gcloud multi-worker):

    from keras_object_detection_tpu.parallel import distributed
    distributed.maybe_initialize()          # no-op on single host
    shard = distributed.host_shard()        # (index, count) for the data loader

    ds = YoloDataset(..., shard_index=shard[0], shard_count=shard[1])

``jax.distributed.initialize`` wires the hosts over DCN; the same jitted
train step then spans all slices — in-slice gradient all-reduce rides ICI,
cross-slice reduction rides DCN, both inserted by XLA from the shardings.
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import jax


def maybe_initialize(coordinator_address: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> bool:
    """Initialize jax.distributed when multi-host env/config is present.

    Returns True when distributed mode is active. Safe to call on a single
    host (no-op) or twice (idempotent).
    """
    # Probe WITHOUT touching the backend: jax.process_count() would
    # initialize XLA, after which jax.distributed.initialize() refuses to
    # run (verified by tests/test_distributed.py — the two-process test
    # caught exactly this).
    if jax.distributed.is_initialized():
        return jax.process_count() > 1
    coordinator = coordinator_address or os.environ.get("KOT_COORDINATOR")
    if coordinator is None and num_processes is None:
        # Cloud TPU auto-detection: initialize() works with no args there.
        if os.environ.get("TPU_WORKER_HOSTNAMES", "").count(",") > 0:
            jax.distributed.initialize()
            return jax.process_count() > 1
        return False
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes or int(os.environ.get("KOT_NUM_PROCESSES", "1")),
        process_id=process_id if process_id is not None else int(
            os.environ.get("KOT_PROCESS_ID", "0")),
    )
    return jax.process_count() > 1


def host_shard() -> Tuple[int, int]:
    """(shard_index, shard_count) for per-host input sharding."""
    return jax.process_index(), jax.process_count()
