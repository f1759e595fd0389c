"""Multi-host initialization.

The reference's launcher tier never existed (SURVEY.md §2 "backend choice is
never made in-repo"); on TPU pods the runtime is the backend: one
``jax.distributed.initialize()`` per host wires the ICI/DCN fabric, and the
data tier shards by ``jax.process_index()`` (data/sampler.py).
"""

from __future__ import annotations

import logging
import os
from typing import Optional

logger = logging.getLogger(__name__)


def init_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> dict:
    """Initialize multi-host JAX if the environment calls for it.

    On TPU pods the arguments auto-detect from the metadata server; for
    manual CPU/GPU bring-up pass them (or set JAX_COORDINATOR_ADDRESS /
    JAX_NUM_PROCESSES / JAX_PROCESS_ID).  Safe to call on a single host —
    it becomes a no-op.

    Returns {'process_index', 'process_count', 'local_devices',
    'global_devices'}.
    """
    import jax

    coordinator_address = coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS")
    num_processes = num_processes or _int_env("JAX_NUM_PROCESSES")
    process_id = process_id if process_id is not None else _int_env("JAX_PROCESS_ID")

    should_init = coordinator_address is not None or os.environ.get("TPU_WORKER_HOSTNAMES")
    # NB: must not touch the backend before initialize() — jax.process_count()
    # here would initialise XLA and make initialize() a hard error.
    if should_init and not jax.distributed.is_initialized():
        # CPU cross-process collectives need an explicit transport; gloo is
        # the in-tree one.  Must be set before backend init — harmless for
        # TPU (ICI collectives don't read it).  Guarded: older jax or an
        # already-initialized backend just keeps its current setting.
        try:
            if jax.config.jax_cpu_collectives_implementation in (None, "none"):
                jax.config.update("jax_cpu_collectives_implementation", "gloo")
        except Exception:
            pass
        try:
            jax.distributed.initialize(
                coordinator_address=coordinator_address,
                num_processes=num_processes,
                process_id=process_id,
            )
        except Exception as e:  # already initialized / single host
            logger.warning("jax.distributed.initialize skipped: %s", e)

    info = {
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "local_devices": jax.local_devices(),
        "global_devices": jax.devices(),
    }
    logger.info(
        "process %d/%d with %d local / %d global devices",
        info["process_index"], info["process_count"],
        len(info["local_devices"]), len(info["global_devices"]),
    )
    return info


def _int_env(name: str) -> Optional[int]:
    v = os.environ.get(name)
    return int(v) if v is not None else None
