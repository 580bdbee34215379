"""Multi-host bootstrap and host-level collectives.

Maps the reference's process-group setup (odtk/main.py:155-168:
MASTER_ADDR/PORT env + init_process_group('nccl')) onto
jax.distributed.initialize: one process per *host* (not per chip),
pjit doing per-chip DP inside each process.
"""

import jax
import numpy as np


def init_distributed(master=None, num_processes=None, process_id=None):
    """Initialize multi-host JAX if requested (no-op single host).

    master: 'address:port' (the --master flag, main.py:17-18).
    """
    if num_processes is None or num_processes <= 1:
        return False
    jax.distributed.initialize(coordinator_address=master,
                               num_processes=num_processes,
                               process_id=process_id)
    return True


def world_info():
    """(rank, world) in host-process terms."""
    return jax.process_index(), jax.process_count()


def all_gather_host(arr):
    """Gather a per-host numpy array across hosts (eval results merge,
    odtk/infer.py:98-102). Single-host: identity."""
    if jax.process_count() == 1:
        return np.asarray(arr)
    from jax.experimental import multihost_utils
    return np.asarray(multihost_utils.process_allgather(arr))
