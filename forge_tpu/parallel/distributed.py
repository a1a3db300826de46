"""Multi-host initialization.

TPU-native replacement for the reference's `init_process_group('nccl',
init_method='env://')` rendezvous (kubric_train_joint.py:75): on multi-host
TPU slices `jax.distributed.initialize()` wires the hosts together and the
SAME single-program train step runs on the global mesh; each host feeds its
shard of the batch via `Loader(process_index=jax.process_index(),
process_count=jax.process_count())`.
"""

from __future__ import annotations

import jax


def initialize_multihost(coordinator_address=None, num_processes=None,
                         process_id=None) -> bool:
    """Idempotent jax.distributed.initialize; returns True if multi-process."""
    try:
        if jax.process_count() > 1:
            return True
    except RuntimeError:
        pass
    try:
        kwargs = {}
        if coordinator_address:
            kwargs = dict(coordinator_address=coordinator_address,
                          num_processes=num_processes, process_id=process_id)
        jax.distributed.initialize(**kwargs)
    except Exception:
        return False
    return jax.process_count() > 1


def loader_shard_args():
    """(process_index, process_count) for data sharding on this host."""
    return jax.process_index(), jax.process_count()
