"""Multi-host (pod-slice) scale-out helpers.

The workload is data-parallel over sequence pairs: each host reads its
shard of the pair stream, all hosts build the same tiny model tables, and
the global mesh shards the batch dimension over every chip in the slice.
Result collation stays host-local (each host writes its own shard's JSONL;
scores can be allgathered for global statistics).

Single-host environments (including this development image) exercise the
same code through an 8-device virtual CPU mesh; the jax.distributed
initialization below is the only multi-host-specific step.
"""

from __future__ import annotations

import jax
import numpy as np


def init_distributed(coordinator: str | None = None,
                     num_processes: int | None = None,
                     process_id: int | None = None) -> None:
    """Initialize jax.distributed (no-op if already initialized or single
    process). Arguments default to JAX's env-based autodetection
    (JAX_COORDINATOR_ADDRESS etc. / TPU metadata)."""
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator,
            num_processes=num_processes,
            process_id=process_id,
        )
    except (RuntimeError, ValueError):
        # already initialized, or single-process context
        pass


def host_shard(items: list, process_index: int | None = None,
               process_count: int | None = None) -> list:
    """This host's contiguous shard of a work list (pair streams are
    sharded before encoding so each host touches only its own input)."""
    pi = jax.process_index() if process_index is None else process_index
    pc = jax.process_count() if process_count is None else process_count
    n = len(items)
    per = -(-n // pc)
    return items[pi * per : (pi + 1) * per]


def global_scores_allgather(local_scores: np.ndarray, mesh) -> np.ndarray:
    """Allgather per-host score shards across the mesh's data axis (for
    global statistics / manifests)."""
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    arr = jax.device_put(
        jnp.asarray(local_scores), NamedSharding(mesh, P("data"))
    )
    gathered = jax.jit(
        lambda x: x, out_shardings=NamedSharding(mesh, P())
    )(arr)
    return np.asarray(gathered)
