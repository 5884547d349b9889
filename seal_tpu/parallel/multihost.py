"""Multi-host (DCN) serving utilities.

The reference is a single-GPU stack; its only cross-process facility is the
``synced_gpus`` all_reduce lockstep (``/root/reference/seal/beam_search.py:221-229``),
initialized by the caller.  Here the multi-host story is explicit:

* ``init_distributed()`` wraps ``jax.distributed.initialize`` (coordinator
  address/process counts from env or args) -- call once per host process
  before any backend use.  On a single host it is a no-op.
* ``global_mesh(n_model=...)`` builds one mesh over ALL processes' devices:
  the ``data`` axis spans hosts (queries fan out over DCN), the ``model``
  axis stays intra-host (Megatron collectives ride ICI, never DCN).
* ``host_batch_to_global(mesh, ids, mask)`` forms a jax.Array for the GLOBAL
  batch from each host's local query slice
  (``jax.make_array_from_process_local_data``): every host tokenizes its own
  shard of the topics file, and the jitted decode sees one large
  data-sharded batch -- the lockstep-finish protocol disappears because
  there is a single SPMD program instead of N independent loops.

Single-process usage is the degenerate case (local devices only), which is
what the tests exercise; the code path is identical.
"""

from __future__ import annotations

import logging
import os
from typing import Optional, Sequence, Tuple

import jax
import numpy as np

from seal_tpu.parallel import mesh as mesh_lib

logger = logging.getLogger(__name__)


def init_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Initialize the JAX distributed runtime for multi-host serving.

    Arguments default to the standard env vars (``JAX_COORDINATOR_ADDRESS``,
    ``JAX_NUM_PROCESSES``, ``JAX_PROCESS_ID``); returns True when a
    multi-process runtime was initialized, False for the single-process
    no-op (no coordinator configured).
    """
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS"
    )
    if not coordinator_address:
        return False
    kwargs = dict(coordinator_address=coordinator_address)
    num_processes = num_processes or os.environ.get("JAX_NUM_PROCESSES")
    process_id = process_id if process_id is not None else os.environ.get("JAX_PROCESS_ID")
    if num_processes is not None:
        kwargs["num_processes"] = int(num_processes)
    if process_id is not None:
        kwargs["process_id"] = int(process_id)
    jax.distributed.initialize(**kwargs)
    logger.warning(
        "jax.distributed initialized: process %d/%d, %d local / %d global devices",
        jax.process_index(), jax.process_count(),
        jax.local_device_count(), jax.device_count(),
    )
    return True


def global_mesh(n_model: int = 1) -> "jax.sharding.Mesh":
    """One mesh over every process's devices: data spans hosts (DCN),
    model stays within a host (ICI).  Requires ``n_model`` to divide the
    local device count so no Megatron collective crosses DCN."""
    n_local = jax.local_device_count()
    assert n_local % n_model == 0, (
        f"model axis {n_model} must divide local device count {n_local} "
        "(tensor-parallel collectives must not cross hosts)"
    )
    return mesh_lib.make_mesh(n_model=n_model, devices=jax.devices())


def process_slice(n_items: int) -> Tuple[int, int]:
    """This process's [start, end) slice of a globally-ordered work list
    (contiguous split; remainder spread over the first processes)."""
    p, n = jax.process_index(), jax.process_count()
    base, rem = divmod(n_items, n)
    start = p * base + min(p, rem)
    return start, start + base + (1 if p < rem else 0)


def host_batch_to_global(mesh, ids: np.ndarray, mask: np.ndarray):
    """Assemble the global data-sharded batch from this host's local rows.

    ``ids``/``mask`` are the rows this process tokenized (its
    ``process_slice`` of the global batch, equal-sized across processes --
    pad the tail batch).  Returns jax.Arrays sharded ``P('data')`` that any
    jitted fn with data-sharded inputs accepts without resharding.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    sharding = NamedSharding(mesh, P("data"))
    gids = jax.make_array_from_process_local_data(sharding, np.asarray(ids))
    gmask = jax.make_array_from_process_local_data(sharding, np.asarray(mask))
    return gids, gmask
