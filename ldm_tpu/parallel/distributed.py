"""Multi-process (multi-host) runtime: the DCN half of the distributed story.

The reference is strictly single-process (SURVEY.md §2, parallelism note;
src/utils.py:133-141 picks one CUDA device).  TPU pod slices beyond v5e-8 span
multiple HOSTS, each owning a subset of chips: JAX runs one process per host and
``jax.devices()`` becomes the GLOBAL device list after
``jax.distributed.initialize``.  The design here follows the standard JAX
multi-host recipe (scaling-book):

* one mesh over the global devices — the same ``create_mesh`` call as single-host
  (``jax.devices()`` is already global);
* inputs built as global arrays with ``jax.make_array_from_callback`` — each
  process materializes ONLY the shards its local chips own, so a data-sharded
  batch is fed per-host (each host transfers its slice, nothing else) while a
  replicated pytree is transferred whole on every host;
* collectives ride ICI within a slice and DCN across slices — XLA picks the
  fabric from the mesh's device layout; nothing here changes;
* host-side effects (checkpoints, metrics files, sample grids) happen on
  process 0 only.

``initialize()`` is env-gated so single-host runs (the common case, and all CI)
never touch the distributed runtime.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """``jax.distributed.initialize`` iff multi-process env/args are present.

    On Cloud TPU pods the arguments auto-detect from the metadata server, so the
    env flag ``LDM_TPU_DISTRIBUTED=1`` alone suffices there; elsewhere (e.g. the
    2-process CPU test) pass/set coordinator+count+id explicitly.  Returns True
    if the distributed runtime was initialized.
    """
    coordinator_address = coordinator_address or os.environ.get(
        "LDM_TPU_COORDINATOR"
    )
    if num_processes is None and "LDM_TPU_NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["LDM_TPU_NUM_PROCESSES"])
    if process_id is None and "LDM_TPU_PROCESS_ID" in os.environ:
        process_id = int(os.environ["LDM_TPU_PROCESS_ID"])
    explicit = coordinator_address is not None
    if not explicit and os.environ.get("LDM_TPU_DISTRIBUTED") != "1":
        return False
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    return True


def process_count() -> int:
    return jax.process_count()


def process_index() -> int:
    return jax.process_index()


def is_primary() -> bool:
    """True on the process that owns host-side effects (checkpoints, metrics,
    image grids).  Always True single-host."""
    return jax.process_index() == 0


def host_to_global(sharding, x: Any) -> jax.Array:
    """Place a host array onto a (possibly multi-process) sharding.

    Single-process this is ``jax.device_put``.  Multi-process, ``device_put``
    cannot target non-addressable devices, so the global array is assembled with
    ``jax.make_array_from_callback``: every process holds the full host value
    (datasets here are host-RAM sized and the batch order derives from a seeded
    permutation, identical on all hosts) and materializes only the slices its
    own chips need — the per-host data feed of SURVEY.md §2's parallelism plan.
    """
    if jax.process_count() == 1:
        return jax.device_put(x, sharding)
    import numpy as np

    x = np.asarray(x)
    return jax.make_array_from_callback(x.shape, sharding, lambda idx: x[idx])


def tree_host_to_global(sharding, tree: Any) -> Any:
    return jax.tree.map(lambda x: host_to_global(sharding, x), tree)
