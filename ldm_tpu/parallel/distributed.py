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


# ------------------------------------------------- per-host sharded data feed
def per_host_subset(dataset):
    """This process's disjoint slice of a dataset: rows ``p::P`` (the standard
    per-host input pipeline — each host READS and holds only ~1/P of the data,
    shuffles within its shard, and feeds its slice of every global batch).

    Use with :func:`local_to_global` for the per-batch DP path.  The
    epoch-as-scan fast path instead replicates the full (uint8) dataset in
    HBM — that design needs the whole set on every host and is bounded by
    host RAM / HBM (documented trade-off: zero step-path collectives vs ~1/P
    memory; at the reference's scale — CIFAR-10, 150 MB uint8 — replication
    wins).  SURVEY.md §2 parallelism plan, VERDICT round 2 weak #7.

    The dataset is truncated to a multiple of the process count first:
    ``local_to_global`` derives the GLOBAL array shape as
    ``n_local * process_count``, so unequal per-host counts would make
    processes disagree on global shapes (a hang in the next collective).
    """
    import numpy as np

    p = jax.process_count()
    n = len(dataset) - len(dataset) % p
    idx = np.arange(jax.process_index(), n, p)
    return dataset.subset(idx)


def local_to_global(sharding, local_x: Any) -> jax.Array:
    """Assemble a GLOBAL batch from per-host rows: process ``p`` supplies rows
    ``[p*n_local, (p+1)*n_local)`` of the global array and never materializes
    any other host's slice (contrast ``host_to_global``, whose callback needs
    the full host value).

    Requires the sharding's device order to give each process one contiguous
    row block in process order — true for ``data_sharding(create_mesh())``,
    whose mesh is built over ``jax.devices()`` (globally ordered by process);
    asserted per-callback otherwise.
    """
    import numpy as np

    p_count = jax.process_count()
    if p_count == 1:
        return jax.device_put(local_x, sharding)
    local_x = np.asarray(local_x)
    n_local = local_x.shape[0]
    offset = jax.process_index() * n_local
    shape = (n_local * p_count,) + local_x.shape[1:]

    def cb(idx):
        rows = idx[0]
        start = rows.start or 0
        stop = shape[0] if rows.stop is None else rows.stop
        assert offset <= start and stop <= offset + n_local, (
            f"process {jax.process_index()} asked for global rows "
            f"[{start}, {stop}) outside its local span "
            f"[{offset}, {offset + n_local}) — sharding device order is not "
            "process-contiguous; use host_to_global instead"
        )
        rest = tuple(idx[1:])
        return local_x[start - offset : stop - offset][(slice(None),) + rest]

    return jax.make_array_from_callback(shape, sharding, cb)


def tree_local_to_global(sharding, tree: Any) -> Any:
    return jax.tree.map(lambda x: local_to_global(sharding, x), tree)
