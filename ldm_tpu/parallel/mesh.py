"""Device mesh + sharding helpers — the framework's distributed backbone.

The reference is single-process, single-CUDA-device (src/utils.py:133-141) with NO
distributed backend of any kind (SURVEY.md §2, parallelism note).  Here scale-out is
TPU-native: a ``jax.sharding.Mesh`` over all local chips, batches sharded on the
``data`` axis, parameters replicated, and gradient all-reduce emitted by XLA as ICI
collectives when the jitted train step consumes a data-sharded batch against
replicated params.  No NCCL/MPI translation — the mesh IS the communication layer.

Axis names reserve room for model parallelism (``("data", "model")``); the model
families here (≤ ~60M params) only need DP for parity, per SURVEY.md §2.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def create_mesh(
    devices: Optional[Sequence[jax.Device]] = None,
    data: int = -1,
    model: int = 1,
) -> Mesh:
    """Build a (data, model) mesh over the given devices (default: ALL devices —
    ``jax.devices()`` is the global list, so after ``jax.distributed.initialize``
    (parallel.distributed.initialize) the same call spans every host of a pod
    slice; collectives ride ICI within a slice and DCN across slices).

    ``data=-1`` consumes all devices not used by ``model``.  For a v5e-8 slice this
    is an 8-way DP mesh whose collectives ride ICI.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data == -1:
        assert n % model == 0, f"{n} devices not divisible by model={model}"
        data = n // model
    assert data * model == n, f"mesh {data}x{model} != {n} devices"
    arr = np.asarray(devices).reshape(data, model)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis across the data axis of the mesh."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    """Fully replicated across the mesh (parameters, scalars)."""
    return NamedSharding(mesh, P())


def shard_batch(mesh: Optional[Mesh], batch: Any) -> Any:
    """Place a host batch onto the mesh, sharded along the batch axis.

    This replaces the reference's per-batch ``.to(device)`` host→device copies
    (src/DiffusionModelTrainer.py:37) with an explicit sharded transfer.
    Multi-process, each host materializes only its own shard of the global batch
    (parallel.distributed.host_to_global).
    """
    if mesh is None:
        return batch
    from ldm_tpu.parallel.distributed import tree_host_to_global

    return tree_host_to_global(data_sharding(mesh), batch)


def global_batch_multiple(mesh: Optional[Mesh]) -> int:
    """Batches must divide evenly across the data axis."""
    return 1 if mesh is None else mesh.shape[DATA_AXIS]
