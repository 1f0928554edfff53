"""Checkpoint / resume.

The reference's only checkpoint is weights-only ``torch.save(state_dict)`` gated on
val-loss improvement (src/EarlyStopping.py:56-63) — "resume" there means fresh
training from best weights.  Here a checkpoint is the FULL TrainState (params,
optimizer state, EMA params, step, PRNG key, batch_stats), written atomically
(temp file + rename) so a crash mid-write can't corrupt the latest checkpoint
(SURVEY.md §5, failure-detection row).

Serialization is flax msgpack (version-stable, host-RAM sized states).
Replicated and single-process-sharded leaves device_get directly; leaves whose
shards live on OTHER processes' devices (multi-host FSDP/TP state,
parallel/fsdp.py) are assembled with a process_allgather first — a COLLECTIVE,
so every process must call save_* even though only process 0 writes.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import serialization

from ldm_tpu.training.state import TrainState


def _state_dict(state: TrainState) -> dict:
    return {
        "step": state.step,
        "params": state.params,
        "opt_state": state.opt_state,
        "ema_params": state.ema_params,
        "key": jax.random.key_data(state.key),
        "batch_stats": state.batch_stats if state.batch_stats is not None else {},
    }


def _host_tree(tree: Any) -> Any:
    """Fetch a (possibly multi-host-sharded) tree to host values.

    ``to_bytes``'s implicit device_get handles fully-addressable arrays and
    fully-replicated global arrays; a leaf that is NEITHER (its shards span
    other processes — e.g. ZeRO-sharded Adam moments on a 2-host mesh) would
    raise, so it is gathered with ``process_allgather``. That gather is a
    collective: it runs on every process, BEFORE any process-0 write gate.
    """

    def leaf(x):
        if isinstance(x, jax.Array) and not (
            x.is_fully_addressable or x.sharding.is_fully_replicated
        ):
            from jax.experimental import multihost_utils

            return multihost_utils.process_allgather(x, tiled=True)
        return x

    return jax.tree_util.tree_map(leaf, tree)


def _atomic_write(path: str, data: bytes) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(data)
    os.replace(tmp, path)


def save_state(path: str, state: TrainState) -> str:
    """Multi-host: only process 0 writes — N hosts racing on one shared
    filesystem path would corrupt/duplicate checkpoints.  Cross-process-sharded
    leaves are all-gathered first (collective — all processes participate)."""
    d = _host_tree(_state_dict(state))
    if jax.process_index() != 0:
        return path
    _atomic_write(path, serialization.to_bytes(d))
    return path


def restore_state(path: str, template: TrainState) -> TrainState:
    with open(path, "rb") as f:
        d = serialization.from_bytes(_state_dict(template), f.read())
    return template.replace(
        step=jnp.asarray(d["step"]),
        params=d["params"],
        opt_state=d["opt_state"],
        ema_params=d["ema_params"],
        key=jax.random.wrap_key_data(d["key"]),
        batch_stats=d["batch_stats"] if template.batch_stats is not None else None,
    )


def save_params(path: str, params: Any) -> str:
    """Weights-only save — parity with the reference's ``torch.save(state_dict)``
    (src/EarlyStopping.py:63) for generate_images-style reload.  Process-0 only
    writes, like save_state; cross-process-sharded leaves all-gathered first."""
    p = _host_tree(params)
    if jax.process_index() != 0:
        return path
    _atomic_write(path, serialization.to_bytes(p))
    return path


def load_params(path: str, template: Any) -> Any:
    """Weights-only load (reference ``load_model``, src/utils.py:36-45).

    Returns HOST numpy arrays (flax ``from_bytes``).  For repeated jitted
    calls, ``jax.device_put`` the result once first — otherwise every call
    re-uploads the whole tree (measured ~3.5 s for the 20M-param UNet over
    the axon tunnel).  Single-shot consumers (generate_images, resume) pay
    that upload exactly once either way."""
    with open(path, "rb") as f:
        return serialization.from_bytes(template, f.read())


def latest_checkpoint(dirpath: str, name: str = "state") -> Optional[str]:
    p = os.path.join(dirpath, f"{name}.msgpack")
    return p if os.path.exists(p) else None
