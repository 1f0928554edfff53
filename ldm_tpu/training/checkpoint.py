"""Checkpoint / resume.

The reference's only checkpoint is weights-only ``torch.save(state_dict)`` gated on
val-loss improvement (src/EarlyStopping.py:56-63) — "resume" there means fresh
training from best weights.  Here a checkpoint is the FULL TrainState (params,
optimizer state, EMA params, step, PRNG key, batch_stats), written atomically
(temp file + rename) so a crash mid-write can't corrupt the latest checkpoint
(SURVEY.md §5, failure-detection row).

Serialization is flax msgpack (version-stable, host-RAM sized states); the arrays
are device_get'ed, so replicated sharded states save fine.
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


def _atomic_write(path: str, data: bytes) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(data)
    os.replace(tmp, path)


def save_state(path: str, state: TrainState) -> str:
    """Multi-host: the state is replicated, so only process 0 writes — N hosts
    racing on one shared filesystem path would corrupt/duplicate checkpoints."""
    if jax.process_index() != 0:
        return path
    _atomic_write(path, serialization.to_bytes(_state_dict(state)))
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
    (src/EarlyStopping.py:63) for generate_images-style reload.  Process-0 only,
    like save_state."""
    if jax.process_index() != 0:
        return path
    _atomic_write(path, serialization.to_bytes(params))
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
