"""TrainState: one immutable pytree holding everything training mutates.

Replaces the reference's mutable trainer objects (model / optimizer / GradScaler
fields on ``Trainer``, src/Trainer.py:30-52) with the functional-core design from
SURVEY.md §7: (params, opt_state, EMA params, step, PRNG key, optional batch_stats)
travel through the jitted train step as ONE donated argument — XLA updates them
in-place in HBM with zero host traffic.

EMA is an addition over the reference (BASELINE.md names it as required; the
reference has none): ``ema = d*ema + (1-d)*params`` with the standard
``min(decay, (1+step)/(10+step))`` warmup.
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
import optax
from flax import struct


class TrainState(struct.PyTreeNode):
    step: jax.Array
    params: Any
    opt_state: Any
    ema_params: Any
    key: jax.Array
    tx: optax.GradientTransformation = struct.field(pytree_node=False)
    batch_stats: Any = None  # only used by BatchNorm models (ResNet classifier)
    ema_decay: float = struct.field(pytree_node=False, default=0.9999)

    @classmethod
    def create(
        cls,
        params: Any,
        tx: optax.GradientTransformation,
        key: jax.Array,
        ema_decay: float = 0.9999,
        batch_stats: Any = None,
    ) -> "TrainState":
        return cls(
            step=jnp.zeros((), jnp.int32),
            params=params,
            opt_state=tx.init(params),
            # Deep-copy so params/ema_params never alias the same buffers — the
            # jitted train step donates the whole state.
            ema_params=jax.tree.map(jnp.copy, params),
            key=key,
            batch_stats=batch_stats,
            tx=tx,
            ema_decay=ema_decay,
        )

    def apply_gradients(self, grads: Any, batch_stats: Any = None) -> "TrainState":
        updates, new_opt_state = self.tx.update(grads, self.opt_state, self.params)
        new_params = optax.apply_updates(self.params, updates)
        d = jnp.minimum(self.ema_decay, (1.0 + self.step) / (10.0 + self.step))
        new_ema = jax.tree.map(
            lambda e, p: d * e + (1.0 - d) * p, self.ema_params, new_params
        )
        return self.replace(
            step=self.step + 1,
            params=new_params,
            opt_state=new_opt_state,
            ema_params=new_ema,
            batch_stats=batch_stats if batch_stats is not None else self.batch_stats,
        )

    def step_key(self) -> jax.Array:
        """Per-step PRNG key, derived (not split-and-carried) so the state's key
        stays constant across steps and the step index provides the stream."""
        return jax.random.fold_in(self.key, self.step)


@functools.lru_cache(maxsize=None)
def make_optimizer(lr: float) -> optax.GradientTransformation:
    """Adam with the reference's hyperparameters (src/Trainer.py:68-71: torch Adam
    defaults betas=(0.9, 0.999), eps=1e-8).

    Memoized by ``lr``: ``tx`` is a STATIC field of TrainState (closures, not a
    pytree), so two calls returning distinct-but-equivalent transformation
    objects would make every jitted program keyed on the state recompile.
    Trainer ``reset()`` (the five-mix protocol reuse path) depends on the same
    lr yielding the identical object."""
    return optax.adam(lr, b1=0.9, b2=0.999, eps=1e-8)
