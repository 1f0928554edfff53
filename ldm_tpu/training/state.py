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


def fused_apply_gradients(
    state: TrainState,
    grads: Any,
    lr: float,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
) -> TrainState:
    """``apply_gradients`` with the whole Adam+EMA stream re-associated into
    one explicit pass per parameter leaf.

    The optax chain (scale_by_adam → scale(-lr) → apply_updates → EMA
    tree.map) presents XLA with several separate loop nests over the
    param/moment trees; this states the minimal-traffic program directly —
    new_m, new_v, new_p, new_ema computed together from (p, g, m, v, ema),
    i.e. read 5 / write 4 fp32 streams = 36 B/param (the train roofline's
    bucket 1, docs/perf_round3.md §4).  Mathematically identical to
    ``make_optimizer(lr)`` + ``apply_gradients`` (asserted over chained steps
    in perf/probe37_fused_optimizer.py); ``lr``/``b1``/``b2``/``eps`` must
    match the ``tx`` the state was created with — the optax ``opt_state``
    (ScaleByAdamState) is updated in place so the two paths are
    checkpoint-compatible and interchangeable step to step.
    """
    # Drift guard (ADVICE r4): when the state was built with make_optimizer
    # (every product is registered with its hyperparameters), ANY mismatch —
    # including a wrong lr, the most likely drift — would silently step the
    # params with hyperparameters the opt_state's moments don't belong to.
    known = _TX_HPARAMS.get(id(state.tx))
    if known is not None:
        assert known == (float(lr), b1, b2, eps), (
            f"state.tx is make_optimizer{known} but the fused pass was "
            f"given ({lr}, {b1}, {b2}, {eps})")
    opt_state = state.opt_state
    idx = next(
        i for i, s in enumerate(opt_state)
        if hasattr(s, "mu") and hasattr(s, "nu")
    )
    adam = opt_state[idx]
    count_inc = optax.safe_increment(adam.count)
    # optax tree_bias_correction: 1 - decay**count, in the leaf dtype (fp32)
    c1 = 1.0 - jnp.asarray(b1, jnp.float32) ** count_inc
    c2 = 1.0 - jnp.asarray(b2, jnp.float32) ** count_inc
    d = jnp.minimum(state.ema_decay, (1.0 + state.step) / (10.0 + state.step))

    flat_p, tree = jax.tree.flatten(state.params)
    flat = zip(
        flat_p,
        jax.tree.leaves(grads),
        jax.tree.leaves(adam.mu),
        jax.tree.leaves(adam.nu),
        jax.tree.leaves(state.ema_params),
    )
    new_m, new_v, new_p, new_e = [], [], [], []
    for p, g, m, v, e in flat:
        m2 = b1 * m + (1.0 - b1) * g
        v2 = b2 * v + (1.0 - b2) * g * g
        p2 = p - lr * ((m2 / c1) / (jnp.sqrt(v2 / c2) + eps))
        new_m.append(m2)
        new_v.append(v2)
        new_p.append(p2)
        new_e.append(d * e + (1.0 - d) * p2)

    new_adam = adam._replace(
        count=count_inc, mu=tree.unflatten(new_m), nu=tree.unflatten(new_v)
    )
    new_opt = tuple(opt_state[:idx]) + (new_adam,) + tuple(opt_state[idx + 1:])
    return state.replace(
        step=state.step + 1,
        params=tree.unflatten(new_p),
        opt_state=new_opt,
        ema_params=tree.unflatten(new_e),
    )


@functools.lru_cache(maxsize=None)
def make_optimizer(lr: float) -> optax.GradientTransformation:
    """Adam with the reference's hyperparameters (src/Trainer.py:68-71: torch Adam
    defaults betas=(0.9, 0.999), eps=1e-8).

    Memoized by ``lr``: ``tx`` is a STATIC field of TrainState (closures, not a
    pytree), so two calls returning distinct-but-equivalent transformation
    objects would make every jitted program keyed on the state recompile.
    Trainer ``reset()`` (the five-mix protocol reuse path) depends on the same
    lr yielding the identical object."""
    tx = optax.adam(lr, b1=0.9, b2=0.999, eps=1e-8)
    # identity-keyed hparam record for fused_apply_gradients' drift guard;
    # entries live exactly as long as the lru_cache keeps tx alive
    _TX_HPARAMS[id(tx)] = (float(lr), 0.9, 0.999, 1e-8)
    return tx


# id(tx) -> (lr, b1, b2, eps) for every make_optimizer product (the lru_cache
# pins the objects, so ids are never recycled while registered)
_TX_HPARAMS: dict = {}
