"""probe37: one fused pass over (p, g, m, v, ema) for the Adam+EMA stream.

VERDICT r3 next-round item 5: the train roofline's bucket 1
(docs/perf_round3.md §4) measures the optimizer's fp32 stream at 1.10 ms/step
against a ~0.9 ms pure-HBM bound — ~20% slack never attacked.  Hypothesis:
the optax chain (scale_by_adam → scale(-lr) → apply_updates → separate EMA
tree.map) leaves XLA with several loop nests whose fusion across the
param/moment trees is imperfect; re-associating ALL the elementwise math into
ONE tree.map pass per leaf — new_m, new_v, new_p, new_ema computed together
from (p, g, m, v, ema) — states the minimal-traffic program (read 5, write 4
fp32 streams = 36 B/param) explicitly.

Three measurements on the flagship UNet (20.35M params):
  A. optimizer-only microbench: apply_gradients vs fused, scanned, B-free;
  B. full train step at B=64 (the protocol batch — where the stream binds);
  C. full train step at B=256 (the deployment batch) for the headline row.

Equivalence is asserted in-run (fused == optax to fp32 tolerance over 3
chained steps) before timing — a fast wrong optimizer is worthless.

Usage: python perf/probe37_fused_optimizer.py
"""

import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
jax.config.update("jax_compilation_cache_dir", "/root/repo/runs/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

from ldm_tpu.diffusion.ddpm import GaussianDiffusion  # noqa: E402
from ldm_tpu.models.unet import UNet  # noqa: E402
from ldm_tpu.training.state import TrainState, make_optimizer  # noqa: E402

model = UNet(in_channels=3, out_channels=3, channels=64,
             channel_multipliers=(1, 2, 4, 8), num_classes=10,
             dtype=jnp.bfloat16)
train_model = model.clone(attention_impl="auto_grads")
diffusion = GaussianDiffusion(n_steps=400)
x1 = jnp.zeros((1, 32, 32, 3), jnp.float32)
params = jax.jit(model.init)(
    jax.random.key(0), x1, jnp.zeros((1,), jnp.int32), jnp.zeros((1,), jnp.int32)
)
LR = 5e-4
state = TrainState.create(params, make_optimizer(LR), jax.random.key(1))
n_params = sum(p.size for p in jax.tree.leaves(params))
print(f"n_params={n_params}", flush=True)


def make_grads(key):
    flat, tree = jax.tree.flatten(params)
    ks = jax.random.split(key, len(flat))
    return jax.tree.unflatten(
        tree, [jax.random.normal(k, p.shape, jnp.float32) * 1e-3
               for k, p in zip(ks, flat)]
    )


# ---------------------------------------------------------------- fused path
from ldm_tpu.training.state import fused_apply_gradients  # noqa: E402

# ------------------------------------------------------------- equivalence
g = jax.jit(make_grads)(jax.random.key(7))
s_a = s_b = state
for i in range(3):
    s_a = jax.jit(lambda s, g: s.apply_gradients(g))(s_a, g)
    s_b = jax.jit(lambda s, g: fused_apply_gradients(s, g, LR))(s_b, g)
da = jax.tree.leaves(s_a.params)
db = jax.tree.leaves(s_b.params)
perr = max(float(jnp.max(jnp.abs(a - b))) for a, b in zip(da, db))
ea = jax.tree.leaves(s_a.ema_params)
eb = jax.tree.leaves(s_b.ema_params)
eerr = max(float(jnp.max(jnp.abs(a - b))) for a, b in zip(ea, eb))
ma = jax.tree.leaves(s_a.opt_state)
mb = jax.tree.leaves(s_b.opt_state)
merr = max(float(jnp.max(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32))))
           for a, b in zip(ma, mb))
print(f"equivalence after 3 chained steps: param={perr:.3e} ema={eerr:.3e} "
      f"opt={merr:.3e}", flush=True)
assert perr < 1e-6 and eerr < 1e-6 and merr < 1e-6, "fused optimizer diverges"

out = {"device": str(jax.devices()[0]), "n_params": int(n_params),
       "equivalence_max_abs_err": {"params": perr, "ema": eerr, "opt": merr}}

# ------------------------------------------------- A. optimizer-only scans
N = 200


def time_scan(fn, init, n=N, reps=3):
    run = jax.jit(lambda s: jax.lax.scan(fn, s, None, length=n))
    s = run(init)
    jax.block_until_ready(s)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        s = run(s[0] if isinstance(s, tuple) else s)
        jax.block_until_ready(s)
        ts.append(time.perf_counter() - t0)
    return min(ts) / n


gfix = jax.jit(make_grads)(jax.random.key(3))

ms_optax = time_scan(lambda s, _: (s.apply_gradients(gfix), None), state) * 1e3
ms_fused = time_scan(lambda s, _: (fused_apply_gradients(s, gfix, LR), None),
                     state) * 1e3
hbm_bound_ms = 36.0 * n_params / 819e9 * 1e3  # v5e ~819 GB/s HBM
out["optimizer_only"] = {
    "optax_ms": round(ms_optax, 4), "fused_ms": round(ms_fused, 4),
    "pure_hbm_bound_ms_at_819GBps": round(hbm_bound_ms, 4),
    "speedup": round(ms_optax / ms_fused, 3),
}
print("optimizer_only", out["optimizer_only"], flush=True)

# ------------------------------------------------- B/C. full train steps
for batch in (64, 256):
    images = jnp.zeros((batch, 32, 32, 3), jnp.float32)
    labels = jnp.zeros((batch,), jnp.int32)

    def make_step(apply_grads):
        def step(state, _):
            key = state.step_key()
            k_noise, k_drop = jax.random.split(key)
            eps, xt, t = diffusion.noise_batch(k_noise, images)
            y = jnp.where(jax.random.bernoulli(k_drop, 0.1), jnp.int32(10),
                          labels)

            def loss_fn(p):
                return jnp.mean((eps - train_model.apply(p, xt, t, y)) ** 2)

            loss, grads = jax.value_and_grad(loss_fn)(state.params)
            return apply_grads(state, grads), loss

        return step

    n = 50
    ms_std = time_scan(make_step(lambda s, g: s.apply_gradients(g)),
                       state, n=n) * 1e3
    ms_fus = time_scan(make_step(lambda s, g: fused_apply_gradients(s, g, LR)),
                       state, n=n) * 1e3
    out[f"train_step_b{batch}"] = {
        "optax_ms": round(ms_std, 3), "fused_ms": round(ms_fus, 3),
        "steps_per_sec_optax": round(1e3 / ms_std, 1),
        "steps_per_sec_fused": round(1e3 / ms_fus, 1),
        "speedup": round(ms_std / ms_fus, 4),
    }
    print(f"train_step_b{batch}", out[f"train_step_b{batch}"], flush=True)

with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "probe37.json"), "w") as f:
    json.dump(out, f, indent=2)
print(json.dumps(out))
